"""Shared backbone machinery: norm layers with the reference's freezing
semantics, and LR-group labelling for the 4-group optimizer.

The reference (models/backbones/base_net.py) has three distinct BatchNorm
behaviours, which we encode as three explicit modules instead of runtime
train()/eval() mutation:

  * ``FrozenBatchNorm`` — backbone BNs: running stats AND affine params are
    frozen (base_net.py:93-109).  A constant per-channel affine; its params
    live in ``params`` but are excluded from the optimizer via the label
    tree (wseg_tpu.parallel.optim.label_params).
  * ``AffineNorm`` — ASPP BNs: the reference freezes their running stats at
    PyTorch init (mean 0, var 1) while training the affine, so they compute
    exactly ``x * gamma / sqrt(1 + eps) + beta`` (SoftMaxAE.py:137 +
    base_net.py:53-64).  We implement that closed form.
  * plain ``flax.linen.BatchNorm`` — decoder/GCI/skip BNs: true batch-stat
    normalisation with running-average updates in train mode.

LR groups (base_net.py:114-153): pretrained weights x1, pretrained biases
x2, scratch weights x10, scratch biases x20 (ResNet50/101 override to
1,1,10,10: resnets.py:190-191); frozen layers get no update.  Expressed as
a pytree of labels consumed by ``optax.multi_transform``.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

# Optimizer group labels
FROZEN = "frozen"
PRE_W = "pre_w"     # pretrained weights  (lr x1, weight decay)
PRE_B = "pre_b"     # pretrained biases   (lr x2 [x1 for resnets], no wd)
NEW_W = "new_w"     # from-scratch weights (lr x10, weight decay)
NEW_B = "new_b"     # from-scratch biases  (lr x20 [x10 for resnets], no wd)

# ImageNet normalisation (reference base_net.py:6-29)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


# Marker compute-dtype for the int8 inference mode (NET.DTYPE: int8):
# convs run w8a8 dynamically-quantized on the MXU's int8 path (2.08x
# the bf16 conv rate measured on v5e, docs/ROOFLINE.md); everything
# non-conv computes in bfloat16.
INT8_MARKER = "int8"
# variant marker: w8a8 convs with CALIBRATED per-input-channel static
# activation scales (NET.QUANT_ACT: static); same params + a
# ``quant_stats`` collection produced by tools/quant_calibrate.py
INT8_STATIC_MARKER = "int8_static"
_INT8_MARKERS = (INT8_MARKER, INT8_STATIC_MARKER)


def canon_dtype(d):
    """Resolve the int8 marker to the bfloat16 compute dtype for
    non-conv ops (norms, activations, head math)."""
    return jnp.bfloat16 if isinstance(d, str) and d in _INT8_MARKERS \
        else d


class FrozenBatchNorm(nn.Module):
    """BatchNorm with permanently frozen statistics and affine.

    y = (x - mean) / sqrt(var + eps) * scale + bias, all four constants.
    """
    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = canon_dtype(self.dtype)
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        # fold into a single multiply-add (XLA fuses this into the conv)
        mul = scale * jnp.reciprocal(jnp.sqrt(var + self.eps))
        add = bias - mean * mul
        return x * mul.astype(dt) + add.astype(dt)


class AffineNorm(nn.Module):
    """Trainable affine with identity statistics (frozen-stat BN at init).

    Matches a torch BN kept in eval mode from construction:
    y = x * scale / sqrt(1 + eps) + bias.
    """
    features: int
    eps: float = 1e-5
    use_scale: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = canon_dtype(self.dtype)
        inv = 1.0 / math.sqrt(1.0 + self.eps)
        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones,
                               (self.features,))
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            return x * (scale * inv).astype(dt) + bias.astype(dt)
        # affine=False variant (GCI fc_skip, reference gci.py:41): pure
        # frozen-stat normalisation with no learnable affine.
        return x * jnp.asarray(inv, dt)


class QuantConv(nn.Module):
    """w8a8 dynamically-quantized conv (int8 inference mode).

    Same parameter tree as the ``nn.Conv`` it replaces ("kernel" HWIO
    f32, optional "bias"), so checkpoints and the torch converter work
    unchanged — quantization happens at apply time inside the jitted
    program: per-output-channel symmetric weight scales, a per-tensor
    dynamic activation scale (one |x| reduction, negligible vs the
    conv), int8xint8->int32 on the MXU (v5e int8 peak is 2x bf16;
    measured 2.08x per conv, docs/ROOFLINE.md), then a float dequant
    multiply.  int32 cannot overflow: max 9*4096*127^2 < 2^31.

    Tiny input channels (the RGB stem) skip quantization — cin pads to
    the MXU tile anyway and the first conv dominates the quantization
    error budget.  Inference-only: round() has zero gradient, so
    training runs use bfloat16 (get_model maps NET.DTYPE int8 to a
    bf16 head + int8 backbone convs for test-mode use).

    ``act_mode``:
      "dynamic" — per-image activation scale computed inside the
        program (one |x| reduction per conv).
      "static"  — per-INPUT-CHANNEL scales from a calibration pass
        (NET.QUANT_ACT: static, tools/quant_calibrate.py).  The
        per-channel scale folds INTO the weight before weight
        quantization (x/s_c against w*s_c is exact), so outlier
        channels get their own grid — finer than any per-tensor scale —
        and the runtime |x| reduction disappears.  Calibration: apply
        with ``mutable=["quant_stats"]`` max-accumulates per-channel
        |x| into the ``quant_stats`` collection (that pass still
        quantizes dynamically; the stats are not final until saved).
    """
    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: Any = "VALID"
    kernel_dilation: tuple = (1, 1)
    use_bias: bool = False
    kernel_init: Callable = nn.initializers.he_normal()
    out_dtype: Any = jnp.bfloat16
    act_mode: str = "dynamic"

    @nn.compact
    def __call__(self, x):
        import jax

        kh, kw = self.kernel_size
        cin = x.shape[-1]
        w = self.param("kernel", self.kernel_init,
                       (kh, kw, cin, self.features), jnp.float32)
        dn = ("NHWC", "HWIO", "NHWC")
        if cin >= 16:
            calibrating = False
            amax = None
            if self.act_mode == "static":
                amax = self.variable(
                    "quant_stats", "amax",
                    lambda: jnp.zeros((cin,), jnp.float32))
                calibrating = (self.is_mutable_collection("quant_stats")
                               and not self.is_initializing())
                if calibrating:
                    cur = jnp.max(jnp.abs(x.astype(jnp.float32)),
                                  axis=(0, 1, 2))
                    amax.value = jnp.maximum(amax.value, cur)
            if self.act_mode == "static" and not calibrating \
                    and not self.is_initializing():
                # fold the calibrated per-channel scale into the weight
                sc = jnp.maximum(amax.value, 1e-12) / 127.0   # (cin,)
                wf = w * sc[None, None, :, None]
                sw = jnp.maximum(
                    jnp.max(jnp.abs(wf), axis=(0, 1, 2)), 1e-12) / 127.0
                wq = jnp.clip(jnp.round(wf / sw),
                              -127, 127).astype(jnp.int8)
                xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sc),
                              -127, 127).astype(jnp.int8)
                y = jax.lax.conv_general_dilated(
                    xq, wq, self.strides, self.padding,
                    rhs_dilation=self.kernel_dilation,
                    dimension_numbers=dn,
                    preferred_element_type=jnp.int32)
                y = y.astype(jnp.float32) * sw
            else:
                sw = jnp.maximum(
                    jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
                wq = jnp.clip(jnp.round(w / sw),
                              -127, 127).astype(jnp.int8)
                # per-IMAGE dynamic activation scale (rows are
                # independent through a conv): one outlier image no
                # longer coarsens the whole batch's quantization grid
                sx = jnp.maximum(
                    jnp.max(jnp.abs(x.astype(jnp.float32)),
                            axis=(1, 2, 3), keepdims=True), 1e-12) / 127.0
                xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                              -127, 127).astype(jnp.int8)
                y = jax.lax.conv_general_dilated(
                    xq, wq, self.strides, self.padding,
                    rhs_dilation=self.kernel_dilation,
                    dimension_numbers=dn,
                    preferred_element_type=jnp.int32)
                y = y.astype(jnp.float32) * (sx * sw)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.out_dtype), w.astype(self.out_dtype),
                self.strides, self.padding,
                rhs_dilation=self.kernel_dilation, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
            y = y + b
        return y.astype(self.out_dtype)


def conv(features, kernel=3, stride=1, dilation=1, use_bias=False,
         dtype=jnp.float32, name=None, kernel_init=None):
    """3x3/1x1 conv in NHWC with SAME-style torch padding.

    ``dtype`` may be the ``INT8_MARKER`` string: the conv then runs
    w8a8-quantized (QuantConv) with bfloat16 outputs."""
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    pad = [((k - 1) // 2 * d, (k - 1) // 2 * d)
           for k, d in zip(kernel, (dilation, dilation))]
    pad = pad if kernel != (1, 1) else "VALID"
    if isinstance(dtype, str) and dtype in _INT8_MARKERS:
        return QuantConv(
            features, kernel, strides=(stride, stride), padding=pad,
            kernel_dilation=(dilation, dilation), use_bias=use_bias,
            name=name,
            act_mode=("static" if dtype == INT8_STATIC_MARKER
                      else "dynamic"),
            kernel_init=kernel_init or nn.initializers.he_normal())
    return nn.Conv(
        features, kernel, strides=(stride, stride),
        padding=pad,
        kernel_dilation=(dilation, dilation),
        use_bias=use_bias, dtype=dtype, name=name,
        kernel_init=kernel_init or nn.initializers.he_normal())


def normalize_image(x, dtype=jnp.float32):
    """[0,1] RGB -> ImageNet-normalised, NHWC."""
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return ((x - mean) / std).astype(dtype)


def denormalize_image(x):
    """ImageNet-normalised -> [0,1] RGB (reference pascal_voc.py:85-100)."""
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return x.astype(jnp.float32) * std + mean


# residual-branch-final conv per backbone family; zeroing it makes each
# block identity at init (SkipInit, De & Smith 2020)
_SCRATCH_ZERO_LAST = {
    "resnet38": ("conv_branch2b1", "conv_branch2b2"),
    "resnet50": ("conv3",),
    "resnet101": ("conv3",),
}


def stabilize_scratch_init(params, backbone: str):
    """Make FROM-SCRATCH training viable: zero the last conv kernel of
    every residual branch so each block starts as identity.

    The reference recipe never trains from random init — BaseNet loads
    ImageNet weights unconditionally (reference base_net.py:42-45), and
    with random weights the frozen-at-identity BatchNorms let the
    activation scale grow multiplicatively through the 38-layer stack
    (measured: |logits| ~ 4e2, grad l2 ~ 5e4 at init -> NaN within a few
    SGD-momentum steps).  Zero-initialising the residual-branch output
    (SkipInit) collapses the backbone to near-identity at init, keeping
    logits and gradients sane.  Call ONLY when no pretrained weights are
    loaded — converted checkpoints must pass through untouched.
    """
    names = _SCRATCH_ZERO_LAST.get(backbone)
    if not names:
        return params

    import flax

    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for path, v in flat.items():
        if (len(path) >= 2 and path[-1] == "kernel"
                and path[-2] in names
                # for plain resnet38 blocks 2b1 is the last conv; bot
                # blocks have 2b2 after it — zero only the true last
                and not (path[-2] == "conv_branch2b1" and
                         tuple(path[:-2]) + ("conv_branch2b2", "kernel")
                         in flat)):
            v = jnp.zeros_like(v)
        out[path] = v
    return flax.traverse_util.unflatten_dict(out)
