"""SoftMaxAE decoder stack: ASPP + skip fusion + GCI + StochasticGate.

This is the CVPR-2020 paper model's head (cfg.NET.MODEL 'ae').  Structure
per reference models/SoftMaxAE.py:96-269, models/mods/{aspp,gci,sg}.py.

Norm semantics (see models/backbones/common.py): ASPP norms are AffineNorm
(the reference freezes their running stats at identity); decoder/GCI/skip
norms are true BatchNorms (batch stats in train mode, running averages for
eval).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from wseg_tpu.ops.activations import relu as wrelu

from wseg_tpu.models.backbones.common import AffineNorm, conv
from wseg_tpu.ops.resize import rescale_as
from wseg_tpu.ops.sg import stochastic_gate


def _bn(features, train, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


class ASPP(nn.Module):
    """4 atrous branches + global-pool branch, concat -> 256 (+dropout).

    reference models/mods/aspp.py:22-77; output_stride 8 dilations.
    """
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dil = (1, 12, 24, 36)
        outs = []
        for i, d in enumerate(dil):
            k = 1 if d == 1 else 3
            y = conv(256, k, 1, d, dtype=self.dtype,
                     name=f"aspp{i + 1}_conv")(x)
            y = AffineNorm(256, dtype=self.dtype, name=f"aspp{i + 1}_bn")(y)
            outs.append(wrelu(y))
        # image-level pooling branch
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = conv(256, 1, dtype=self.dtype, name="gap_conv")(g)
        g = AffineNorm(256, dtype=self.dtype, name="gap_bn")(g)
        g = wrelu(g)
        g = jnp.broadcast_to(g, outs[0].shape)
        y = jnp.concatenate(outs + [g], axis=-1)
        y = conv(256, 1, dtype=self.dtype, name="conv1")(y)
        y = AffineNorm(256, dtype=self.dtype, name="bn1")(y)
        y = wrelu(y)
        return nn.Dropout(0.5, deterministic=not train)(y)


class GCI(nn.Module):
    """Global Cue Injection: deep global descriptor modulates shallow
    features via AdIN (reference models/mods/gci.py:6-75)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_shallow, y_deep, *, train: bool = False):
        # deep -> 512 -> global max-pool -> (gamma, beta)
        y = conv(512, 1, dtype=self.dtype, name="fc_deep_conv")(y_deep)
        y = _bn(512, train, self.dtype, "fc_deep_bn")(y)
        y = wrelu(y)
        attrs = jnp.max(y, axis=(1, 2))  # (B, 512)
        gamma, beta = jnp.split(attrs, 2, axis=-1)  # (B,256) each

        # shallow -> 256 with an affine-free LIVE BatchNorm (reference
        # gci.py:41 creates it with affine=False but never freezes its
        # running stats — only backbone and ASPP norms are frozen)
        x = conv(256, 1, dtype=self.dtype, name="fc_skip_conv")(x_shallow)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, use_scale=False, use_bias=False,
                         dtype=self.dtype, name="fc_skip_bn")(x)

        x = x * (gamma[:, None, None, :] + 1.0) + beta[:, None, None, :]
        x = wrelu(x)

        x = conv(256, 1, dtype=self.dtype, name="fc_cls_conv")(x)
        x = _bn(256, train, self.dtype, "fc_cls_bn")(x)
        return wrelu(x)


class SoftMaxAEDecoder(nn.Module):
    """ASPP -> skip fusion -> GCI -> StochasticGate -> 3-conv decoder.

    Returns (num_classes - 1)-channel mask logits at conv3 resolution.
    """
    num_classes: int
    sg_psi: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, conv3, conv6, *, train: bool = False):
        x = ASPP(dtype=self.dtype, name="aspp")(conv6, train=train)

        # skip connection (reference SoftMaxAE.py:199-201)
        x2_x = conv(48, 1, dtype=self.dtype, name="fc8_skip_conv")(conv3)
        x2_x = _bn(48, train, self.dtype, "fc8_skip_bn")(x2_x)
        x2_x = wrelu(x2_x)
        x_up = rescale_as(x, x2_x)
        x = conv(256, 3, dtype=self.dtype, name="fc8_x_conv")(
            jnp.concatenate([x_up, x2_x], axis=-1))
        x = _bn(256, train, self.dtype, "fc8_x_bn")(x)
        x = wrelu(x)

        # deep-feature context for shallow features
        x2 = GCI(dtype=self.dtype, name="shallow_mask")(conv3, x,
                                                        train=train)

        # stochastic merge
        rng = self.make_rng("sg") if train else None
        x = stochastic_gate(x, x2, psi=self.sg_psi, train=train, rng=rng)

        # decoder convs
        x = conv(256, 3, dtype=self.dtype, name="last_conv1")(x)
        x = _bn(256, train, self.dtype, "last_bn1")(x)
        x = wrelu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = conv(256, 3, dtype=self.dtype, name="last_conv2")(x)
        x = _bn(256, train, self.dtype, "last_bn2")(x)
        x = wrelu(x)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        x = nn.Conv(self.num_classes - 1, (1, 1), dtype=self.dtype,
                    name="last_conv3")(x)
        return x
