"""WideResNet-38 (mxnet-style dilated WRN, "ResNet38") as a Flax module.

Structure per reference models/backbones/resnet38d.py:106-176 (and the
multi-tap variant resnet38d_v2.py:145-189): pre-activation residual blocks,
stride 8 after b4, dilation 2 in b5, bottleneck blocks b6/b7 at dilation 4
with channel dropout, final BN+ReLU to 4096 channels.  All BatchNorms are
frozen (stats + affine) in this framework's training recipe, so they are
FrozenBatchNorm modules whose constants fold into the convs at compile
time.  Taps returned: conv3 (stride 4, 256ch), conv4/conv5 (pre-activation
BN+ReLU inputs of b5/b6), conv6 (post bn7+relu, 4096ch).

Layout NHWC; compute dtype configurable (bfloat16 by default at call sites).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from wseg_tpu.ops.activations import relu as wrelu

from wseg_tpu.models.backbones.common import FrozenBatchNorm, conv


class ResBlock(nn.Module):
    """Pre-activation 3x3/3x3 residual block."""
    mid: int
    out: int
    stride: int = 1
    first_dilation: int | None = None
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_ch = x.shape[-1]
        same_shape = (in_ch == self.out and self.stride == 1)
        fd = self.first_dilation if self.first_dilation is not None \
            else self.dilation

        b = FrozenBatchNorm(in_ch, dtype=self.dtype, name="bn_branch2a")(x)
        b = wrelu(b)
        x_bn_relu = b

        shortcut = x if same_shape else conv(
            self.out, 1, self.stride, dtype=self.dtype,
            name="conv_branch1")(b)

        b = conv(self.mid, 3, self.stride, fd, dtype=self.dtype,
                 name="conv_branch2a")(b)
        b = FrozenBatchNorm(self.mid, dtype=self.dtype,
                            name="bn_branch2b1")(b)
        b = wrelu(b)
        b = conv(self.out, 3, 1, self.dilation, dtype=self.dtype,
                 name="conv_branch2b1")(b)
        return shortcut + b, x_bn_relu


class ResBlockBot(nn.Module):
    """Pre-activation 1x1/3x3/1x1 bottleneck with channel dropout."""
    out: int
    stride: int = 1
    dilation: int = 1
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_ch = x.shape[-1]

        b = FrozenBatchNorm(in_ch, dtype=self.dtype, name="bn_branch2a")(x)
        b = wrelu(b)
        x_bn_relu = b

        shortcut = conv(self.out, 1, self.stride, dtype=self.dtype,
                        name="conv_branch1")(b)

        b = conv(self.out // 4, 1, self.stride, dtype=self.dtype,
                 name="conv_branch2a")(b)
        b = FrozenBatchNorm(self.out // 4, dtype=self.dtype,
                            name="bn_branch2b1")(b)
        b = wrelu(b)
        if self.dropout > 0:
            # torch Dropout2d drops whole channels (reference
            # resnet38d.py:66); broadcast over H, W
            b = nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                           deterministic=not train)(b)
        b = conv(self.out // 2, 3, 1, self.dilation, dtype=self.dtype,
                 name="conv_branch2b1")(b)
        b = FrozenBatchNorm(self.out // 2, dtype=self.dtype,
                            name="bn_branch2b2")(b)
        b = wrelu(b)
        if self.dropout > 0:
            b = nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                           deterministic=not train)(b)
        b = conv(self.out, 1, 1, dtype=self.dtype,
                 name="conv_branch2b2")(b)
        return shortcut + b, x_bn_relu


class ResNet38(nn.Module):
    """WRN-38 trunk; ``__call__`` returns a tap dict."""
    dtype: Any = jnp.float32

    # module names whose params are never trained (reference
    # resnet38d.py:139 fixes conv1a + the b2 group)
    FROZEN_STEM = ("conv1a", "b2", "b2_1", "b2_2")

    def fan_out(self) -> int:
        return 4096

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> Dict[str, Any]:
        x = conv(64, 3, dtype=self.dtype, name="conv1a")(x)

        x, _ = ResBlock(128, 128, 2, dtype=self.dtype, name="b2")(
            x, train=train)
        x, _ = ResBlock(128, 128, dtype=self.dtype, name="b2_1")(
            x, train=train)
        x, _ = ResBlock(128, 128, dtype=self.dtype, name="b2_2")(
            x, train=train)

        x, _ = ResBlock(256, 256, 2, dtype=self.dtype, name="b3")(
            x, train=train)
        x, _ = ResBlock(256, 256, dtype=self.dtype, name="b3_1")(
            x, train=train)
        x, _ = ResBlock(256, 256, dtype=self.dtype, name="b3_2")(
            x, train=train)
        conv3 = x

        # conv3_pre = b4's pre-activation BN+ReLU: the 'conv3' tap of the
        # multi-level variant (reference resnet38d_v2.py:161-162), distinct
        # from the raw post-residual 'conv3' of resnet38d.py:158-160
        x, conv3_pre = ResBlock(512, 512, 2, dtype=self.dtype, name="b4")(
            x, train=train)
        for i in range(1, 6):
            x, _ = ResBlock(512, 512, dtype=self.dtype,
                            name=f"b4_{i}")(x, train=train)

        x, conv4 = ResBlock(512, 1024, 1, first_dilation=1, dilation=2,
                            dtype=self.dtype, name="b5")(x, train=train)
        x, _ = ResBlock(512, 1024, dilation=2, dtype=self.dtype,
                        name="b5_1")(x, train=train)
        x, _ = ResBlock(512, 1024, dilation=2, dtype=self.dtype,
                        name="b5_2")(x, train=train)

        x, conv5 = ResBlockBot(2048, 1, 4, 0.3, dtype=self.dtype,
                               name="b6")(x, train=train)
        x, _ = ResBlockBot(4096, 1, 4, 0.5, dtype=self.dtype,
                           name="b7")(x, train=train)

        x = FrozenBatchNorm(4096, dtype=self.dtype, name="bn7")(x)
        conv6 = wrelu(x)

        return {"conv3": conv3, "conv3_pre": conv3_pre, "conv4": conv4,
                "conv5": conv5, "conv6": conv6}
