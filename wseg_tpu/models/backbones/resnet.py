"""ResNet-50/101 (stride-16, no classifier head) as Flax modules.

Mirrors the capability of reference models/backbones/resnets.py:17-219:
bottleneck ResNet whose layer4 keeps stride 1 (output stride 16), taps
conv3 = layer1 output and conv6 = layer4 output, stem (conv1+bn1) frozen.
All BatchNorms are frozen in this recipe (the reference freezes them via
``_fix_running_stats(self, fix_params=True)`` in every model wrapper), so
they are FrozenBatchNorm modules.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp

from wseg_tpu.ops.activations import relu as wrelu

from wseg_tpu.models.backbones.common import FrozenBatchNorm, conv


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * self.expansion
        identity = x
        y = conv(self.planes, 1, dtype=self.dtype, name="conv1")(x)
        y = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn1")(y)
        y = wrelu(y)
        y = conv(self.planes, 3, self.stride, self.dilation,
                 dtype=self.dtype, name="conv2")(y)
        y = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn2")(y)
        y = wrelu(y)
        y = conv(out_ch, 1, dtype=self.dtype, name="conv3")(y)
        y = FrozenBatchNorm(out_ch, dtype=self.dtype, name="bn3")(y)
        if self.downsample:
            identity = conv(out_ch, 1, self.stride, dtype=self.dtype,
                            name="downsample_conv")(x)
            identity = FrozenBatchNorm(out_ch, dtype=self.dtype,
                                       name="downsample_bn")(identity)
        return wrelu(y + identity)


class ResNet(nn.Module):
    layers: Sequence[int]
    dtype: Any = jnp.float32
    # PSPNet-style 3x conv3x3 stem (reference resnets.py:86-93).  The
    # reference ships the option but asserts it off for its ResNet50/101
    # constructors (resnets.py:202,216); kept for checkpoint parity with
    # deep-stem ImageNet weights.
    deep_base: bool = False

    FROZEN_STEM = ("conv1", "bn1", "conv2", "bn2", "conv3", "bn3")

    def fan_out(self) -> int:
        return 2048

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> Dict[str, Any]:
        if self.deep_base:
            x = conv(64, 3, 2, dtype=self.dtype, name="conv1")(x)
            x = FrozenBatchNorm(64, dtype=self.dtype, name="bn1")(x)
            x = wrelu(x)
            x = conv(64, 3, dtype=self.dtype, name="conv2")(x)
            x = FrozenBatchNorm(64, dtype=self.dtype, name="bn2")(x)
            x = wrelu(x)
            x = conv(128, 3, dtype=self.dtype, name="conv3")(x)
            x = FrozenBatchNorm(128, dtype=self.dtype, name="bn3")(x)
        else:
            # common.conv: same 7x7/s2/pad3 geometry, and routes the
            # int8-mode marker dtype like every other backbone conv;
            # keep nn.Conv's lecun_normal init (pre-change behaviour
            # for from-scratch runs — pretrained loads are unaffected)
            x = conv(64, 7, 2, dtype=self.dtype, name="conv1",
                     kernel_init=nn.initializers.lecun_normal())(x)
            x = FrozenBatchNorm(64, dtype=self.dtype, name="bn1")(x)
        x = wrelu(x)
        # torch MaxPool2d(3, stride 2, padding 1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        def stage(x, planes, blocks, stride, name):
            in_ch = x.shape[-1]
            for i in range(blocks):
                s = stride if i == 0 else 1
                ds = (s != 1 or in_ch != planes * 4) if i == 0 else False
                x = Bottleneck(planes, s, downsample=ds, dtype=self.dtype,
                               name=f"{name}_{i}")(x)
                in_ch = x.shape[-1]
            return x

        x = stage(x, 64, self.layers[0], 1, "layer1")
        conv3 = x
        x = stage(x, 128, self.layers[1], 2, "layer2")
        x = stage(x, 256, self.layers[2], 2, "layer3")
        # layer4 at stride 1 -> output stride 16 (reference resnets.py:102)
        x = stage(x, 512, self.layers[3], 1, "layer4")
        return {"conv3": conv3, "conv6": x}


def ResNet50(dtype=jnp.float32):
    return ResNet(layers=(3, 4, 6, 3), dtype=dtype)


def ResNet101(dtype=jnp.float32):
    return ResNet(layers=(3, 4, 23, 3), dtype=dtype)
