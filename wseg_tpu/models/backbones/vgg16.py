"""VGG16 (DeepLab-LargeFOV style) backbone as a Flax module.

Mirrors reference models/backbones/vgg16d.py:9-78: 13 convs, pool4/pool5 at
stride 1, dilated conv5 (dilation 2), fc6/fc7 as 1024-channel convs ->
output stride 8.  Taps: conv3 (256ch, stride 4 pre-pool3), conv6 (fc7 out).
Stem conv1_1/conv1_2 is frozen.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from wseg_tpu.ops.activations import relu as wrelu

from wseg_tpu.models.backbones.common import conv


def _pool(x, stride):
    return nn.max_pool(x, (3, 3), strides=(stride, stride),
                       padding=[(1, 1), (1, 1)])


class VGG16(nn.Module):
    dtype: Any = jnp.float32
    fc6_dilation: int = 1

    FROZEN_STEM = ("conv1_1", "conv1_2")

    def fan_out(self) -> int:
        return 1024

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> Dict[str, Any]:
        d = self.dtype

        def c(feat, name, dilation=1):
            return conv(feat, 3, 1, dilation, use_bias=True, dtype=d,
                        name=name)

        x = wrelu(c(64, "conv1_1")(x))
        x = wrelu(c(64, "conv1_2")(x))
        x = _pool(x, 2)
        x = wrelu(c(128, "conv2_1")(x))
        x = wrelu(c(128, "conv2_2")(x))
        x = _pool(x, 2)
        x = wrelu(c(256, "conv3_1")(x))
        x = wrelu(c(256, "conv3_2")(x))
        x = wrelu(c(256, "conv3_3")(x))
        conv3 = x
        x = _pool(x, 2)
        x = wrelu(c(512, "conv4_1")(x))
        x = wrelu(c(512, "conv4_2")(x))
        x = wrelu(c(512, "conv4_3")(x))
        x = _pool(x, 1)
        x = wrelu(c(512, "conv5_1", 2)(x))
        x = wrelu(c(512, "conv5_2", 2)(x))
        x = wrelu(c(512, "conv5_3", 2)(x))
        x = wrelu(conv(1024, 3, 1, self.fc6_dilation, use_bias=True,
                         dtype=d, name="fc6")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = wrelu(conv(1024, 1, use_bias=True, dtype=d, name="fc7")(x))
        return {"conv3": conv3, "conv6": x}
