"""Semantic-FPN head (reference models/mods/FPN.py:37-157).

Kept for experiment parity: the reference ships this head but never wires
it into the registry (dead code there too, SURVEY.md §2.5).  Takes the
multi-level taps {conv3, conv4, conv5, conv6} and produces a fused
feature map at 1/4 resolution via lateral 1x1 convs + top-down upsampling
+ per-level 3x3 refinement, summed after upsampling to the finest level.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from wseg_tpu.models.backbones.common import conv
from wseg_tpu.ops.activations import relu as wrelu
from wseg_tpu.ops.resize import resize_bilinear


class FPN(nn.Module):
    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, taps: Dict[str, Any], *, train: bool = False):
        levels = [k for k in ("conv3", "conv4", "conv5", "conv6")
                  if k in taps]
        assert len(levels) >= 2, "FPN needs multi-level taps"
        feats = [taps[k] for k in levels]

        # lateral 1x1 projections
        lats = [conv(self.out_channels, 1, dtype=self.dtype,
                     name=f"lateral_{k}")(f)
                for k, f in zip(levels, feats)]

        # top-down pathway (coarsest -> finest)
        outs = [lats[-1]]
        for lat in reversed(lats[:-1]):
            up = resize_bilinear(outs[0], (lat.shape[1], lat.shape[2]),
                                 align_corners=False)
            outs.insert(0, lat + up)

        # per-level 3x3 refinement, upsample to the finest, sum
        fused = None
        target_hw = (outs[0].shape[1], outs[0].shape[2])
        for k, o in zip(levels, outs):
            o = conv(self.out_channels, 3, dtype=self.dtype,
                     name=f"smooth_{k}")(o)
            o = wrelu(o)
            if (o.shape[1], o.shape[2]) != target_hw:
                o = resize_bilinear(o, target_hw, align_corners=False)
            fused = o if fused is None else fused + o
        return fused
