"""Fused Pallas TPU kernel for PAMR mask propagation.

One Jacobi iteration reads the (edge-padded) mask and the 48-tap affinity
into VMEM once and performs the whole ``m <- sum_t aff_t * shift_t(m)``
accumulation on-chip.  The XLA fallback (wseg_tpu/ops/pamr.py) re-reads
shifted mask windows from HBM per tap; the fused kernel's traffic is one
mask read + one affinity read per iteration — the theoretical minimum
(the affinity, at T=48 channels vs C=21, dominates).

PAMR runs at mask (stride 4-8) resolution — H, W <= ~130 (reference
models/SoftMaxAE.py:176-179 downsamples the guide image to the mask size) —
so one batch item's padded mask (<=178*178*21*4B ~ 2.7 MB) and affinity
(<=130*130*48*4B ~ 3.2 MB) fit VMEM comfortably.  Grid = (B,); all 48
shifted multiply-accumulates happen on the VPU from VMEM.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wseg_tpu.ops.pamr import _OFFSETS


def _taps(dilations: Sequence[int]):
    return [(dy * d, dx * d) for d in dilations for dy, dx in _OFFSETS]


def _step_kernel(mask_pad_ref, aff_ref, out_ref, *, taps, pad, h, w):
    """One propagation step for one batch item.

    mask_pad_ref: (1, H + 2*pad, W + 2*pad, C) edge-padded mask (VMEM)
    aff_ref:      (1, H, W, T)
    out_ref:      (1, H, W, C)
    """
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for t, (dy, dx) in enumerate(taps):
        m = mask_pad_ref[:, pad + dy:pad + dy + h,
                         pad + dx:pad + dx + w, :]
        a = aff_ref[:, :, :, t:t + 1]
        acc = acc + a * m
    out_ref[...] = acc


def pamr_propagate_pallas(aff, mask, dilations=(1, 2, 4, 8, 12, 24),
                          num_iter: int = 10):
    """Drop-in replacement for ops.pamr.pamr_propagate (NHWC, float32)."""
    taps = _taps(tuple(dilations))
    pad = max(dilations)
    b, h, w, c = mask.shape
    t = aff.shape[-1]
    assert t == len(taps), (t, len(taps))

    mask = mask.astype(jnp.float32)
    aff = aff.astype(jnp.float32)

    kernel = functools.partial(_step_kernel, taps=taps, pad=pad, h=h, w=w)

    step = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h + 2 * pad, w + 2 * pad, c),
                         lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, t), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.float32),
    )

    def one_iter(m, _):
        mp = jnp.pad(m, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                     mode="edge")
        return step(mp, aff), None

    out, _ = jax.lax.scan(one_iter, mask, None, length=num_iter)
    return out
