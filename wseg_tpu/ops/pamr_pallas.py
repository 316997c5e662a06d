"""Fused Pallas TPU kernel for PAMR mask propagation.

The XLA fallback (wseg_tpu/ops/pamr.py) lowers the 48-tap shift-accumulate
to hundreds of separate HBM-bound ops in a (B,H,W,C) layout whose C=21
minor dim wastes 107/128 lanes — measured 158 ms for 10 iterations at
(8,96,96,21) on v5e.  This kernel:

  * works in a (C, H, W) per-batch layout: W on the 128-lane minor dim,
    H on sublanes, channels as the major dim — full lane utilisation;
  * holds the edge-padded mask, the affinities, and the accumulator in
    VMEM for the whole tap loop (one mask read + one affinity read per
    iteration, the theoretical minimum);
  * loops the 48 taps with lax.fori_loop over an SMEM offset table, so
    the unrolled-slice register pressure that OOMed a naive version
    never materialises.

PAMR runs at mask (stride 4-8) resolution (reference
models/SoftMaxAE.py:176-179), i.e. H, W <= ~130, so one batch item's
buffers (~7 MB) fit VMEM comfortably.  Grid = (B,).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wseg_tpu.ops.pamr import _OFFSETS


def _taps(dilations: Sequence[int]):
    return [(dy * d, dx * d) for d in dilations for dy, dx in _OFFSETS]


def _step_kernel(mask_pad_ref, aff_ref, out_ref, *, taps, pad, h, w):
    """One Jacobi step for one batch item.

    mask_pad_ref: (1, C, H + 2*pad, W + 2*pad) edge-padded mask (VMEM)
    aff_ref:      (1, n_taps, H, W) affinities (VMEM)
    out_ref:      (1, C, H, W)

    The tap loop is unrolled with STATIC offsets (Mosaic supports
    unaligned static slices; dynamic sublane slices would need 8-aligned
    starts).  Accumulation goes through out_ref read-modify-write per tap
    so no long-lived vector values pile up in registers (a version that
    accumulated in an SSA value spilled 175 MB).
    """
    out_ref[...] = jnp.zeros_like(out_ref)
    for t, (dy, dx) in enumerate(taps):
        win = mask_pad_ref[0, :, pad + dy:pad + dy + h,
                           pad + dx:pad + dx + w]
        a = aff_ref[0, t, :, :]
        out_ref[0] += a[None, :, :] * win


def pamr_propagate_pallas(aff, mask, dilations=(1, 2, 4, 8, 12, 24),
                          num_iter: int = 10):
    """Drop-in replacement for ops.pamr.pamr_propagate.

    Args/returns in the public NHWC layout; the kernel-internal CHW
    transposes are fused by XLA around the scan.
    """
    taps = _taps(tuple(dilations))
    pad = max(dilations)
    b, h, w, c = mask.shape
    t = aff.shape[-1]
    assert t == len(taps), (t, len(taps))

    mask_chw = jnp.transpose(mask.astype(jnp.float32), (0, 3, 1, 2))
    aff_thw = jnp.transpose(aff.astype(jnp.float32), (0, 3, 1, 2))

    kernel = functools.partial(_step_kernel, taps=taps, pad=pad, h=h, w=w)

    step = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h + 2 * pad, w + 2 * pad),
                         lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, h, w), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, h, w), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
    )

    def one_iter(m, _):
        mp = jnp.pad(m, ((0, 0), (0, 0), (pad, pad), (pad, pad)),
                     mode="edge")
        return step(mp, aff_thw), None

    out, _ = jax.lax.scan(one_iter, mask_chw, None, length=num_iter)
    return jnp.transpose(out, (0, 2, 3, 1))
