"""Fused Pallas TPU kernels for PAMR (affinity + propagation).

Why not XLA: the 48-tap shift-accumulate lowers to ~500 separate
HBM-bound ops whose C=21/K=3 minor dims get padded to 128 lanes (up to
42x physical inflation) — measured 156-336 ms for 10 iterations at
(8,96,96,21) on v5e depending on layout.  Pallas versions tried:

  * unaligned VMEM window slices     -> Mosaic per-element copies
  * shifts as MXU band matmuls       -> exact f32 needs 6-pass HIGHEST
                                        precision (16.7 ms chained)
  * dy-grouped rotates               -> 13 sublane + 48 LANE rolls/iter,
                                        2.91 ms chained
  * THIS: dx-grouped rotates — ONE lane rotate per distinct column
    offset (13, not 48) + one cheap sublane rotate per tap, offset-0
    slices (always aligned), accumulation through a VMEM ref, and all
    ``num_iter`` Jacobi iterations inside ONE kernel with the padded
    mask living in VMEM scratch (borders re-replicated in-kernel) —
    HBM sees each input exactly once.  2.20 ms chained at
    (8,96,96,21) x 10 iters on v5e vs 11.99 ms for the XLA lax path
    (device-chained timing; see tools/bench_pamr.py — dispatch-paced
    numbers through the relay are ~1 ms higher, and round-1's
    "137-158 ms" history was serialized-fetch measurement artifact).

PAMR runs at mask (stride 4-8) resolution (reference
models/SoftMaxAE.py:176-179), i.e. H, W <= ~130; per-batch-item buffers
are a few MB.  Grid = (B,).
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


def _dy_groups(taps):
    """Group tap indices by their row offset: [(dy, [(t, dx), ...]), ...]"""
    groups = {}
    for t, (dy, dx) in enumerate(taps):
        groups.setdefault(dy, []).append((t, dx))
    return sorted(groups.items())


def _dx_groups(taps):
    """Group tap indices by their column offset: [(dx, [(t, dy), ...])]."""
    groups = {}
    for t, (dy, dx) in enumerate(taps):
        groups.setdefault(dx, []).append((t, dy))
    return sorted(groups.items())


def _propagate_kernel(mask_ref, aff_ref, out_ref, mpad_ref,
                      acc_ref, *, groups, pad, h, w, num_iter):
    """All Jacobi iterations for one batch item.

    mask_ref:  (1, C, H, W) input mask
    aff_ref:   (1, T, H, W) affinities
    out_ref:   (1, C, H, W)
    mpad_ref:  (C, Hp, Wp) VMEM scratch holding the edge-padded mask
    """
    hp = h + 2 * pad

    def write_padded(src):
        """src (C, H, W) -> mpad with edge replication."""
        mpad_ref[:, pad:pad + h, pad:pad + w] = src
        top = src[:, 0:1, :]
        bot = src[:, h - 1:h, :]
        mpad_ref[:, :pad, pad:pad + w] = jnp.broadcast_to(
            top, (src.shape[0], pad, w))
        mpad_ref[:, pad + h:, pad:pad + w] = jnp.broadcast_to(
            bot, (src.shape[0], pad, w))
        left = mpad_ref[:, :, pad:pad + 1]
        mpad_ref[:, :, :pad] = jnp.broadcast_to(
            left, (src.shape[0], hp, pad))
        right = mpad_ref[:, :, pad + w - 1:pad + w]
        mpad_ref[:, :, pad + w:] = jnp.broadcast_to(
            right, (src.shape[0], hp, pad))

    write_padded(mask_ref[0])

    wp = w + 2 * pad

    def one_iter(_, carry):
        # accumulate through a ref so rolled temporaries die immediately
        # (SSA accumulation kept ~33 MB of vectors live and blew the
        # scoped-VMEM stack)
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)
        for dx, group in groups:
            # ONE lane rotate per distinct column offset (13/iter), then
            # a cheap sublane rotate per tap: lane rotates are cross-vreg
            # shuffles and dominate — dy-grouping (48 lane rolls/iter)
            # measures 2.91 ms vs 2.20 ms for this ordering
            rx = pltpu.roll(mpad_ref[...], (wp - (pad + dx)) % wp,
                            2)[:, :, :w]
            for t, dy in group:
                win = pltpu.roll(rx, (hp - (pad + dy)) % hp, 1)[:, :h, :]
                acc_ref[...] += aff_ref[0, t][None, :, :] * win
        write_padded(acc_ref[...])
        return carry

    jax.lax.fori_loop(0, num_iter, one_iter, 0)
    out_ref[0] = mpad_ref[:, pad:pad + h, pad:pad + w]


def pamr_propagate_pallas(aff, mask, dilations=(1, 2, 4, 8, 12, 24),
                          num_iter: int = 10):
    """Drop-in replacement for ops.pamr.pamr_propagate (NHWC contract)."""
    taps = _taps(tuple(dilations))
    pad = max(dilations)
    b, h, w, c = mask.shape
    t = aff.shape[-1]
    assert t == len(taps), (t, len(taps))

    groups = _dx_groups(taps)

    mask_chw = jnp.transpose(mask.astype(jnp.float32), (0, 3, 1, 2))
    aff_thw = jnp.transpose(aff.astype(jnp.float32), (0, 3, 1, 2))

    kernel = functools.partial(_propagate_kernel, groups=groups,
                               pad=pad, h=h, w=w, num_iter=num_iter)

    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, h, w), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, h, w), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, h + 2 * pad, w + 2 * pad),
                                   jnp.float32),
                        pltpu.VMEM((c, h, w), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(mask_chw, aff_thw)
    return jnp.transpose(out, (0, 2, 3, 1))


# --------------------------------------------------------------- affinity
def _affinity_kernel(im_pad_ref, aff_ref, *, dilations, pad, h, w):
    """Affinity for one batch item, fully fused.

    im_pad_ref: (1, K, Hp, Wp) edge-padded guide image (VMEM)
    aff_ref:    (1, T, H, W) output softmax affinities
    """
    im = im_pad_ref[0]  # (K, Hp, Wp)
    hp, wp = h + 2 * pad, w + 2 * pad
    centre = im[:, pad:pad + h, pad:pad + w]

    def win(dy, dx):
        r = pltpu.roll(im, (hp - (pad + dy)) % hp, 1)
        r = pltpu.roll(r, (wp - (pad + dx)) % wp, 2)
        return r[:, :h, :w]

    taps9 = [(dy * d, dx * d) for d in dilations
             for dy, dx in list(_OFFSETS) + [(0, 0)]]
    n9 = len(taps9)
    s = jnp.zeros_like(centre)
    s2 = jnp.zeros_like(centre)
    for dy, dx in taps9:
        n = win(dy, dx)
        s = s + n
        s2 = s2 + n * n
    mean = s / n9
    var = (s2 - n9 * mean * mean) / (n9 - 1)
    inv_sigma = 1.0 / (1e-8 + 0.1 * jnp.sqrt(jnp.maximum(var, 0.0)))

    taps8 = [(dy * d, dx * d) for d in dilations for dy, dx in _OFFSETS]
    for t, (dy, dx) in enumerate(taps8):
        diff = jnp.abs(centre - win(dy, dx)) * inv_sigma
        aff_ref[0, t] = -jnp.mean(diff, axis=0)

    # softmax over the tap axis (major dim)
    mx = aff_ref[0, 0]
    for t in range(1, len(taps8)):
        mx = jnp.maximum(mx, aff_ref[0, t])
    tot = jnp.zeros_like(mx)
    for t in range(len(taps8)):
        e = jnp.exp(aff_ref[0, t] - mx)
        aff_ref[0, t] = e
        tot = tot + e
    inv = 1.0 / tot
    for t in range(len(taps8)):
        aff_ref[0, t] *= inv


def pamr_affinity_pallas(im, dilations=(1, 2, 4, 8, 12, 24)):
    """Fused affinity: one kernel per batch item; NHWC public contract."""
    dilations = tuple(dilations)
    b, h, w, k = im.shape
    pad = max(dilations)
    t = 8 * len(dilations)
    im_chw = jnp.transpose(im.astype(jnp.float32), (0, 3, 1, 2))
    im_pad = jnp.pad(im_chw, ((0, 0), (0, 0), (pad, pad), (pad, pad)),
                     mode="edge")

    kernel = functools.partial(_affinity_kernel, dilations=dilations,
                               pad=pad, h=h, w=w)
    aff = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, k, h + 2 * pad, w + 2 * pad),
                               lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, t, h, w), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, h, w), jnp.float32),
    )(im_pad)
    return jnp.transpose(aff, (0, 2, 3, 1))
