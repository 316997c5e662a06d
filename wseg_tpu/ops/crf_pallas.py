"""Fused Pallas TPU kernel for the dense-CRF bilateral message.

Why not XLA: the sparse-grid bilateral message is, per mean-field
iteration, ``msg(x) = sum_k W_k(x) * Q(x + d_k)`` over ~80 displacement
taps.  XLA lowers each tap to pad+slice+multiply+add over the full
(B, H/s, W/s, C) array — every tap materialises a shifted copy, so HBM
sees ~80 full-array round trips per iteration (measured 22 ms/img at
the 384x512 merge canvas on v5e, the dominant cost of the device
postprocess).  Pallas keeps the zero-padded Q and all tap weights in
VMEM and does the whole tap sum in one kernel: HBM sees each operand
once per iteration.

Same dx-grouped rotate idiom as ops/pamr_pallas.py (the computation has
the same shape: per-pixel weights times shifted planes): ONE lane
rotate per distinct column offset, then a cheap sublane rotate per tap;
zero fill falls out of rolling the zero-padded buffer (offsets never
wrap into live rows because |d| <= pad).

Layout is channels-major (C, H, W): a C=21 minor dim would pad to 128
lanes (6x physical memory); W-minor keeps lanes dense.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dx_groups(taps):
    groups = {}
    for t, (dy, dx) in enumerate(taps):
        groups.setdefault(dx, []).append((t, dy))
    return sorted(groups.items())


def _bilateral_kernel(qp_ref, w_ref, out_ref, *, groups, pad, h, w):
    """One batch slot: out[c] = sum_k w[k] * shift(q, d_k)[c].

    qp_ref: (1, C, Hp, Wp) zero-padded Q (f32 — Mosaic's dynamic
      roll is 32-bit only, so the wrapper upcasts before padding)
    w_ref:  (1, T, H, W) per-tap weights (bf16)
    out_ref: (1, C, H, W) f32 message
    """
    hp = h + 2 * pad
    wp = w + 2 * pad
    qp = qp_ref[0]
    # accumulate through the ref: SSA accumulation keeps every rolled
    # temporary live and spills (register-allocator spill slots blew
    # vmem in the gauss kernel; same idiom as pamr_pallas)
    out_ref[0] = jnp.zeros(out_ref.shape[1:], jnp.float32)
    for dx, group in groups:
        rx = pltpu.roll(qp, (wp - (pad + dx)) % wp, 2)[:, :, :w]
        for t, dy in group:
            win = pltpu.roll(rx, (hp - (pad + dy)) % hp, 1)[:, :h, :]
            out_ref[0] += w_ref[0, t][None].astype(jnp.float32) * win


def bilateral_message_pallas(qn, weights, taps: Sequence[Tuple[int, int]]):
    """``msg(x) = sum_k weights_k(x) * qn(x + d_k)`` with zero fill.

    NHWC wrapper around :func:`bilateral_message_pallas_cm` (kept for
    callers outside the channels-major CRF loop).

    Args:
      qn: (B, H, W, C) pre-scaled Q (Q * norm_b * valid), any float
        dtype; upcast to f32 inside (Mosaic roll is 32-bit only) — the
        bf16 saving applies to the tap WEIGHTS, which dominate the
        VMEM/HBM budget at production tap counts.
      weights: (B, H, W, T) per-tap weights (spatial * colour * valid).
      taps: T static (dy, dx) displacements.
    Returns:
      (B, H, W, C) float32 message.
    """
    out = bilateral_message_pallas_cm(
        jnp.transpose(qn, (0, 3, 1, 2)),
        jnp.transpose(weights, (0, 3, 1, 2)), taps)
    return jnp.transpose(out, (0, 2, 3, 1))


def bilateral_message_pallas_cm(q_chw, w_thw,
                                taps: Sequence[Tuple[int, int]]):
    """Channels-major entry: q (B, C, H, W), weights (B, T, H, W) ->
    (B, C, H, W) f32 message.  The CRF mean-field loop keeps every
    array W-minor (a C=21 minor dim pads to 128 lanes = 6x HBM
    traffic), so no transposes are paid per iteration."""
    b, c, h, w = q_chw.shape
    t = w_thw.shape[1]
    assert t == len(taps), (t, len(taps))
    pad = max(max(abs(dy), abs(dx)) for dy, dx in taps)
    groups = _dx_groups(taps)

    # padded Q is f32 in VMEM: Mosaic's dynamic rotate only supports
    # 32-bit lanes ("Rotate with non-32-bit data"); the tap weights stay
    # bf16 (they are only multiplied, never rolled)
    qp = jnp.pad(q_chw.astype(jnp.float32),
                 ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    w_thw = w_thw.astype(jnp.bfloat16)

    kernel = functools.partial(_bilateral_kernel, groups=groups,
                               pad=pad, h=h, w=w)
    out = pl.pallas_call(
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qp, w_thw)
    return out


def _gauss_kernel(xp_ref, out_ref, acc_ref, *, k1d, r, h, w):
    """Separable 13-tap Gaussian for one slot, both passes in VMEM.

    xp_ref: (1, C, H+2r, W+2r) zero-padded input (f32)
    out_ref: (1, C, H, W) f32
    acc_ref: (C, H, W+2r) f32 scratch (H pass result, W still padded)
    """
    hp = h + 2 * r
    wp = w + 2 * r
    xp = xp_ref[0]
    # ref-accumulation (not SSA): rolled temporaries die immediately
    acc_ref[...] = k1d[0] * xp[:, :h, :]
    for i in range(1, 2 * r + 1):
        acc_ref[...] += k1d[i] * pltpu.roll(xp, hp - i, 1)[:, :h, :]
    out_ref[0] = k1d[0] * acc_ref[:, :, 0:w]
    for i in range(1, 2 * r + 1):
        out_ref[0] += k1d[i] * pltpu.roll(acc_ref[...], wp - i,
                                          2)[:, :, :w]


def gauss_blur_pallas(x, k1d_host, r: int):
    """Zero-padded separable blur: equivalent to
    ``correlate1d(correlate1d(x, k, axis=H), k, axis=W)`` with constant
    padding.  One kernel per batch slot; HBM sees x and the output once
    (the XLA slice-sum reads the full array once per tap — 26 round
    trips per mean-field iteration at (8, 384, 512, 21)).
    """
    out = gauss_blur_pallas_cm(jnp.transpose(x, (0, 3, 1, 2)),
                               k1d_host, r)
    return jnp.transpose(out, (0, 2, 3, 1))


def gauss_blur_pallas_cm(x_chw, k1d_host, r: int):
    """Channels-major entry: (B, C, H, W) -> (B, C, H, W) f32."""
    b, c, h, w = x_chw.shape
    xp = jnp.pad(x_chw.astype(jnp.float32),
                 ((0, 0), (0, 0), (r, r), (r, r)))
    k1d = [float(v) for v in np.asarray(k1d_host, np.float32)]

    kernel = functools.partial(_gauss_kernel, k1d=k1d, r=r, h=h, w=w)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, c, h + 2 * r, w + 2 * r),
                               lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, c, h, w), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, h, w + 2 * r), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp)
    return out
