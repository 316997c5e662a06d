#!/usr/bin/env python
"""PAMR kernel lab: time propagate/affinity variants on the TPU.

Round-1 history at (8,96,96,21) x 10 iters (v5e):
  XLA NHWC 158 ms / XLA CHW 336 ms / Pallas slices 281 ms /
  Pallas matmul-per-tap 239 ms / Pallas rotate-shifts ~137 ms (exact).

This lab tests the round-2 hypotheses:
  * 'fold':   per-roll overhead dominates -> fold the batch into the
              kernel block so each roll moves B items at once
              (61 rolls/iter total instead of 61*B).
  * 'mxu':    do the 48 column shifts as ONE selector matmul per distinct
              row offset (13 matmuls/iter, N-wide, 128-aligned windows)
              on the MXU instead of lane rotates.
  * 'bf16':   halve roll bytes (storage bf16, accumulate f32).

Usage:  python tools/bench_pamr.py [--shape 8,96,96,21] [--iters 10]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wseg_tpu.ops.pamr import _OFFSETS, pamr_affinity, pamr_propagate
from wseg_tpu.ops.pamr_pallas import (
    _dy_groups,
    _taps,
    pamr_affinity_pallas,
    pamr_propagate_pallas,
)

DILATIONS = (1, 2, 4, 8, 12, 24)


# ------------------------------------------------------------------ fold
def _propagate_kernel_fold(mask_ref, aff_ref, out_ref, mpad_ref, acc_ref,
                           *, groups, pad, h, w, num_iter, nb, c,
                           store_dtype):
    """All Jacobi iterations for a block of ``nb`` batch items at once.

    mask_ref: (nb, C, H, W); aff_ref: (nb, T, H, W); scratches carry the
    batch dim so each roll moves nb items' planes in one op.
    """
    hp = h + 2 * pad
    wp = w + 2 * pad

    def write_padded(src):
        # src (nb, C, H, W) -> mpad with edge replication
        mpad_ref[:, :, pad:pad + h, pad:pad + w] = src.astype(store_dtype)
        top = mpad_ref[:, :, pad:pad + 1, pad:pad + w]
        bot = mpad_ref[:, :, pad + h - 1:pad + h, pad:pad + w]
        mpad_ref[:, :, :pad, pad:pad + w] = jnp.broadcast_to(
            top, (nb, c, pad, w))
        mpad_ref[:, :, pad + h:, pad:pad + w] = jnp.broadcast_to(
            bot, (nb, c, pad, w))
        left = mpad_ref[:, :, :, pad:pad + 1]
        mpad_ref[:, :, :, :pad] = jnp.broadcast_to(left, (nb, c, hp, pad))
        right = mpad_ref[:, :, :, pad + w - 1:pad + w]
        mpad_ref[:, :, :, pad + w:] = jnp.broadcast_to(
            right, (nb, c, hp, pad))

    write_padded(mask_ref[...])

    def one_iter(_, carry):
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)
        for dy, group in groups:
            r = pltpu.roll(mpad_ref[...], (hp - (pad + dy)) % hp,
                           2)[:, :, :h, :]
            for t, dx in group:
                win = pltpu.roll(r, (wp - (pad + dx)) % wp, 3)[:, :, :, :w]
                acc_ref[...] += (aff_ref[:, t][:, None, :, :]
                                 * win.astype(jnp.float32))
        write_padded(acc_ref[...])
        return carry

    jax.lax.fori_loop(0, num_iter, one_iter, 0)
    out_ref[...] = mpad_ref[:, :, pad:pad + h,
                            pad:pad + w].astype(jnp.float32)


def propagate_fold(aff, mask, dilations=DILATIONS, num_iter=10,
                   block_b=None, store_dtype=jnp.float32):
    taps = _taps(tuple(dilations))
    pad = max(dilations)
    b, h, w, cc = mask.shape
    t = aff.shape[-1]
    groups = _dy_groups(taps)
    nb = b if block_b is None else block_b
    assert b % nb == 0

    mask_chw = jnp.transpose(mask.astype(jnp.float32), (0, 3, 1, 2))
    aff_thw = jnp.transpose(aff.astype(jnp.float32), (0, 3, 1, 2))

    kernel = functools.partial(
        _propagate_kernel_fold, groups=groups, pad=pad, h=h, w=w,
        num_iter=num_iter, nb=nb, c=cc, store_dtype=store_dtype)

    out = pl.pallas_call(
        kernel,
        grid=(b // nb,),
        in_specs=[
            pl.BlockSpec((nb, cc, h, w), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, t, h, w), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, cc, h, w), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, cc, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nb, cc, h + 2 * pad, w + 2 * pad), store_dtype),
            pltpu.VMEM((nb, cc, h, w), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(mask_chw, aff_thw)
    return jnp.transpose(out, (0, 2, 3, 1))


# --------------------------------------------------------------- dxfirst
def _dx_groups(taps):
    """Group tap indices by their column offset: [(dx, [(t, dy), ...])]."""
    groups = {}
    for t, (dy, dx) in enumerate(taps):
        groups.setdefault(dx, []).append((t, dy))
    return sorted(groups.items())


def _propagate_kernel_dxfirst(mask_ref, aff_ref, out_ref, mpad_ref,
                              acc_ref, *, groups, pad, h, w, num_iter,
                              nb, c, store_dtype):
    """Group taps by dx: 13 LANE rolls + 48 sublane rolls per iteration
    (the baseline does the reverse: 13 sublane + 48 lane).  Lane rotates
    are cross-vreg shuffles; if they dominate, this is ~3.7x fewer."""
    hp = h + 2 * pad
    wp = w + 2 * pad

    def write_padded(src):
        mpad_ref[:, :, pad:pad + h, pad:pad + w] = src.astype(store_dtype)
        top = mpad_ref[:, :, pad:pad + 1, pad:pad + w]
        bot = mpad_ref[:, :, pad + h - 1:pad + h, pad:pad + w]
        mpad_ref[:, :, :pad, pad:pad + w] = jnp.broadcast_to(
            top, (nb, c, pad, w))
        mpad_ref[:, :, pad + h:, pad:pad + w] = jnp.broadcast_to(
            bot, (nb, c, pad, w))
        left = mpad_ref[:, :, :, pad:pad + 1]
        mpad_ref[:, :, :, :pad] = jnp.broadcast_to(left, (nb, c, hp, pad))
        right = mpad_ref[:, :, :, pad + w - 1:pad + w]
        mpad_ref[:, :, :, pad + w:] = jnp.broadcast_to(
            right, (nb, c, hp, pad))

    write_padded(mask_ref[...])

    def one_iter(_, carry):
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)
        for dx, group in groups:
            # ONE lane roll per distinct column offset (13 total)
            rx = pltpu.roll(mpad_ref[...], (wp - (pad + dx)) % wp,
                            3)[:, :, :, :w]
            for t, dy in group:
                win = pltpu.roll(rx, (hp - (pad + dy)) % hp,
                                 2)[:, :, :h, :]
                acc_ref[...] += (aff_ref[:, t][:, None, :, :]
                                 * win.astype(jnp.float32))
        write_padded(acc_ref[...])
        return carry

    jax.lax.fori_loop(0, num_iter, one_iter, 0)
    out_ref[...] = mpad_ref[:, :, pad:pad + h,
                            pad:pad + w].astype(jnp.float32)


def propagate_dxfirst(aff, mask, dilations=DILATIONS, num_iter=10,
                      block_b=None, store_dtype=jnp.float32):
    taps = _taps(tuple(dilations))
    pad = max(dilations)
    b, h, w, cc = mask.shape
    t = aff.shape[-1]
    groups = _dx_groups(taps)
    nb = b if block_b is None else block_b
    assert b % nb == 0

    mask_chw = jnp.transpose(mask.astype(jnp.float32), (0, 3, 1, 2))
    aff_thw = jnp.transpose(aff.astype(jnp.float32), (0, 3, 1, 2))

    kernel = functools.partial(
        _propagate_kernel_dxfirst, groups=groups, pad=pad, h=h, w=w,
        num_iter=num_iter, nb=nb, c=cc, store_dtype=store_dtype)

    out = pl.pallas_call(
        kernel,
        grid=(b // nb,),
        in_specs=[
            pl.BlockSpec((nb, cc, h, w), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, t, h, w), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, cc, h, w), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, cc, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nb, cc, h + 2 * pad, w + 2 * pad), store_dtype),
            pltpu.VMEM((nb, cc, h, w), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(mask_chw, aff_thw)
    return jnp.transpose(out, (0, 2, 3, 1))


# ------------------------------------------------------------------- mxu
def _make_selectors(groups, pad, w, wp):
    """One (Wp, G*128) 0/1 selector per dy group: column j of window g
    gathers padded column g_dx + pad + j; windows at 128-aligned offsets."""
    sels = []
    for dy, group in groups:
        g = len(group)
        s = np.zeros((wp, g * 128), np.float32)
        for gi, (t, dx) in enumerate(group):
            for j in range(w):
                s[pad + dx + j, gi * 128 + j] = 1.0
        sels.append(s)
    return sels


def _propagate_kernel_mxu(mask_ref, aff_ref, sel_ref, out_ref, mpad_ref,
                          acc_ref, *, groups, pad, h, w, num_iter, nb, c,
                          sel_offs, precision):
    hp = h + 2 * pad
    wp = w + 2 * pad

    def write_padded(src):
        mpad_ref[:, :, pad:pad + h, pad:pad + w] = src
        top = mpad_ref[:, :, pad:pad + 1, pad:pad + w]
        bot = mpad_ref[:, :, pad + h - 1:pad + h, pad:pad + w]
        mpad_ref[:, :, :pad, pad:pad + w] = jnp.broadcast_to(
            top, (nb, c, pad, w))
        mpad_ref[:, :, pad + h:, pad:pad + w] = jnp.broadcast_to(
            bot, (nb, c, pad, w))
        left = mpad_ref[:, :, :, pad:pad + 1]
        mpad_ref[:, :, :, :pad] = jnp.broadcast_to(left, (nb, c, hp, pad))
        right = mpad_ref[:, :, :, pad + w - 1:pad + w]
        mpad_ref[:, :, :, pad + w:] = jnp.broadcast_to(
            right, (nb, c, hp, pad))

    write_padded(mask_ref[...])

    def one_iter(_, carry):
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)
        for gi, (dy, group) in enumerate(groups):
            r = pltpu.roll(mpad_ref[...], (hp - (pad + dy)) % hp,
                           2)[:, :, :h, :]           # (nb, C, H, Wp)
            flat = r.reshape(nb * c * h, wp)
            g = len(group)
            sel = sel_ref[pl.ds(sel_offs[gi], wp), :g * 128]
            wins = jax.lax.dot_general(
                flat, sel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision).reshape(nb, c, h, g * 128)
            for k, (t, dx) in enumerate(group):
                acc_ref[...] += (aff_ref[:, t][:, None, :, :]
                                 * wins[:, :, :, k * 128:k * 128 + w])
        write_padded(acc_ref[...])
        return carry

    jax.lax.fori_loop(0, num_iter, one_iter, 0)
    out_ref[...] = mpad_ref[:, :, pad:pad + h, pad:pad + w]


def propagate_mxu(aff, mask, dilations=DILATIONS, num_iter=10,
                  block_b=None, precision=jax.lax.Precision.HIGHEST):
    taps = _taps(tuple(dilations))
    pad = max(dilations)
    b, h, w, cc = mask.shape
    t = aff.shape[-1]
    groups = _dy_groups(taps)
    nb = b if block_b is None else block_b
    wp = w + 2 * pad

    sels = _make_selectors(groups, pad, w, wp)
    max_n = max(s.shape[1] for s in sels)
    sel_offs = []
    off = 0
    for s in sels:
        sel_offs.append(off)
        off += wp
    sel_stack = np.zeros((off, max_n), np.float32)
    o = 0
    for s in sels:
        sel_stack[o:o + wp, :s.shape[1]] = s
        o += wp

    mask_chw = jnp.transpose(mask.astype(jnp.float32), (0, 3, 1, 2))
    aff_thw = jnp.transpose(aff.astype(jnp.float32), (0, 3, 1, 2))

    kernel = functools.partial(
        _propagate_kernel_mxu, groups=groups, pad=pad, h=h, w=w,
        num_iter=num_iter, nb=nb, c=cc, sel_offs=tuple(sel_offs),
        precision=precision)

    out = pl.pallas_call(
        kernel,
        grid=(b // nb,),
        in_specs=[
            pl.BlockSpec((nb, cc, h, w), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, t, h, w), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sel_stack.shape[0], sel_stack.shape[1]),
                         lambda bi: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, cc, h, w), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, cc, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nb, cc, h + 2 * pad, wp), jnp.float32),
            pltpu.VMEM((nb, cc, h, w), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(mask_chw, aff_thw, jnp.asarray(sel_stack))
    return jnp.transpose(out, (0, 2, 3, 1))


# ------------------------------------------------------------------ bench
def _time(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        r = fn(*args)
    float(jnp.sum(r))  # force completion through the relay
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    float(jnp.sum(r))
    return (time.perf_counter() - t0) / n * 1e3


def _time_chained(prop_fn, aff, mask, k=10, n=5, warmup=2):
    """Device-true timing: chain ``k`` propagate calls inside ONE jit so
    the device executes them back-to-back regardless of host dispatch
    rate (on a relayed backend, per-dispatch HTTP cost can exceed the
    kernel time and a dispatch-per-call loop measures the host, not the
    chip)."""
    @jax.jit
    def chained(a, m):
        def body(i, mm):
            return prop_fn(a, mm)
        return jax.lax.fori_loop(0, k, body, m)

    for _ in range(warmup):
        r = chained(aff, mask)
    float(jnp.sum(r))
    t0 = time.perf_counter()
    for _ in range(n):
        r = chained(aff, mask)
    float(jnp.sum(r))
    return (time.perf_counter() - t0) / (n * k) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="8,96,96,21")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    b, h, w, c = map(int, args.shape.split(","))
    ni = args.iters

    key = jax.random.PRNGKey(0)
    im = jax.random.uniform(key, (b, h, w, 3), jnp.float32)
    mask = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(1), (b, h, w, c)), axis=-1)

    aff_fn = jax.jit(pamr_affinity_pallas)
    aff = aff_fn(im)
    ref = jax.jit(functools.partial(pamr_propagate, num_iter=ni))(
        jax.device_put(aff), mask)
    ref.block_until_ready()
    refn = np.asarray(ref)

    rows = []

    def bench(name, fn, *a, ref_override=None, chain=None):
        try:
            out = fn(*a)
            err = float(jnp.max(jnp.abs(
                out - (refn if ref_override is None else ref_override))))
            print(f"  {name}: max|err| = {err:.3e}")
            ms = _time(fn, *a, n=args.reps)
            cms = (_time_chained(chain, *a) if chain is not None
                   else float("nan"))
            rows.append((name, ms, cms, err))
            print(f"  {name}: {ms:.2f} ms dispatch-paced, "
                  f"{cms:.2f} ms chained")
        except Exception as e:  # noqa: BLE001 - lab tool, report and move on
            print(f"  {name}: FAILED {type(e).__name__}: {str(e)[:200]}")

    print(f"shape=({b},{h},{w},{c}) x {ni} iters")
    print("== affinity ==")
    aff_ref = np.asarray(aff)
    bench("aff_pallas", jax.jit(pamr_affinity_pallas), im,
          ref_override=aff_ref)
    bench("aff_lax", jax.jit(pamr_affinity), im, ref_override=aff_ref)

    print("== propagate ==")
    variants = [
        ("baseline(grid=B)",
         functools.partial(pamr_propagate_pallas, num_iter=ni)),
        ("fold(nb=4)",
         functools.partial(propagate_fold, num_iter=ni, block_b=4)),
        ("fold_bf16(nb=4)",
         functools.partial(propagate_fold, num_iter=ni, block_b=4,
                           store_dtype=jnp.bfloat16)),
        ("dxfirst(nb=1)",
         functools.partial(propagate_dxfirst, num_iter=ni, block_b=1)),
        ("dxfirst(nb=4)",
         functools.partial(propagate_dxfirst, num_iter=ni, block_b=4)),
        ("dxfirst_bf16(nb=4)",
         functools.partial(propagate_dxfirst, num_iter=ni, block_b=4,
                           store_dtype=jnp.bfloat16)),
        ("mxu(nb=2,highest)",
         functools.partial(propagate_mxu, num_iter=ni, block_b=2,
                           precision=jax.lax.Precision.HIGHEST)),
        ("mxu(nb=2,default)",
         functools.partial(propagate_mxu, num_iter=ni, block_b=2,
                           precision=jax.lax.Precision.DEFAULT)),
        ("lax", functools.partial(pamr_propagate, num_iter=ni)),
    ]
    for name, fn in variants:
        bench(name, jax.jit(fn), aff, mask, chain=fn)

    print("\nname dispatch_ms chained_ms err")
    for name, ms, cms, err in sorted(rows, key=lambda r: r[2]):
        print(f"{name:24s} {ms:8.2f} {cms:8.2f} {err:.2e}")


if __name__ == "__main__":
    main()
    # the relayed TPU backend leaves non-daemon service threads running
    import os
    os._exit(0)
