#!/usr/bin/env python
"""Microbench II: scatter/gather formulation shootout for the exact
device permutohedral CRF (VERDICT r4 task 1).

bench_scatter.py established the naive XLA formulation at the 384x512
production canvas: splat 17.9 ms + blur 7.9 ms + slice 6.0 ms per
bilateral application = ~320 ms/img for t=10 — 10x over the ~30 ms/img
budget.  This probes which reformulations buy that 10x:

  splat:  f32 baseline / bf16 / one fused scatter / segment_sum over
          host-sorted destinations / padded-fan-in CSR gather
  gather: f32 / bf16 / C=128 rows (padding probe) / iota indices
          (locality upper bound)

All loops run INSIDE one jitted program (relay RTT ~60 ms).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import wseg_tpu  # noqa: F401  (compile cache)
import jax
import jax.numpy as jnp
from functools import partial

H, W, C = 384, 512, 21
N = H * W
K = 6
M = int(N * 0.6)
ITERS = 10


def timed(fn, *args, iters=ITERS):
    out = fn(*args, iters)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    out = fn(*args, iters)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    idx = rng.randint(0, M, (N, K)).astype(np.int32)
    wts = rng.rand(N, K).astype(np.float32)
    vals = rng.rand(N, C).astype(np.float32)

    # host-side prep shared by the sorted variants (fixed per image)
    flat_idx = idx.reshape(-1)
    order = np.argsort(flat_idx, kind="stable").astype(np.int32)
    sorted_dst = flat_idx[order]
    src_pix = (np.arange(N * K, dtype=np.int32) // K)[order]
    src_w = wts.reshape(-1)[order]

    j_idx = jnp.asarray(idx)
    j_wts = jnp.asarray(wts)
    j_vals = jnp.asarray(vals)
    j_order_pix = jnp.asarray(src_pix)
    j_sorted_dst = jnp.asarray(sorted_dst)
    j_src_w = jnp.asarray(src_w)

    @partial(jax.jit, static_argnames="iters")
    def splat_f32(idx, wts, vals, iters):
        def body(i, acc):
            v = vals + i * 1e-9
            lat = jnp.zeros((M + 1, C), jnp.float32)
            for r in range(K):
                lat = lat.at[idx[:, r]].add(wts[:, r, None] * v)
            return acc + lat[:M]
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((M, C)))

    @partial(jax.jit, static_argnames="iters")
    def splat_bf16(idx, wts, vals, iters):
        wb = wts.astype(jnp.bfloat16)
        def body(i, acc):
            v = (vals + i * 1e-9).astype(jnp.bfloat16)
            lat = jnp.zeros((M + 1, C), jnp.bfloat16)
            for r in range(K):
                lat = lat.at[idx[:, r]].add(wb[:, r, None] * v)
            return acc + lat[:M].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((M, C)))

    @partial(jax.jit, static_argnames="iters")
    def splat_fused(idx, wts, vals, iters):
        fi = idx.reshape(-1)
        def body(i, acc):
            v = vals + i * 1e-9
            upd = (wts[:, :, None] * v[:, None, :]).reshape(-1, C)
            lat = jnp.zeros((M + 1, C), jnp.float32).at[fi].add(upd)
            return acc + lat[:M]
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((M, C)))

    @partial(jax.jit, static_argnames="iters")
    def splat_segsum(pix, dst, w, vals, iters):
        def body(i, acc):
            v = vals + i * 1e-9
            upd = w[:, None] * jnp.take(v, pix, axis=0)
            lat = jax.ops.segment_sum(upd, dst, num_segments=M + 1,
                                      indices_are_sorted=True)
            return acc + lat[:M]
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((M, C)))

    @partial(jax.jit, static_argnames="iters")
    def splat_sorted_scatter(pix, dst, w, vals, iters):
        def body(i, acc):
            v = vals + i * 1e-9
            upd = w[:, None] * jnp.take(v, pix, axis=0)
            lat = jnp.zeros((M + 1, C), jnp.float32).at[dst].add(
                upd, indices_are_sorted=True)
            return acc + lat[:M]
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((M, C)))

    print("splat  f32 6-scatter      : %7.2f ms" %
          timed(splat_f32, j_idx, j_wts, j_vals))
    print("splat  bf16 6-scatter     : %7.2f ms" %
          timed(splat_bf16, j_idx, j_wts, j_vals))
    print("splat  f32 1-fused-scatter: %7.2f ms" %
          timed(splat_fused, j_idx, j_wts, j_vals))
    print("splat  segment_sum sorted : %7.2f ms" %
          timed(splat_segsum, j_order_pix, j_sorted_dst, j_src_w, j_vals))
    print("splat  scatter sorted     : %7.2f ms" %
          timed(splat_sorted_scatter, j_order_pix, j_sorted_dst, j_src_w,
                j_vals))

    # ---- gather probes
    gidx = jnp.asarray(rng.randint(0, M, (N,)).astype(np.int32))
    giota = jnp.arange(N, dtype=jnp.int32) % M
    lat21 = jnp.asarray(rng.rand(M, C).astype(np.float32))
    lat128 = jnp.asarray(rng.rand(M, 128).astype(np.float32))

    @partial(jax.jit, static_argnames="iters")
    def gath(lat, gi, iters):
        def body(i, acc):
            return acc + jnp.take(lat + i * 1e-9, gi, axis=0)
        return jax.lax.fori_loop(0, iters, body,
                                 jnp.zeros((gi.shape[0], lat.shape[1])))

    @partial(jax.jit, static_argnames="iters")
    def gath_bf16(lat, gi, iters):
        lb = lat.astype(jnp.bfloat16)
        def body(i, acc):
            return acc + jnp.take(lb + jnp.bfloat16(i * 1e-9), gi,
                                  axis=0).astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body,
                                 jnp.zeros((gi.shape[0], lat.shape[1])))

    print("gather f32 C=21  random   : %7.2f ms" % timed(gath, lat21, gidx))
    print("gather bf16 C=21 random   : %7.2f ms" %
          timed(gath_bf16, lat21, gidx))
    print("gather f32 C=21  iota     : %7.2f ms" % timed(gath, lat21, giota))
    print("gather f32 C=128 random   : %7.2f ms" % timed(gath, lat128, gidx))
    os._exit(0)


if __name__ == "__main__":
    main()
