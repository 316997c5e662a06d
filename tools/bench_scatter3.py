#!/usr/bin/env python
"""Microbench III: pipelining + one-hot-matmul prototypes for the exact
device CRF v2 design.

bench_scatter2.py showed XLA row ops are per-row-cost bound, BUT the 6
independent slice gathers ran at 5.1 ns/row vs 17 ns/row for one big
gather — XLA pipelines independent ops.  Questions here:

  1. do independent scatter-adds into SEPARATE buffers pipeline too?
  2. how far does gather splitting pipeline (1 / 6 / 24-way)?
  3. what does the chunked one-hot matmul splat actually cost
     (scan over sorted chunks, guaranteed window < K)?
  4. what does a monotone-window matmul blur cost?
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import wseg_tpu  # noqa: F401
import jax
import jax.numpy as jnp

H, W, C = 384, 512, 21
N = H * W
K6 = 6
M = int(N * 0.25)  # closer to real-image lattice sizes
ITERS = 10


def timed(fn, *args, iters=ITERS):
    out = fn(*args, iters)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    out = fn(*args, iters)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    idx = rng.randint(0, M, (N, K6)).astype(np.int32)
    wts = rng.rand(N, K6).astype(np.float32)
    vals = rng.rand(N, C).astype(np.float32)
    j_idx, j_wts, j_vals = map(jnp.asarray, (idx, wts, vals))

    # -------- 1. parallel scatters into separate buffers
    @partial(jax.jit, static_argnames="iters")
    def splat_parallel(idx, wts, vals, iters):
        def body(i, acc):
            v = vals + i * 1e-9
            lats = [jnp.zeros((M + 1, C), jnp.float32)
                    .at[idx[:, r]].add(wts[:, r, None] * v)
                    for r in range(K6)]
            return acc + sum(lats)[:M]
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((M, C)))

    print("splat 6 scatters -> 6 bufs + sum : %7.2f ms" %
          timed(splat_parallel, j_idx, j_wts, j_vals))

    # -------- 2. gather splitting
    flat = idx.reshape(-1)
    lat0 = jnp.asarray(rng.rand(M, C).astype(np.float32))

    def mk_gather(n_split):
        parts = np.array_split(flat, n_split)
        parts = [jnp.asarray(p) for p in parts]

        @partial(jax.jit, static_argnames="iters")
        def g(lat, iters):
            def body(i, acc):
                l = lat + i * 1e-9
                return acc + sum(jnp.take(l, p, axis=0).sum()
                                 for p in parts)
            return jax.lax.fori_loop(0, iters, body, 0.0)
        return g

    for ns in (1, 6, 24):
        print("gather %7d rows split %2d-way : %7.2f ms" %
              (len(flat), ns, timed(mk_gather(ns), lat0)))

    # -------- 3. chunked one-hot matmul splat (sorted, window < K)
    order = np.argsort(flat, kind="stable")
    sdst = flat[order].astype(np.int32)
    spix = (np.arange(N * K6) // K6)[order].astype(np.int32)
    sw = wts.reshape(-1)[order].astype(np.float32)

    for K in (512, 1024, 2048):
        nc = (N * K6) // K
        R = K + 8
        lo = (sdst[::K][:nc] // 8 * 8).astype(np.int32)
        j_sdst = jnp.asarray(sdst[:nc * K].reshape(nc, K))
        j_spix = jnp.asarray(spix[:nc * K].reshape(nc, K))
        j_sw = jnp.asarray(sw[:nc * K].reshape(nc, K))
        j_lo = jnp.asarray(lo)

        @partial(jax.jit, static_argnames="iters")
        def splat_mm(dst, pix, w, lo, vals, iters):
            iot = jnp.arange(R, dtype=jnp.int32)

            def body(i, acc):
                v = (vals + i * 1e-9)

                def chunk(lat, args):
                    d, p, ww, l = args
                    upd = (ww[:, None] * jnp.take(v, p, axis=0)
                           ).astype(jnp.bfloat16)
                    oh = (d[:, None] - l == iot[None, :]
                          ).astype(jnp.bfloat16)
                    blk = jax.lax.dot_general(
                        oh, upd, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    cur = jax.lax.dynamic_slice(lat, (l, 0), (R, C))
                    return jax.lax.dynamic_update_slice(
                        lat, cur + blk, (l, 0)), None

                lat = jnp.zeros((M + R, C), jnp.float32)
                lat, _ = jax.lax.scan(chunk, lat, (dst, pix, w, lo))
                return acc + lat[:M]
            return jax.lax.fori_loop(0, iters, body, jnp.zeros((M, C)))

        print("splat one-hot matmul K=%4d      : %7.2f ms" %
              (K, timed(splat_mm, j_sdst, j_spix, j_sw, j_lo, j_vals)))

    # -------- 4. monotone-window matmul blur prototype
    # synth monotone neighbour map: n1 strictly increasing with gaps
    gaps = rng.rand(M) < 0.3
    n1 = np.cumsum(1 + gaps.astype(np.int64)) - 1
    n1 = np.minimum(n1, int(n1[-1])).astype(np.int32)
    Msrc = int(n1[-1]) + 1
    for K in (1024,):
        nc = M // K
        n1c = n1[:nc * K].reshape(nc, K)
        lo = (n1c[:, 0] // 8 * 8).astype(np.int32)
        spread = int((n1c[:, -1] - lo).max()) + 1
        R = -(-spread // 256) * 256
        j_n1 = jnp.asarray(n1c)
        j_lo2 = jnp.asarray(lo)
        latb = jnp.asarray(rng.rand(Msrc + R, C).astype(np.float32))

        @partial(jax.jit, static_argnames=("iters", "R"))
        def blur_mm(n1c, lo, lat, iters, R):
            iot = jnp.arange(R, dtype=jnp.int32)

            def body(i, acc):
                l = lat + i * 1e-9

                def chunk(args):
                    nn, llo = args
                    oh = (nn[:, None] - llo == iot[None, :]
                          ).astype(jnp.bfloat16)
                    src = jax.lax.dynamic_slice(
                        l, (llo, 0), (R, C)).astype(jnp.bfloat16)
                    return jax.lax.dot_general(
                        oh, src, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

                out = jax.lax.map(chunk, (n1c, lo))
                return acc + out.reshape(-1, C)
            return jax.lax.fori_loop(0, iters, body,
                                     jnp.zeros((nc * K, C)))

        print("blur one-hot matmul K=%4d R=%4d : %7.2f ms (12x/iter)" %
              (K, R, timed(blur_mm, j_n1, j_lo2, latb, R=R)))
    os._exit(0)


if __name__ == "__main__":
    main()
