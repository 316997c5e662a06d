#!/usr/bin/env python
"""Microbench: TPU scatter-add / gather throughput at permutohedral-CRF
shapes (VERDICT r3 task 1 design probe).

The exact device CRF needs, per bilateral filter application at the
384x512 production canvas: a splat (6 scatter-adds of N=196k rows of 21
floats into an (M,21) lattice), 12 neighbour gathers of M rows (blur),
and a slice (6 gathers of N rows).  Whether XLA:TPU lowers scatter-add
to something bandwidth-shaped or to a serial loop decides the design.

Loops run INSIDE one program (fori_loop, perturbed input) — the relay
RTT (~60 ms) swamps anything shorter when dispatched per step.
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


def timed(fn, *args, iters=10):
    out = fn(*args, iters)
    float(jnp.sum(out))  # force completion through the relay
    t0 = time.perf_counter()
    out = fn(*args, iters)
    s = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / iters
    return dt, s


def main():
    H, W, C = 384, 512, 21
    N = H * W
    K = 6
    M = int(N * 0.6)
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, M, (N, K)).astype(np.int32))
    wts = jnp.asarray(rng.rand(N, K).astype(np.float32))
    vals = jnp.asarray(rng.rand(N, C).astype(np.float32))
    nbr = jnp.asarray(rng.randint(0, M, (K, M, 2)).astype(np.int32))

    @partial(jax.jit, static_argnames="iters")
    def splat(idx, wts, vals, iters):
        def body(i, acc):
            v = vals + i * 1e-9
            lat = jnp.zeros((M + 1, C), jnp.float32)
            for r in range(K):
                lat = lat.at[idx[:, r]].add(wts[:, r, None] * v)
            return acc + lat[:M]
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((M, C)))

    @partial(jax.jit, static_argnames="iters")
    def blur(nbr, vals0, iters):
        def body(i, lat):
            for j in range(K):
                lat = lat + 0.5 * (jnp.take(lat, nbr[j, :, 0], axis=0)
                                   + jnp.take(lat, nbr[j, :, 1], axis=0))
            return lat * 0.25
        return jax.lax.fori_loop(0, iters, body, vals0)

    @partial(jax.jit, static_argnames="iters")
    def slice_(idx, wts, lat, iters):
        def body(i, acc):
            l2 = lat + i * 1e-9
            out = jnp.zeros((N, C), jnp.float32)
            for r in range(K):
                out = out + wts[:, r, None] * jnp.take(l2, idx[:, r],
                                                       axis=0)
            return acc + out
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((N, C)))

    lat0 = jnp.asarray(rng.rand(M, C).astype(np.float32))

    dt, _ = timed(splat, idx, wts, vals)
    print("splat  (6 scatter-add of %dk rows -> (%dk,%d)): %.2f ms"
          % (N // 1000, M // 1000, C, dt * 1e3))
    dt, _ = timed(blur, nbr, lat0)
    print("blur   (12 gathers of %dk rows):                %.2f ms"
          % (M // 1000, dt * 1e3))
    dt, _ = timed(slice_, idx, wts, lat0)
    print("slice  (6 gathers of %dk rows):                 %.2f ms"
          % (N // 1000, dt * 1e3))
    os._exit(0)


if __name__ == "__main__":
    main()
