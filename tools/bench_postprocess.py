#!/usr/bin/env python
"""Device-time microbench of the slot-batched postprocess program
(threshold/argmax + device CRF) at the production merge-canvas shape.

Compares CRF variants (message stride / full stride / dtype / tap
density) without the full e2e harness.  Timing rule for the relayed
chip (CLAUDE.md): dispatch n back-to-back runs chained through a
checksum and fetch ONE scalar.

Usage: python tools/bench_postprocess.py [S H W]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    S, H, W = (int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 \
        else (8, 384, 512)
    C = 21
    rng = np.random.RandomState(0)
    sums = jnp.asarray(rng.rand(S, H, W, C), jnp.float32)
    labels = jnp.asarray((rng.rand(S, C - 1) > 0.7), jnp.float32)
    windows = jnp.tile(jnp.asarray([0, 0, H, W], jnp.int32), (S, 1))
    imgs = jnp.asarray(rng.randint(0, 256, (S, H, W, 3)), jnp.uint8)

    variants = {
        "no_crf": dict(crf_threshs=()),
        "bf16_s2 (r2 default)": dict(crf_stride=2),
        "bf16_s2_d4": dict(crf_stride=2, crf_tap_div=4.0),
        "bf16_fs2": dict(crf_full_stride=2),
        "bf16_fs2_r1": dict(crf_full_stride=2, crf_stride=2,
                            crf_refine_iters=1),
        "bf16_fs2_r2": dict(crf_full_stride=2, crf_stride=2,
                            crf_refine_iters=2),
        "bf16_fs2_d4": dict(crf_full_stride=2, crf_tap_div=4.0),
    }
    base = dict(n_views=8, bg_pow=3.0, threshs=(0.0, 0.1),
                crf_threshs=(0.0, 0.1), crf_iters=10)

    import functools

    from wseg_tpu.engine.infer import _postprocess_one

    # run the whole group postprocess n times INSIDE one program (input
    # perturbed per iteration so XLA cannot hoist the loop body): a
    # per-dispatch enqueue on the relay costs ~30 ms, which would swamp
    # sub-100ms programs if each repeat were its own dispatch
    @functools.partial(jax.jit, static_argnames=("n", "kw"))
    def rep(sums, labels, windows, imgs, *, n, kw):
        kwargs = dict(kw)

        def body(i, acc):
            s = sums + (1e-6 * i) * acc
            r = jax.vmap(lambda a, l, w, im: _postprocess_one(
                a, l, w, im, **kwargs))(s, labels, windows, imgs)
            return acc + jnp.sum(r.astype(jnp.float32)) * 1e-12

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    out = {}
    n = 10
    for name, kw in variants.items():
        args = tuple(sorted(dict(base, **kw).items()))
        float(rep(sums, labels, windows, imgs, n=1, kw=args))
        float(rep(sums, labels, windows, imgs, n=n, kw=args))  # compile
        t0 = time.perf_counter()
        float(rep(sums, labels, windows, imgs, n=n, kw=args))
        dt = (time.perf_counter() - t0) / n
        out[name] = round(dt / S * 1000.0, 2)
        print(f"{name}: {dt / S * 1000.0:.2f} ms/img "
              f"({dt * 1000.0:.1f} ms/group of {S})", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
    import os
    os._exit(0)
