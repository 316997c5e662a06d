#!/usr/bin/env python
"""Drive + bench the exact device permutohedral CRF at production
geometry (384x512, C=21, t=10) on the TPU.

Prints device ms/img for the jitted exact mean-field program, host
table-build ms, and argmax agreement vs the native C++ oracle.
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

from wseg_tpu.ops import crf_native
from wseg_tpu.ops.crf_lattice import (bilateral_features,
                                      build_tables_host,
                                      crf_inference_lattice,
                                      gaussian_tables)


def scene(h, w, c, seed=0):
    rng = np.random.RandomState(seed)
    img = np.zeros((h, w, 3), np.uint8)
    # piecewise regions + texture noise (crf_fidelity-style)
    for i, col in enumerate([[200, 60, 40], [30, 90, 190], [60, 180, 70],
                             [230, 220, 90]]):
        img[(h // 4) * i:(h // 4) * (i + 1)] = col
    img[:, : w // 3] = np.maximum(img[:, : w // 3] // 2, 20)
    img = np.clip(img.astype(np.int32) +
                  rng.randint(-20, 20, img.shape), 0, 255).astype(np.uint8)
    logits = rng.rand(h, w, c).astype(np.float32)
    for i in range(4):
        logits[(h // 4) * i:(h // 4) * (i + 1), :, i + 1] += 2.5
    from scipy.ndimage import gaussian_filter
    logits = gaussian_filter(logits, (6, 6, 0))
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return img, (e / e.sum(-1, keepdims=True)).astype(np.float32)


def main():
    H, W, C, T = (int(os.environ.get("CRF_H", 384)),
                  int(os.environ.get("CRF_W", 512)),
                  int(os.environ.get("CRF_C", 21)),
                  int(os.environ.get("CRF_T", 10)))
    img, probs = scene(H, W, C)

    sorted_splat = os.environ.get("CRF_SORTED", "1") == "1"
    t0 = time.perf_counter()
    tabs_b = build_tables_host(bilateral_features(img, 80.0, 13.0),
                               sorted_splat=sorted_splat)
    t_build_b = time.perf_counter() - t0
    t0 = time.perf_counter()
    tabs_g = gaussian_tables((H, W), 3.0, sorted_splat=sorted_splat)
    t_build_g = time.perf_counter() - t0
    print("host build: bilateral %.1f ms (M=%d pad %d), gaussian %.1f ms "
          "(M=%d pad %d)" % (t_build_b * 1e3, int(tabs_b.n_valid),
                             tabs_b.m_pad, t_build_g * 1e3,
                             int(tabs_g.n_valid), tabs_g.m_pad))

    run = jax.jit(lambda p, tg, tb: crf_inference_lattice(
        p, tg, tb, t=T))
    jp = jnp.asarray(probs)
    print("compiling...", flush=True)
    out = run(jp, tabs_g, tabs_b)
    float(out.sum())
    t0 = time.perf_counter()
    out = run(jp, tabs_g, tabs_b)
    s = float(out.sum())
    dt = time.perf_counter() - t0
    print("device exact CRF (t=%d): %.1f ms/img  (checksum %.3f)"
          % (T, dt * 1e3, s))

    if os.environ.get("CRF_CHECK", "1") == "1":
        t0 = time.perf_counter()
        want = crf_native.crf_inference_native(img, probs, t=T)
        t_nat = time.perf_counter() - t0
        got = np.asarray(out)
        dis = float(np.mean(np.argmax(got, -1) != np.argmax(want, -1)))
        err = float(np.abs(got - want).max())
        print("native host CRF: %.1f ms; argmax disagreement %.4f%%, "
              "max |dQ| %.2e" % (t_nat * 1e3, dis * 100.0, err))
    os._exit(0)


if __name__ == "__main__":
    main()
