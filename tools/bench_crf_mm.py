#!/usr/bin/env python
"""Bench the multi-hot matmul exact CRF (ops/crf_mm.py) at production
geometry on the TPU: host table build, device oh-gen, device mean-field
ms/img, and argmax fidelity vs the native C++ oracle."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import wseg_tpu  # noqa: F401  (compile cache)
import jax
import jax.numpy as jnp

from tools.bench_crf_lattice import scene
from wseg_tpu.ops import crf_native
from wseg_tpu.ops.crf_lattice import bilateral_features, gaussian_features
from wseg_tpu.ops.crf_mm import (build_mm_lattice, crf_inference_mm,
                                 gen_oh, tile_perm)


def main():
    H, W, C, T = (int(os.environ.get("CRF_H", 384)),
                  int(os.environ.get("CRF_W", 512)),
                  int(os.environ.get("CRF_C", 21)),
                  int(os.environ.get("CRF_T", 10)))
    img, probs = scene(H, W, C)
    tile = int(os.environ.get("CRF_TILE", 32))
    perm = None if os.environ.get("CRF_PERM", "1") == "0" \
        else tile_perm(H, W, tile)
    from wseg_tpu.ops import crf_mm as _mm
    geom = dict(K=int(os.environ.get("CRF_K", _mm.DEF_K)),
                R0=int(os.environ.get("CRF_R0", _mm.DEF_R0)),
                Km=int(os.environ.get("CRF_KM", _mm.DEF_KM)))
    print("geom:", geom, "tile:", tile, flush=True)

    t0 = time.perf_counter()
    mm_b = build_mm_lattice(bilateral_features(img, 80.0, 13.0),
                            perm=perm, **geom)
    t_b = time.perf_counter() - t0
    t0 = time.perf_counter()
    mm_g = build_mm_lattice(gaussian_features((H, W), 3.0), perm=perm,
                            **geom)
    t_g = time.perf_counter() - t0
    t0 = time.perf_counter()
    # the relay pays ~130 ms per transferred array (tree device_put
    # measured 38 s, async per-leaf puts 7.9 s): pack the ~60 table
    # leaves into TWO buffers and rebuild on device with static slices
    from wseg_tpu.ops.crf_mm import pack_lattices, unpack_lattices
    bu, bi, spec = pack_lattices((mm_b, mm_g))
    mm_b, mm_g = jax.jit(unpack_lattices, static_argnums=(2,))(
        jnp.asarray(bu), jnp.asarray(bi), spec)
    float(jnp.asarray(mm_b.pix.blk_lo).sum())  # relay: force completion
    t_put = time.perf_counter() - t0
    print("table upload (packed): %.0f ms" % (t_put * 1e3), flush=True)
    Bb = mm_b.pix.blk_c.shape[0]
    Bg = mm_g.pix.blk_c.shape[0]
    print("host build: bilateral %.0f ms (m_lat %d, B %d, blurB %s), "
          "gaussian %.0f ms (m_lat %d, B %d)"
          % (t_b * 1e3, mm_b.m_lat, Bb,
             [s.blk_c.shape[0] for s in mm_b.blur], t_g * 1e3,
             mm_g.m_lat, Bg), flush=True)

    planes = int(os.environ.get("CRF_PLANES", "2"))
    gen = jax.jit(lambda b, g: (gen_oh(b, planes), gen_oh(g, planes)))
    run = jax.jit(lambda p, mg, mb, og, ob: crf_inference_mm(
        p, mg, mb, og, ob, t=T))

    print("compiling ohgen...", flush=True)
    oh_b, oh_g = gen(mm_b, mm_g)
    float(oh_b.pix[0].sum())
    t0 = time.perf_counter()
    oh_b, oh_g = gen(mm_b, mm_g)
    float(oh_b.pix[0].sum())
    t_oh = time.perf_counter() - t0
    print("oh gen: %.1f ms" % (t_oh * 1e3), flush=True)

    jp = jnp.asarray(probs)
    print("compiling mean-field...", flush=True)
    out = run(jp, mm_g, mm_b, oh_g, oh_b)
    float(out.sum())
    t0 = time.perf_counter()
    out = run(jp, mm_g, mm_b, oh_g, oh_b)
    s = float(out.sum())
    dt = time.perf_counter() - t0
    print("device mm CRF (t=%d): %.1f ms/img  (checksum %.3f)"
          % (T, dt * 1e3, s), flush=True)

    if os.environ.get("CRF_CHECK", "1") == "1":
        want = crf_native.crf_inference_native(img, probs, t=T)
        got = np.asarray(out)
        dis = float(np.mean(np.argmax(got, -1) != np.argmax(want, -1)))
        err = float(np.abs(got - want).max())
        print("vs native: argmax disagreement %.4f%%, max |dQ| %.2e"
              % (dis * 100.0, err), flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
