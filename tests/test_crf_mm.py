"""Multi-hot matmul CRF (ops/crf_mm.py) vs the native C++ oracle.

Interpret mode on CPU; small geometry keeps the emulated kernels fast.
The mm path carries the barycentric weights as bf16 in the multi-hot
(2^-17 relative), so tolerances are ~1e-4 relative rather than the
strict-f32 path's 2e-5 (tests/test_crf_lattice.py) — argmax parity with
the oracle is asserted exactly.
"""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from wseg_tpu.ops import crf_native
from wseg_tpu.ops.crf_mm import (
    build_mm_lattice,
    crf_inference_mm,
    gen_oh,
    mm_filter,
    pack3,
    tile_perm,
)
from wseg_tpu.ops.crf_lattice import bilateral_features, gaussian_features


def _scene(h=40, w=56, c=6, seed=0):
    rng = np.random.RandomState(seed)
    img = np.zeros((h, w, 3), np.uint8)
    for i, col in enumerate([[200, 60, 40], [30, 90, 190],
                             [60, 180, 70], [230, 220, 90]]):
        img[(h // 4) * i:(h // 4) * (i + 1)] = col
    img = np.clip(img.astype(np.int32) +
                  rng.randint(-15, 15, img.shape), 0, 255).astype(np.uint8)
    logits = rng.rand(h, w, c).astype(np.float32)
    for i in range(4):
        logits[(h // 4) * i:(h // 4) * (i + 1), :, i + 1] += 2.0
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return img, (e / e.sum(-1, keepdims=True)).astype(np.float32)


@pytest.mark.parametrize("d", [2, 5])
def test_mm_filter_matches_native(d):
    rng = np.random.RandomState(d)
    N, C = 640, 5
    feats = rng.rand(N, d).astype(np.float32) * 6.0
    vals = rng.rand(N, C).astype(np.float32) + 0.1
    want = crf_native.permutohedral_filter(feats, vals)
    mm = build_mm_lattice(feats, K=64, R0=128, Km=64,
                          blk_quantum=16)
    with pltpu.force_tpu_interpret_mode():
        oh = gen_oh(mm)
        got = np.asarray(mm_filter(pack3(jnp.asarray(vals)), mm, oh, C))
    np.testing.assert_allclose(got[:N], want, rtol=3e-4, atol=3e-4)


def test_mm_filter_padded_canvas():
    """valid_mask embedding: padded rows stay inert and output zero."""
    rng = np.random.RandomState(0)
    N, Np, C, d = 500, 640, 4, 2
    feats = rng.rand(N, d).astype(np.float32) * 5.0
    mask = np.zeros(Np, bool)
    mask[np.sort(rng.choice(Np, N, replace=False))] = True
    vals_n = rng.rand(N, C).astype(np.float32)
    vals_p = np.zeros((Np, C), np.float32)
    vals_p[mask] = vals_n
    want = crf_native.permutohedral_filter(feats, vals_n)
    mm = build_mm_lattice(feats, n_pix=Np, valid_mask=mask, K=64,
                          R0=128, Km=64, blk_quantum=16)
    with pltpu.force_tpu_interpret_mode():
        oh = gen_oh(mm)
        got = np.asarray(mm_filter(pack3(jnp.asarray(vals_p)), mm, oh, C))
    np.testing.assert_allclose(got[:Np][mask], want, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(got[:Np][~mask], 0.0, atol=1e-6)


@pytest.mark.parametrize("use_perm", [False, True])
def test_crf_inference_mm_matches_native(use_perm):
    img, probs = _scene()
    h, w, c = probs.shape
    perm = tile_perm(h, w, 8) if use_perm else None
    want = crf_native.crf_inference_native(img, probs, t=5)
    mm_b = build_mm_lattice(bilateral_features(img, 80.0, 13.0), K=64,
                            R0=128, Km=64, blk_quantum=16, perm=perm)
    mm_g = build_mm_lattice(gaussian_features((h, w), 3.0), K=64,
                            R0=128, Km=64, blk_quantum=16, perm=perm)
    with pltpu.force_tpu_interpret_mode():
        oh_b, oh_g = gen_oh(mm_b), gen_oh(mm_g)
        got = np.asarray(crf_inference_mm(
            jnp.asarray(probs), mm_g, mm_b, oh_g, oh_b, t=5))
    assert np.mean(np.argmax(got, -1) != np.argmax(want, -1)) == 0.0
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=2e-4)
