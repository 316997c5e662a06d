"""Exact device permutohedral CRF vs the native C++ oracle."""

import numpy as np
import pytest

from wseg_tpu.ops import crf_native
from wseg_tpu.ops.crf_lattice import (LatticeTables, bilateral_features,
                                      build_tables_host, crf_inference_lattice,
                                      gaussian_features, gaussian_tables,
                                      lattice_filter, paste_window_tables)

pytestmark = pytest.mark.skipif(not crf_native.available(),
                                reason="native densecrf unavailable")


def _scene(h=40, w=56, c=6, seed=0):
    rng = np.random.RandomState(seed)
    img = np.zeros((h, w, 3), np.uint8)
    img[:, : w // 2] = [200, 60, 40]
    img[:, w // 2:] = [30, 90, 190]
    img = np.clip(img.astype(np.int32) +
                  rng.randint(-25, 25, img.shape), 0, 255).astype(np.uint8)
    logits = rng.rand(h, w, c).astype(np.float32) * 2.0
    logits[:, : w // 2, 1] += 2.0
    logits[:, w // 2:, 3] += 2.0
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return img, (e / e.sum(-1, keepdims=True)).astype(np.float32)


@pytest.mark.parametrize("d", [2, 5])
@pytest.mark.parametrize("sorted_splat", [False, True])
def test_lattice_filter_matches_native(d, sorted_splat):
    rng = np.random.RandomState(d)
    N, C = 700, 5
    feats = rng.rand(N, d).astype(np.float32) * 6.0
    vals = rng.randn(N, C).astype(np.float32)
    want = crf_native.permutohedral_filter(feats, vals)
    tabs = build_tables_host(feats, quantum=256,
                             sorted_splat=sorted_splat, chunk=512)
    got = np.asarray(lattice_filter(vals, tabs))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_gaussian_tables_cached_and_match():
    feats = gaussian_features((24, 32), 3.0)
    rng = np.random.RandomState(1)
    vals = rng.randn(24 * 32, 3).astype(np.float32)
    want = crf_native.permutohedral_filter(feats, vals)
    tabs = gaussian_tables((24, 32), 3.0)
    assert gaussian_tables((24, 32), 3.0) is tabs  # cache hit
    got = np.asarray(lattice_filter(vals, tabs))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("sorted_splat", [False, True])
def test_crf_inference_lattice_matches_native(sorted_splat):
    img, probs = _scene()
    h, w, c = probs.shape
    want = crf_native.crf_inference_native(img, probs, t=5)
    tabs_b = build_tables_host(
        bilateral_features(img, 80.0, 13.0), quantum=1024,
        sorted_splat=sorted_splat, chunk=512)
    tabs_g = gaussian_tables((h, w), 3.0)
    got = np.asarray(crf_inference_lattice(
        jnp_array(probs), tabs_g, tabs_b, t=5))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert np.mean(np.argmax(got, -1) != np.argmax(want, -1)) == 0.0


def test_window_paste_inert_padding():
    """Canvas pixels outside the image window must not perturb the
    window result, and their own output must stay harmless."""
    img, probs = _scene(h=30, w=40)
    h, w, c = probs.shape
    Hc, Wc = 48, 64
    y0, x0 = 5, 9

    tabs_b = build_tables_host(
        bilateral_features(img, 80.0, 13.0), quantum=1024)
    tabs_g = gaussian_tables((h, w), 3.0)
    want = np.asarray(crf_inference_lattice(
        jnp_array(probs), tabs_g, tabs_b, t=3))

    canvas = np.full((Hc, Wc, c), 0.3, np.float32)
    canvas[y0:y0 + h, x0:x0 + w] = probs
    tabs_bc = paste_window_tables(tabs_b, (y0, x0, h, w), (Hc, Wc),
                                  (h, w))
    tabs_gc = paste_window_tables(tabs_g, (y0, x0, h, w), (Hc, Wc),
                                  (h, w))
    got = np.asarray(crf_inference_lattice(
        jnp_array(canvas), tabs_gc, tabs_bc, t=3))
    np.testing.assert_allclose(got[y0:y0 + h, x0:x0 + w], want,
                               rtol=1e-4, atol=1e-4)
    assert np.all(np.isfinite(got))


def jnp_array(x):
    import jax.numpy as jnp
    return jnp.asarray(x)
