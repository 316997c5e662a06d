"""Native permutohedral dense CRF: build, filter correctness, inference."""

import numpy as np
import pytest

from wseg_tpu.ops.crf_native import (
    available,
    crf_inference_native,
    permutohedral_filter,
)

pytestmark = pytest.mark.skipif(not available(),
                                reason="native densecrf not built")


def _brute_gaussian_filter(features, values):
    """O(N^2) reference: out_i = sum_j exp(-|f_i-f_j|^2/2) v_j."""
    d2 = ((features[:, None, :] - features[None, :, :]) ** 2).sum(-1)
    k = np.exp(-0.5 * d2)
    return k @ values


def test_permutohedral_approximates_gaussian(rng_np):
    N, d, C = 300, 2, 4
    feats = rng_np.rand(N, d).astype(np.float32) * 6.0
    vals = rng_np.rand(N, C).astype(np.float32)
    got = permutohedral_filter(feats, vals)
    want = _brute_gaussian_filter(feats, vals)
    # the lattice is an approximation of the Gaussian; correlation must be
    # very high and scale close
    for c in range(C):
        corr = np.corrcoef(got[:, c], want[:, c])[0, 1]
        assert corr > 0.99, corr
    ratio = got.sum() / want.sum()
    assert 0.8 < ratio < 1.25, ratio


def test_permutohedral_5d(rng_np):
    N, d, C = 200, 5, 3
    feats = rng_np.rand(N, d).astype(np.float32) * 4.0
    vals = rng_np.rand(N, C).astype(np.float32)
    got = permutohedral_filter(feats, vals)
    want = _brute_gaussian_filter(feats, vals)
    corr = np.corrcoef(got.reshape(-1), want.reshape(-1))[0, 1]
    assert corr > 0.95, corr


def test_native_crf_sharpens(rng_np):
    H = W = 48
    img = np.zeros((H, W, 3), np.uint8)
    img[:, W // 2:] = 200
    probs = np.full((H, W, 2), 0.5, np.float32)
    probs[:, : W // 2, 0] = 0.7
    probs[:, : W // 2, 1] = 0.3
    probs[:, W // 2:, 0] = 0.45
    probs[:, W // 2:, 1] = 0.55
    out = crf_inference_native(img, probs, t=5, sxy_bilateral=20.0)
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-4)
    assert out[:, : W // 2, 0].mean() > 0.9
    assert out[:, W // 2:, 1].mean() > 0.9


def test_native_vs_approx_crf_agree(rng_np):
    """On structured inputs the exact (native) and sparse-tap (numpy) CRFs
    agree; on pure noise the exact one sharpens far more (stronger
    messages), so the comparison uses region-structured probabilities."""
    from wseg_tpu.ops.crf import crf_inference_np
    H = W = 40
    img = (rng_np.rand(H, W, 3) * 255).astype(np.uint8)
    img[:, : W // 2] //= 4
    probs = np.full((H, W, 5), 0.1, np.float32)
    probs[:, : W // 2, 0] = 0.6
    probs[:, W // 2:, 1] = 0.6
    probs /= probs.sum(-1, keepdims=True)
    a = crf_inference_native(img, probs, t=5)
    b = crf_inference_np(img, probs, t=5)
    agree = (np.argmax(a, -1) == np.argmax(b, -1)).mean()
    assert agree > 0.95, agree
