"""Pallas CRF kernels vs independent references (interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp


def _shift_zero(x, dy, dx):
    """numpy zero-fill shift of (B, H, W, C): out(p) = x(p + (dy, dx))."""
    b, h, w, c = x.shape
    out = np.zeros_like(x)
    ys = slice(max(0, dy), min(h, h + dy))
    yd = slice(max(0, -dy), min(h, h - dy))
    xs = slice(max(0, dx), min(w, w + dx))
    xd = slice(max(0, -dx), min(w, w - dx))
    out[:, yd, xd] = x[:, ys, xs]
    return out


def test_bilateral_message_matches_numpy(rng_np):
    from jax.experimental.pallas import tpu as pltpu

    from wseg_tpu.ops.crf_pallas import bilateral_message_pallas

    taps = [(dy, dx) for dy in (-3, 0, 2) for dx in (-2, 0, 3)
            if (dy, dx) != (0, 0)]
    q = rng_np.rand(2, 16, 24, 5).astype(np.float32)
    w = rng_np.rand(2, 16, 24, len(taps)).astype(np.float32)

    want = np.zeros_like(q)
    for k, (dy, dx) in enumerate(taps):
        want += w[..., k:k + 1].astype(np.float32) * _shift_zero(q, dy, dx)

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(bilateral_message_pallas(
            jnp.asarray(q), jnp.asarray(w), taps))
    # weights travel as bf16 inside the kernel
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)


def test_gauss_blur_matches_scipy(rng_np):
    from scipy.ndimage import correlate1d

    from jax.experimental.pallas import tpu as pltpu

    from wseg_tpu.ops.crf_pallas import gauss_blur_pallas

    r = 3
    x1d = np.arange(-r, r + 1, dtype=np.float32)
    k1d = np.exp(-x1d * x1d / (2.0 * 1.5 * 1.5))
    x = rng_np.rand(2, 16, 24, 4).astype(np.float32)
    want = correlate1d(x, k1d, axis=1, mode="constant")
    want = correlate1d(want, k1d, axis=2, mode="constant")

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(gauss_blur_pallas(jnp.asarray(x), k1d, r))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_crf_impl_pallas_matches_xla(rng_np):
    """Full mean-field CRF: impl='pallas' vs impl='xla', small shape."""
    from jax.experimental.pallas import tpu as pltpu

    from wseg_tpu.ops.crf import crf_inference_jax

    img = jnp.asarray((rng_np.rand(1, 24, 32, 3) * 255).astype(np.float32))
    probs = rng_np.rand(1, 24, 32, 6).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    probs = jnp.asarray(probs)

    kw = dict(t=3, sxy_bilateral=8.0, bilateral_stride=2)
    want = np.asarray(crf_inference_jax(img, probs, impl="xla", **kw))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(crf_inference_jax(img, probs, impl="pallas", **kw))
    assert float(np.abs(got - want).max()) < 5e-2
    assert (got.argmax(-1) == want.argmax(-1)).mean() > 0.98
