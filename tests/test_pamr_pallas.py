"""Pallas PAMR kernel vs the lax reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax


def test_pallas_matches_lax(monkeypatch, rng_np):
    from jax.experimental.pallas import tpu as pltpu

    from wseg_tpu.ops.pamr import pamr_affinity, pamr_propagate
    from wseg_tpu.ops.pamr_pallas import pamr_propagate_pallas

    dil = (1, 2, 4)
    im = rng_np.rand(2, 24, 24, 3).astype(np.float32)
    mask = rng_np.rand(2, 24, 24, 21).astype(np.float32)
    aff = pamr_affinity(im, dil)
    want = np.asarray(pamr_propagate(aff, mask, dil, num_iter=3))

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pamr_propagate_pallas(aff, mask, dil, num_iter=3))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pallas_nondivisible_height(rng_np):
    from jax.experimental.pallas import tpu as pltpu

    from wseg_tpu.ops.pamr import pamr_affinity, pamr_propagate
    from wseg_tpu.ops.pamr_pallas import pamr_propagate_pallas

    dil = (1, 2)
    im = rng_np.rand(1, 21, 17, 3).astype(np.float32)  # H not /8
    mask = rng_np.rand(1, 21, 17, 21).astype(np.float32)
    aff = pamr_affinity(im, dil)
    want = np.asarray(pamr_propagate(aff, mask, dil, num_iter=2))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pamr_propagate_pallas(aff, mask, dil, num_iter=2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pallas_affinity_matches_lax(rng_np):
    from jax.experimental.pallas import tpu as pltpu

    from wseg_tpu.ops.pamr import pamr_affinity
    from wseg_tpu.ops.pamr_pallas import pamr_affinity_pallas

    dil = (1, 2, 4)
    im = rng_np.rand(2, 24, 24, 3).astype(np.float32)
    want = np.asarray(pamr_affinity(im, dil))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pamr_affinity_pallas(im, dil))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)
