"""LR schedule factory tests (cos/poly/step + warmup)."""

import numpy as np

from wseg_tpu.utils.lr_scheduler import make_schedule


def test_cos_schedule():
    s = make_schedule("cos", 1.0, num_epochs=10, iters_per_epoch=10)
    assert abs(float(s(0)) - 1.0) < 1e-6
    assert float(s(100)) < 1e-6
    assert 0.4 < float(s(50)) < 0.6


def test_poly_schedule():
    s = make_schedule("poly", 1.0, num_epochs=10, iters_per_epoch=10)
    assert abs(float(s(0)) - 1.0) < 1e-6
    assert float(s(100)) == 0.0
    assert float(s(50)) < float(s(10))


def test_step_schedule():
    s = make_schedule("step", 1.0, num_epochs=30, iters_per_epoch=10,
                      lr_step=10)
    np.testing.assert_allclose(float(s(0)), 1.0)
    np.testing.assert_allclose(float(s(105)), 0.1, rtol=1e-5)
    np.testing.assert_allclose(float(s(205)), 0.01, rtol=1e-5)


def test_warmup():
    s = make_schedule("cos", 1.0, num_epochs=10, iters_per_epoch=10,
                      warmup_epochs=2)
    assert float(s(0)) == 0.0
    assert abs(float(s(10)) - 0.5) < 1e-6
    assert float(s(20)) > 0.9
