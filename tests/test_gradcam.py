"""Grad-CAM suite tests: shapes, ranges, and method disagreement."""

import numpy as np
import pytest

import jax

from wseg_tpu.config import cfg
from wseg_tpu.gradcam import CAM_METHODS, get_cam_method
from wseg_tpu.models import get_model


@pytest.fixture(scope="module")
def model_and_vars():
    from wseg_tpu.config import reset_cfg
    reset_cfg()
    cfg.NET.MODEL = "bsl"
    cfg.NET.BACKBONE = "vgg16"
    cfg.NET.DTYPE = "float32"
    model = get_model(cfg.NET, num_classes=21)
    rng = jax.random.PRNGKey(0)
    from wseg_tpu.engine.train_loop import init_test_variables
    variables = init_test_variables(model, rng, (1, 48, 48, 3))
    return model, variables


@pytest.mark.parametrize(
    "method", sorted(set(CAM_METHODS) - {"guidedbackprop"}))
def test_cam_shapes_and_range(model_and_vars, method, rng_np):
    model, variables = model_and_vars
    cam = get_cam_method(method)(model, variables)
    x = rng_np.randn(1, 48, 48, 3).astype(np.float32)
    out = cam(x, target_category=3)
    assert out.shape == (1, 48, 48)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0 + 1e-5


def test_guided_backprop(model_and_vars, rng_np):
    import jax.numpy as jnp
    from wseg_tpu.gradcam import GuidedBackprop
    model, variables = model_and_vars
    gb = GuidedBackprop(model, variables)
    x = rng_np.randn(1, 48, 48, 3).astype(np.float32)
    g = gb(x, target_category=3)
    assert g.shape == (1, 48, 48, 3)
    assert np.isfinite(g).all()

    # differs from the vanilla input gradient
    def score(img):
        out = model.apply(variables, img, train=False)
        return jnp.sum(out.cls[:, 3])
    vanilla = np.asarray(jax.grad(score)(jnp.asarray(x)))
    assert not np.allclose(g, vanilla)


def test_gradcam_differs_between_targets(model_and_vars, rng_np):
    model, variables = model_and_vars
    cam = get_cam_method("gradcam")(model, variables)
    x = rng_np.randn(1, 48, 48, 3).astype(np.float32)
    a = cam(x, target_category=0)
    b = cam(x, target_category=7)
    assert not np.allclose(a, b)


def test_eigen_smooth(model_and_vars, rng_np):
    model, variables = model_and_vars
    cam = get_cam_method("gradcam")(model, variables)
    x = rng_np.randn(1, 48, 48, 3).astype(np.float32)
    out = cam(x, target_category=1, eigen_smooth=True)
    assert out.shape == (1, 48, 48)
    assert np.isfinite(out).all()


def test_fullgrad(model_and_vars, rng_np):
    from wseg_tpu.gradcam.fullgrad import FullGrad
    model, variables = model_and_vars
    fg = FullGrad(model, variables)
    x = rng_np.randn(1, 48, 48, 3).astype(np.float32)
    out = fg(x, target_category=2)
    assert out.shape == (1, 48, 48)
    assert np.isfinite(out).all()
    assert 0.0 <= out.min() and out.max() <= 1.0 + 1e-5


def test_multi_layer_aggregation(model_and_vars, rng_np):
    """Multiple target layers -> mean of per-layer scaled CAMs
    (reference base_cam.py:129-137).  bsl's head only reads conv6, so a
    conv3 tap contributes a zero map there and the aggregate re-scales
    back to the single-layer CAM; ae consumes both taps, so its
    aggregate genuinely differs."""
    from wseg_tpu.gradcam import GradCAM
    model, variables = model_and_vars
    x = rng_np.randn(1, 48, 48, 3).astype(np.float32)
    single = GradCAM(model, variables, tap="conv6")(x, 3)
    multi = GradCAM(model, variables, tap=("conv3", "conv6"))(x, 3)
    assert multi.shape == single.shape
    assert np.all(multi >= -1e-6) and np.all(multi <= 1.0 + 1e-6)
    np.testing.assert_allclose(multi, single, atol=1e-5)

    from wseg_tpu.config import reset_cfg
    reset_cfg()
    cfg.NET.MODEL = "ae"
    cfg.NET.BACKBONE = "vgg16"
    cfg.NET.DTYPE = "float32"
    cfg.NET.PAMR_KERNEL = [1, 2]
    cfg.NET.PAMR_ITER = 2
    model2 = get_model(cfg.NET, num_classes=21)
    from wseg_tpu.engine.train_loop import init_test_variables
    vars2 = init_test_variables(model2, jax.random.PRNGKey(0),
                                (1, 48, 48, 3))
    s2 = GradCAM(model2, vars2, tap="conv6")(x, 3)
    m2 = GradCAM(model2, vars2, tap=("conv3", "conv6"))(x, 3)
    assert not np.allclose(m2, s2)


def test_guided_backprop_single_compile_all_classes(model_and_vars,
                                                    rng_np):
    """The target is TRACED (one-hot dot): one compiled backward serves
    every class — a static target would recompile the full model per
    class (20 WRN38-scale compiles on remote backends)."""
    from wseg_tpu.gradcam import GuidedBackprop
    model, variables = model_and_vars
    gb = GuidedBackprop(model, variables)
    x = rng_np.randn(1, 48, 48, 3).astype(np.float32)
    g0 = gb(x, target_category=0)
    n_compiles = gb._grad_jit._cache_size()
    g1 = gb(x, target_category=1)
    assert gb._grad_jit._cache_size() == n_compiles == 1
    assert not np.allclose(g0, g1)  # targets still select classes
