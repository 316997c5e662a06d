"""jit-vs-eager parity (SURVEY §4): the same program traced under jax.jit
must produce the same numbers as eager execution."""

import jax
import jax.numpy as jnp
import numpy as np

from wseg_tpu.config import cfg, reset_cfg
from wseg_tpu.models import get_model
from wseg_tpu.ops.pamr import pamr


def _model_outputs(jit: bool, model_name: str):
    reset_cfg()
    cfg.NET.MODEL = model_name
    cfg.NET.BACKBONE = "vgg16"
    cfg.NET.PAMR_KERNEL = [1, 2]
    cfg.NET.PAMR_ITER = 2
    model = get_model(cfg.NET, num_classes=21)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 48, 48, 3))
    labels = jnp.zeros((2, 20)).at[:, 3].set(1.0)

    def init_fn(r, im):
        return model.init({"params": r, "dropout": r, "sg": r},
                          im, im, labels, train=True)

    variables = jax.jit(init_fn)(rng, x)

    def apply_fn(v, im):
        out = model.apply(v, im, im, labels, train=False)
        return out.cls, out.masks

    fn = jax.jit(apply_fn) if jit else apply_fn
    cls, masks = fn(variables, x)
    return np.asarray(cls), np.asarray(masks)


def test_jit_eager_parity_cam():
    cls_j, masks_j = _model_outputs(True, "bsl")
    cls_e, masks_e = _model_outputs(False, "bsl")
    np.testing.assert_allclose(cls_j, cls_e, atol=1e-5)
    # CAM masks are max-normalised per class; at random init the per-class
    # max is tiny, so benign fp reassociation between the fused (jit) and
    # eager programs is amplified -- tolerance reflects conditioning, not
    # a semantic difference
    np.testing.assert_allclose(masks_j, masks_e, atol=2e-2)


def test_jit_eager_parity_ae():
    cls_j, masks_j = _model_outputs(True, "ae")
    cls_e, masks_e = _model_outputs(False, "ae")
    # ~20 conv layers of fp32 reassociation between the fused and eager
    # programs accumulate to ~1e-3 on the logits; anything beyond that
    # would indicate a trace-time semantic divergence
    np.testing.assert_allclose(cls_j, cls_e, atol=5e-3)
    np.testing.assert_allclose(masks_j, masks_e, atol=5e-3)


def test_jit_eager_parity_pamr():
    rng = np.random.RandomState(0)
    im = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
    mask = jnp.asarray(rng.rand(1, 32, 32, 21), jnp.float32)

    def run(fn):
        return np.asarray(fn(im, mask, (1, 2, 4), 3, "lax"))

    eager = run(pamr)
    jitted = run(jax.jit(pamr, static_argnums=(2, 3, 4)))
    np.testing.assert_allclose(jitted, eager, atol=1e-5)
