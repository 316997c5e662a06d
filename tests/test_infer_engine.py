"""Inference engine: bucket batching, label prediction, crop method, and
space-axis sharded inference."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from wseg_tpu.config import cfg
from wseg_tpu.engine.infer import InferenceEngine
from wseg_tpu.engine.train_loop import init_test_variables
from wseg_tpu.models import get_model


def _engine(method="multiscale", pad_per_scale=False):
    from wseg_tpu.config import reset_cfg
    reset_cfg()
    cfg.NET.MODEL = "bsl"
    cfg.NET.BACKBONE = "vgg16"
    cfg.NET.DTYPE = "float32"
    cfg.TEST.METHOD = method
    cfg.TEST.SCALES = [1.0, 0.5]
    cfg.TEST.FLIP = True
    cfg.TEST.PAD_SIZE = [96, 96]
    cfg.TEST.CROP_SIZE = [64, 64]
    cfg.TEST.CROP_GRID_SIZE = [2, 2]
    cfg.TEST.PAD_PER_SCALE = pad_per_scale
    cfg.TEST.PAD_ALIGN = 32
    cfg.TEST.USE_GT_LABELS = False
    cfg.TEST.FP_CUT_SCORE = 0.1
    model = get_model(cfg.NET, num_classes=21)
    variables = init_test_variables(model, jax.random.PRNGKey(0),
                                    (1, 64, 64, 3))
    return InferenceEngine(model, variables, cfg.TEST)


def _image(rng_np, w=80, h=60):
    return Image.fromarray((rng_np.rand(h, w, 3) * 255).astype(np.uint8))


def test_multiscale_run_image(rng_np):
    eng = _engine()
    img = _image(rng_np)
    merged, labels = eng.run_image(img, np.zeros(20, np.float32))
    assert merged.shape == (60, 80, 21)
    assert labels.shape == (20,)
    assert np.isfinite(merged).all()


def test_multiscale_per_scale_buckets(rng_np):
    eng = _engine(pad_per_scale=True)
    img = _image(rng_np)
    views, pads, flips = eng.views.build(img)
    shapes = sorted({v.shape[:2] for v in views})
    assert len(shapes) == 2  # one bucket per scale
    merged, _ = eng.run_image(img, np.zeros(20, np.float32))
    assert merged.shape == (60, 80, 21)


def test_crop_method(rng_np):
    eng = _engine(method="multicrop")
    img = _image(rng_np)
    merged, _ = eng.run_image(img, np.zeros(20, np.float32))
    assert merged.shape == (60, 80, 21)
    assert np.isfinite(merged).all()


def test_gt_labels_clean_channels(rng_np):
    eng = _engine()
    cfg.TEST.USE_GT_LABELS = True
    eng.cfg = cfg.TEST
    img = _image(rng_np)
    gt = np.zeros(20, np.float32)
    gt[4] = 1.0
    merged, labels = eng.run_image(img, gt)
    np.testing.assert_array_equal(labels, gt)
    # absent foreground channels were zeroed before merging
    present = merged[..., 5]  # class 5 = fg index 4
    absent = merged[..., 1:][..., np.arange(20) != 4]
    assert np.allclose(absent, 0.0)
    assert present.max() >= 0.0


def test_space_sharded_inference(rng_np):
    """Large-image forward with H sharded over a 'space' mesh axis: XLA
    inserts conv halo exchanges; result must equal the unsharded one."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from wseg_tpu.parallel import make_mesh

    cfg.NET.MODEL = "bsl"
    cfg.NET.BACKBONE = "vgg16"
    cfg.NET.DTYPE = "float32"
    model = get_model(cfg.NET, num_classes=21)
    variables = init_test_variables(model, jax.random.PRNGKey(0),
                                    (1, 64, 64, 3))
    x = rng_np.rand(1, 128, 64, 3).astype(np.float32)

    def fwd(v, im):
        out = model.apply(v, im, train=False)
        return out.cls, out.masks

    cls_ref, masks_ref = jax.jit(fwd)(variables, x)

    mesh = make_mesh(n_data=1, n_space=4,
                     devices=jax.devices()[:4])
    with mesh:
        xs = jax.device_put(
            jnp.asarray(x), NamedSharding(mesh, P(None, "space")))
        vs = jax.device_put(variables, NamedSharding(mesh, P()))
        cls_s, masks_s = jax.jit(fwd)(vs, xs)
    np.testing.assert_allclose(np.asarray(cls_s), np.asarray(cls_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(masks_s), np.asarray(masks_ref),
                               rtol=1e-3, atol=1e-4)


def test_device_merge_matches_host_merge(rng_np):
    """TPU-fast device merge must closely match the reference host merge."""
    eng = _engine(pad_per_scale=True)
    cfg.TEST.USE_GT_LABELS = True
    cfg.TEST.DEVICE_MERGE = False  # reference host merge first
    eng.cfg = cfg.TEST
    img = _image(rng_np)
    gt = np.ones(20, np.float32)

    host_merged, _ = eng.run_image(img, gt)
    cfg.TEST.DEVICE_MERGE = True
    eng.cfg = cfg.TEST
    dev_merged, _ = eng.run_image(img, gt)
    assert dev_merged.shape == host_merged.shape
    # epsilon-level deviation from the different bilinear chains
    diff = np.abs(dev_merged - host_merged)
    assert diff.mean() < 0.01, diff.mean()
    agree = (np.argmax(dev_merged, -1) == np.argmax(host_merged, -1)).mean()
    assert agree > 0.95, agree


def test_2d_mesh_data_x_space_inference(rng_np):
    """Combined batch + spatial sharding on a 2-D (data=2, space=4) mesh:
    batch split over 'data', H split over 'space' (XLA conv halo
    exchange); result must equal the unsharded forward."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from wseg_tpu.parallel import make_mesh

    cfg.NET.MODEL = "bsl"
    cfg.NET.BACKBONE = "vgg16"
    cfg.NET.DTYPE = "float32"
    model = get_model(cfg.NET, num_classes=21)
    variables = init_test_variables(model, jax.random.PRNGKey(0),
                                    (1, 64, 64, 3))
    x = rng_np.rand(2, 128, 64, 3).astype(np.float32)

    def fwd(v, im):
        out = model.apply(v, im, train=False)
        return out.cls, out.masks

    cls_ref, masks_ref = jax.jit(fwd)(variables, x)

    mesh = make_mesh(n_data=2, n_space=4, devices=jax.devices()[:8])
    with mesh:
        xs = jax.device_put(
            jnp.asarray(x), NamedSharding(mesh, P("data", "space")))
        vs = jax.device_put(variables, NamedSharding(mesh, P()))
        cls_s, masks_s = jax.jit(fwd)(vs, xs)
    np.testing.assert_allclose(np.asarray(cls_s), np.asarray(cls_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(masks_s), np.asarray(masks_ref),
                               rtol=1e-3, atol=1e-4)
