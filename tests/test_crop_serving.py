"""MultiCropServer: fused crop-grid program parity with the host
multicrop engine (reference CropLoader + MergeCrops semantics,
/root/reference/datasets/pascal_voc_ms.py:180-243,
/root/reference/utils/inference_tools.py:257-301)."""

import numpy as np
import pytest
from PIL import Image

import jax

from wseg_tpu.config import cfg
from wseg_tpu.engine.infer import InferenceEngine, make_device_postprocess
from wseg_tpu.engine.serving_crop import MultiCropServer, grid_coords
from wseg_tpu.engine.train_loop import init_test_variables
from wseg_tpu.models import get_model


def _apply_cfg():
    cfg.NET.MODEL = "bsl"
    cfg.NET.BACKBONE = "vgg16"
    cfg.NET.DTYPE = "float32"
    cfg.TEST.METHOD = "multicrop"
    cfg.TEST.FLIP = True
    cfg.TEST.PAD_SIZE = [64, 64]
    cfg.TEST.CROP_SIZE = [48, 48]
    cfg.TEST.CROP_GRID_SIZE = [2, 2]
    cfg.TEST.USE_GT_LABELS = False
    cfg.TEST.FP_CUT_SCORE = 0.1
    cfg.TEST.UINT8_TRANSFER = True


@pytest.fixture(scope="module")
def model_vars():
    _apply_cfg()
    model = get_model(cfg.NET, num_classes=21)
    variables = init_test_variables(model, jax.random.PRNGKey(0),
                                    (1, 48, 48, 3))
    return model, variables


def _images(rng_np, n, sizes=((48, 40), (40, 48), (56, 56), (64, 64))):
    out = []
    for i in range(n):
        w, h = sizes[i % len(sizes)]
        out.append(Image.fromarray(
            (rng_np.rand(h, w, 3) * 255).astype(np.uint8)))
    return out


def test_grid_coords_match_cropviews():
    """Static grid corners == CropViews.build coordinates."""
    from wseg_tpu.data.multiscale import CropViews
    views = CropViews((48, 48), (2, 2), (64, 64), flip=True)
    img = Image.fromarray(np.zeros((40, 48, 3), np.uint8))
    _, coords, flips = views.build(img)
    want = grid_coords((64, 64), (48, 48), (2, 2))
    # host coords are per-view (s_h, e_h, s_w, e_w, pt, pl), flip-first
    got = []
    for k in range(0, len(coords), 2):
        s_h, _, s_w, _, _, _ = coords[k]
        got.append((s_h, s_w))
    assert tuple(got) == want
    assert flips[0] is True and flips[1] is False


def test_crop_server_matches_engine(model_vars, rng_np):
    """No-postprocess path: merged maps byte-match the host MergeCrops
    pipeline (predicted labels)."""
    _apply_cfg()
    model, variables = model_vars
    server = MultiCropServer(model, variables, cfg.TEST, max_batch=3,
                             max_wait_ms=50)
    server.warmup()
    try:
        imgs = _images(rng_np, 4)  # uneven tail group (3 + 1)
        futures = [server.submit(im) for im in imgs]
        results = [f.result(timeout=300) for f in futures]
        eng = InferenceEngine(model, variables, cfg.TEST)
        for im, (merged, labels) in zip(imgs, results):
            want, want_labels = eng.run_image(
                im, np.zeros(20, np.float32))
            assert merged.shape == want.shape
            np.testing.assert_allclose(merged, want, rtol=1e-4,
                                       atol=1e-5)
            np.testing.assert_array_equal(labels, want_labels)
    finally:
        server.close()


def _expected_pred(merged, t):
    fgm = np.where(merged[..., 1:] < t, 0.0, merged[..., 1:])
    s = np.concatenate([np.clip(merged[..., :1], 0.0, None), fgm],
                       axis=-1)
    return np.argmax(s, axis=-1).astype(np.uint8)


def test_crop_server_postprocess_gt(model_vars, rng_np):
    """Device postprocess (GT labels): thresholded argmax preds match
    the host merge + writer math (no BG_POW in multicrop)."""
    _apply_cfg()
    cfg.TEST.USE_GT_LABELS = True
    model, variables = model_vars
    pp = make_device_postprocess([0.3, 0.6], [], bg_pow=1.0)
    server = MultiCropServer(model, variables, cfg.TEST, max_batch=2,
                             max_wait_ms=50, postprocess=pp)
    server.warmup()
    try:
        imgs = _images(rng_np, 3)
        gt = np.zeros(20, np.float32)
        gt[[2, 7]] = 1.0
        futures = [server.submit(im, gt) for im in imgs]
        results = [f.result(timeout=300) for f in futures]
        eng = InferenceEngine(model, variables, cfg.TEST)
        for im, (res, labels) in zip(imgs, results):
            want, _ = eng.run_image(im, gt)
            np.testing.assert_array_equal(labels, gt)
            for t in (0.3, 0.6):
                np.testing.assert_array_equal(res[t]["pred"],
                                              _expected_pred(want, t))
    finally:
        server.close()


def test_crop_server_postprocess_device_labels(model_vars, rng_np):
    """Device postprocess with on-device predicted labels
    (dispatch_group_cls with G cls rows per slot)."""
    _apply_cfg()
    model, variables = model_vars
    pp = make_device_postprocess([0.5], [], bg_pow=1.0)
    server = MultiCropServer(model, variables, cfg.TEST, max_batch=2,
                             max_wait_ms=50, postprocess=pp)
    server.warmup()
    try:
        imgs = _images(rng_np, 2)
        futures = [server.submit(im) for im in imgs]
        results = [f.result(timeout=300) for f in futures]
        eng = InferenceEngine(model, variables, cfg.TEST)
        for im, (res, labels) in zip(imgs, results):
            want, want_labels = eng.run_image(
                im, np.zeros(20, np.float32))
            np.testing.assert_array_equal(labels, want_labels)
            np.testing.assert_array_equal(res[0.5]["pred"],
                                          _expected_pred(want, 0.5))
    finally:
        server.close()
