"""Exact-CRF serving stage (TEST.CRF_MODE=exact) vs the native oracle.

The fast path's per-image ExactCRF stage (engine/infer.py) must
reproduce the C++ permutohedral mean field (reference pydensecrf
semantics, utils/dcrf.py:6-21) through the whole serving pipeline:
batched forward -> device merge -> merged maps stay on device -> host
lattice build -> one exact-CRF program per image -> thresholded preds.
Runs on CPU with Pallas interpret mode (tiny geometry).
"""

import numpy as np
import pytest
from PIL import Image

import jax

from wseg_tpu.config import cfg
from wseg_tpu.engine.infer import ExactCRF, make_device_postprocess
from wseg_tpu.engine.serving import MultiScaleServer
from wseg_tpu.engine.train_loop import init_test_variables
from wseg_tpu.models import get_model
from wseg_tpu.ops import crf_native

pytestmark = pytest.mark.skipif(
    crf_native._load() is None, reason="native densecrf unavailable")


def _smooth(rng, h, w):
    """Low-frequency test image: photo-like lattice occupancy (noise
    would make every pixel its own lattice cell)."""
    import cv2
    low = rng.rand(max(h // 12, 2), max(w // 12, 2), 3)
    return (cv2.resize(low, (w, h)) * 255).astype(np.uint8)


def _apply_cfg():
    cfg.NET.MODEL = "bsl"
    cfg.NET.BACKBONE = "vgg16"
    cfg.NET.DTYPE = "float32"
    cfg.TEST.METHOD = "multiscale"
    cfg.TEST.SCALES = [1.0, 0.5]
    cfg.TEST.FLIP = True
    cfg.TEST.PAD_SIZE = [64, 64]
    cfg.TEST.PAD_PER_SCALE = True
    cfg.TEST.PAD_ALIGN = 16
    cfg.TEST.USE_GT_LABELS = True
    cfg.TEST.FP_CUT_SCORE = 0.1
    cfg.TEST.UINT8_TRANSFER = True
    cfg.TEST.DEVICE_VIEWS = True
    cfg.TEST.DEVICE_MERGE = True
    cfg.TEST.BG_POW = 3


@pytest.fixture(scope="module")
def model_vars():
    cfg.NET.MODEL = "bsl"
    cfg.NET.BACKBONE = "vgg16"
    cfg.NET.DTYPE = "float32"
    model = get_model(cfg.NET, num_classes=21)
    variables = init_test_variables(model, jax.random.PRNGKey(0),
                                    (1, 48, 48, 3))
    return model, variables


def _pred(q, t):
    fgm = np.where(q[..., 1:] < t, 0.0, q[..., 1:])
    s = np.concatenate([q[..., :1], fgm], axis=-1)
    return np.argmax(s, axis=-1).astype(np.uint8)


def test_exact_crf_unit_matches_native(rng_np):
    """ExactCRF.build + dispatch on a padded canvas with an offset
    window == native CRF on the bare image."""
    h, w, c = 40, 48, 21
    Hc = Wc = 64
    pt, pl = 8, 8
    img = _smooth(rng_np, h, w)
    probs = rng_np.rand(h, w, c).astype(np.float32) + 0.05
    probs /= probs.sum(-1, keepdims=True)
    canvas = np.zeros((1, Hc, Wc, c), np.float32)
    canvas[0, pt:pt + h, pl:pl + w] = probs

    ex = ExactCRF((0.0, 0.1), crf_iters=3)
    tables = ex.build(img, (Hc, Wc), (pt, pl, h, w))
    got = np.asarray(jax.device_get(
        ex.dispatch(tables, jax.numpy.asarray(canvas), 0)))
    got = got[:, pt:pt + h, pl:pl + w]

    want_q = crf_native.crf_inference_native(img, probs, t=3)
    for k, t in enumerate((0.0, 0.1)):
        want = _pred(want_q, t)
        dev = (got[k] != want).mean()
        assert dev < 0.01, (t, dev)


@pytest.mark.slow
def test_serving_exact_crf_matches_native(model_vars, rng_np):
    """End-to-end: serving fast path in exact mode == native CRF run on
    the (separately fetched) merged maps."""
    _apply_cfg()
    model, variables = model_vars
    threshs, crf_threshs = (0.0, 0.1), (0.1,)
    pp = make_device_postprocess(threshs, crf_threshs, crf_iters=3,
                                 bg_pow=3.0, crf_mode="exact")
    assert pp.crf_mode == "exact" and pp.exact is not None
    server = MultiScaleServer(model, variables, cfg.TEST, max_batch=2,
                              postprocess=pp)
    server.warmup([(48, 40)])
    gt = np.zeros(20, np.float32)
    gt[[2, 7]] = 1.0
    imgs = [Image.fromarray(_smooth(rng_np, 40, 48)) for _ in range(3)]
    try:
        futs = [server.submit(im, gt) for im in imgs]
        results = [f.result(timeout=900) for f in futs]
    finally:
        server.close()

    # oracle: merged maps via a postprocess-free server + native CRF
    ref = MultiScaleServer(model, variables, cfg.TEST, max_batch=2)
    ref.warmup([(48, 40)])
    try:
        merged_all = [ref.submit(im, gt).result(timeout=900)[0]
                      for im in imgs]
    finally:
        ref.close()

    for im, (res, _), merged in zip(imgs, results, merged_all):
        assert set(res.keys()) == {0.0, 0.1}
        assert "pred_crf" in res[0.1] and "pred_crf" not in res[0.0]
        want_q = crf_native.crf_inference_native(
            np.asarray(im, np.uint8), merged.astype(np.float32), t=3)
        want = _pred(want_q, 0.1)
        got = res[0.1]["pred_crf"]
        assert got.shape == want.shape
        dev = (got != want).mean()
        assert dev < 0.02, dev
        # the plain-thresh preds still come from the batched program
        assert res[0.0]["pred"].shape == want.shape
