"""uint8 transfer + on-device writer math vs the host pipeline."""

import jax
import numpy as np
import pytest
from PIL import Image

from wseg_tpu.config import cfg
from wseg_tpu.engine.infer import InferenceEngine, make_device_postprocess
from wseg_tpu.engine.serving import MultiScaleServer
from wseg_tpu.engine.train_loop import init_test_variables
from wseg_tpu.engine.writers import threshold_and_argmax
from wseg_tpu.models import get_model


def _setup(uint8: bool):
    cfg.NET.MODEL = "bsl"
    cfg.NET.BACKBONE = "vgg16"
    cfg.NET.DTYPE = "float32"
    cfg.TEST.SCALES = [1, 0.5]
    cfg.TEST.FLIP = True
    cfg.TEST.PAD_PER_SCALE = True
    cfg.TEST.PAD_ALIGN = 32
    cfg.TEST.USE_GT_LABELS = True
    cfg.TEST.UINT8_TRANSFER = uint8
    # these tests pin the host view pipeline (bit-exactness claims);
    # the device view generator has its own goldens, test_view_gen.py
    cfg.TEST.DEVICE_VIEWS = False
    model = get_model(cfg.NET, num_classes=21)
    variables = init_test_variables(model, jax.random.PRNGKey(0),
                                    (1, 64, 64, 3))
    return model, variables


def _image(seed=0, w=80, h=60):
    r = np.random.RandomState(seed)
    return Image.fromarray((r.rand(h, w, 3) * 255).astype(np.uint8))


def test_uint8_transfer_matches_float_path():
    """Device-side normalise+pad of uint8 views must equal the host
    float pipeline bit-for-bit at the merged-mask level."""
    model, variables = _setup(uint8=False)
    cfg.TEST.DEVICE_MERGE = False
    eng_f = InferenceEngine(model, variables, cfg.TEST)
    img = _image()
    gt = np.ones(20, np.float32)
    merged_f, _ = eng_f.run_image(img, gt)

    cfg.TEST.UINT8_TRANSFER = True
    eng_u = InferenceEngine(model, variables, cfg.TEST)
    merged_u, _ = eng_u.run_image(img, gt)
    np.testing.assert_allclose(merged_u, merged_f, atol=1e-5, rtol=1e-5)


def test_device_postprocess_matches_host_writer_math():
    """Server + device postprocess no-CRF preds == host threshold/argmax
    on the device-merged map; CRF preds are valid label maps."""
    model, variables = _setup(uint8=True)
    cfg.TEST.DEVICE_MERGE = True
    img = _image()
    gt = np.ones(20, np.float32)

    # host reference: device merge then host writer math
    eng = InferenceEngine(model, variables, cfg.TEST)
    merged, labels = eng.run_image(img, gt)
    want = {t: threshold_and_argmax(merged, t) for t in (0.0, 0.3)}

    pp = make_device_postprocess((0.0, 0.3), (0.3,), crf_iters=2,
                                 bg_pow=float(cfg.TEST.BG_POW))
    srv = MultiScaleServer(model, variables, cfg.TEST, max_batch=2,
                           postprocess=pp)
    try:
        res, lab = srv.submit(img, gt).result(timeout=300)
    finally:
        srv.close()

    np.testing.assert_array_equal(lab, labels)
    for t in (0.0, 0.3):
        assert res[t]["pred"].shape == want[t].shape
        agree = (res[t]["pred"] == want[t]).mean()
        assert agree > 0.999, (t, agree)
    crf_pred = res[0.3]["pred_crf"]
    assert crf_pred.shape == want[0.3].shape
    assert crf_pred.dtype == np.uint8
    assert crf_pred.max() <= 20


def test_device_postprocess_coarse_to_fine_crf():
    """The r3 serving default (CRF_FULL_STRIDE=2 + 1 refine iteration)
    through the server: non-CRF preds still match host writer math and
    the coarse-to-fine CRF pred is a valid label map that overlaps the
    full-resolution device CRF.  The agreement bound here is loose —
    this scene is a 60x80 random-noise image, squarely in the
    documented small-image regime where the sxy=80 kernel spans the
    frame (docs/PARITY.md); the production-size accuracy bound (0.95%
    argmax deviation at 384x512) is pinned by
    tests/test_crf_fidelity.py::test_serving_default_coarse_to_fine."""
    model, variables = _setup(uint8=True)
    cfg.TEST.DEVICE_MERGE = True
    img = _image(7)
    gt = np.ones(20, np.float32)

    eng = InferenceEngine(model, variables, cfg.TEST)
    merged, labels = eng.run_image(img, gt)
    want = threshold_and_argmax(merged, 0.0)

    def run_server(**crf_kw):
        pp = make_device_postprocess((0.0,), (0.0,), crf_iters=3,
                                     bg_pow=float(cfg.TEST.BG_POW),
                                     **crf_kw)
        srv = MultiScaleServer(model, variables, cfg.TEST, max_batch=2,
                               postprocess=pp)
        try:
            res, _ = srv.submit(img, gt).result(timeout=300)
        finally:
            srv.close()
        return res

    res_cf = run_server(crf_full_stride=2, crf_refine_iters=1,
                        crf_stride=2)
    res_full = run_server()
    agree_plain = (res_cf[0.0]["pred"] == want).mean()
    assert agree_plain > 0.999, agree_plain
    cf = res_cf[0.0]["pred_crf"]
    assert cf.dtype == np.uint8 and cf.max() <= 20
    agree_crf = (cf == res_full[0.0]["pred_crf"]).mean()
    assert agree_crf > 0.5, agree_crf


def test_device_labels_match_host_labels():
    """USE_GT_LABELS=False with a postprocess: image-level labels are
    computed ON DEVICE inside the postprocess program (sigmoid-max over
    views > FP_CUT_SCORE).  They must equal the host predict_labels
    path, and the preds must equal a GT-labels run fed those labels."""
    model, variables = _setup(uint8=True)
    cfg.TEST.DEVICE_MERGE = True
    cfg.TEST.DEVICE_VIEWS = True
    cfg.TEST.USE_GT_LABELS = False
    img = _image(21)

    # host reference labels via the engine
    eng = InferenceEngine(model, variables, cfg.TEST)
    _, labels_host = eng.run_image(img, np.zeros(20, np.float32))

    pp = make_device_postprocess((0.0,), (), crf_iters=1,
                                 bg_pow=float(cfg.TEST.BG_POW))
    srv = MultiScaleServer(model, variables, cfg.TEST, max_batch=2,
                           postprocess=pp)
    srv.warmup([img.size])
    try:
        res_dev, labels_dev = srv.submit(img).result(timeout=300)
    finally:
        srv.close()
    np.testing.assert_array_equal(labels_dev, labels_host)

    cfg.TEST.USE_GT_LABELS = True
    pp2 = make_device_postprocess((0.0,), (), crf_iters=1,
                                  bg_pow=float(cfg.TEST.BG_POW))
    srv2 = MultiScaleServer(model, variables, cfg.TEST, max_batch=2,
                            postprocess=pp2)
    srv2.warmup([img.size])
    try:
        res_gt, _ = srv2.submit(img, labels_host).result(timeout=300)
    finally:
        srv2.close()
    np.testing.assert_array_equal(res_dev[0.0]["pred"],
                                  res_gt[0.0]["pred"])


@pytest.mark.parametrize("use_gt", [True, False],
                         ids=["gt-labels", "device-labels"])
def test_chunked_postprocess_matches_unchunked(monkeypatch, use_gt):
    """HBM-budget chunking (_pp_slot_cap small -> several postprocess
    dispatches per group) must produce the same per-image results as
    one full-group dispatch, with every future resolving — for BOTH
    labels sources (GT rides as a host array; predicted labels compute
    inside the program, so chunking also slices the per-scale cls rows
    by slot*views-per-image)."""
    model, variables = _setup(uint8=True)
    cfg.TEST.DEVICE_MERGE = True
    cfg.TEST.DEVICE_VIEWS = True
    cfg.TEST.USE_GT_LABELS = use_gt
    imgs = [_image(10 + i) for i in range(4)]
    gt = np.ones(20, np.float32) if use_gt else None

    def run(slot_cap):
        if slot_cap is not None:
            monkeypatch.setattr(MultiScaleServer, "_pp_slot_cap",
                                staticmethod(lambda mh, mw, nc:
                                             slot_cap))
        pp = make_device_postprocess((0.0, 0.3), (), crf_iters=1,
                                     bg_pow=float(cfg.TEST.BG_POW))
        srv = MultiScaleServer(model, variables, cfg.TEST, max_batch=4,
                               max_wait_ms=200, postprocess=pp)
        srv.warmup([im.size for im in imgs])
        try:
            futs = [srv.submit(im, gt) for im in imgs]
            return [f.result(timeout=300) for f in futs]
        finally:
            srv.close()

    full = run(None)
    chunked = run(2)  # 4-slot group -> two 2-slot dispatches
    for (a, la), (b, lb) in zip(full, chunked):
        np.testing.assert_array_equal(la, lb)
        for t in (0.0, 0.3):
            np.testing.assert_array_equal(a[t]["pred"], b[t]["pred"])


def test_server_uint8_merged_matches_engine():
    """Without postprocess, the uint8 server still returns merged maps
    that match the per-image engine."""
    model, variables = _setup(uint8=True)
    cfg.TEST.DEVICE_MERGE = True
    eng = InferenceEngine(model, variables, cfg.TEST)
    srv = MultiScaleServer(model, variables, cfg.TEST, max_batch=2)
    img = _image(3)
    gt = np.ones(20, np.float32)
    try:
        got, _ = srv.submit(img, gt).result(timeout=300)
    finally:
        srv.close()
    want, _ = eng.run_image(img, gt)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
