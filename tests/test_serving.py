"""MultiScaleServer: cross-image batching, futures, parity with engine."""

import numpy as np
import pytest
from PIL import Image

import jax

from wseg_tpu.config import cfg
from wseg_tpu.engine.infer import InferenceEngine
from wseg_tpu.engine.serving import MultiScaleServer
from wseg_tpu.engine.train_loop import init_test_variables
from wseg_tpu.models import get_model


def _apply_cfg():
    """Per-test cfg (the autouse reset_cfg fixture wipes cfg between
    tests, so this must run inside every test, not in a module fixture —
    a stale module fixture once left PAD_SIZE at the 1024^2 default and
    the test spent minutes compiling VGG at that size)."""
    cfg.NET.MODEL = "bsl"
    cfg.NET.BACKBONE = "vgg16"
    cfg.NET.DTYPE = "float32"
    cfg.TEST.METHOD = "multiscale"
    cfg.TEST.SCALES = [1.0, 0.5]
    cfg.TEST.FLIP = True
    cfg.TEST.PAD_SIZE = [64, 64]
    cfg.TEST.PAD_PER_SCALE = True
    cfg.TEST.PAD_ALIGN = 16
    cfg.TEST.USE_GT_LABELS = False
    cfg.TEST.FP_CUT_SCORE = 0.1
    # exact-parity tests pin the host view pipeline; the device view
    # path has its own approximate-parity test below
    cfg.TEST.DEVICE_VIEWS = False


@pytest.fixture(scope="module")
def model_vars():
    _apply_cfg()
    model = get_model(cfg.NET, num_classes=21)
    variables = init_test_variables(model, jax.random.PRNGKey(0),
                                    (1, 48, 48, 3))
    return model, variables


def test_server_matches_engine(model_vars, rng_np):
    _apply_cfg()
    model, variables = model_vars
    server = MultiScaleServer(model, variables, cfg.TEST, max_batch=4,
                              max_wait_ms=50)
    server.warmup([(48, 40)])
    try:
        imgs = [Image.fromarray(
            (rng_np.rand(40, 48, 3) * 255).astype(np.uint8))
            for _ in range(5)]
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


def test_server_mixed_sizes(model_vars, rng_np):
    _apply_cfg()
    cfg.TEST.SCALES = [1.0]  # keep the compile count down on CPU
    cfg.TEST.FLIP = False
    model, variables = model_vars
    server = MultiScaleServer(model, variables, cfg.TEST, max_batch=3,
                              max_wait_ms=50)
    server.warmup([(48, 40), (40, 48), (48, 48)])
    try:
        sizes = [(40, 48), (48, 40), (48, 48)]
        futures = [server.submit(Image.fromarray(
            (rng_np.rand(h, w, 3) * 255).astype(np.uint8)))
            for h, w in sizes]
        for (h, w), f in zip(sizes, futures):
            merged, labels = f.result(timeout=300)
            assert merged.shape == (h, w, 21)
    finally:
        server.close()


def test_server_groups_by_signature(model_vars, rng_np):
    """Size-aware batching: an interleaved mixed-size stream must be
    re-grouped so every processed group has ONE view-shape signature
    (mixed groups fragment the slot batch into half-empty programs),
    with all futures still resolving correctly."""
    _apply_cfg()
    cfg.TEST.SCALES = [1.0]
    cfg.TEST.FLIP = False
    model, variables = model_vars
    server = MultiScaleServer(model, variables, cfg.TEST, max_batch=4,
                              max_wait_ms=200)
    groups_seen = []
    orig = server._process

    def spy(group):
        groups_seen.append([g[0].size for g in group])
        return orig(group)

    server._process = spy
    server.warmup([(48, 40), (64, 40)])
    try:
        # interleave two PAD-BUCKET signatures ((48,48) vs (48,64) at
        # align 16 — note (40,48) and (48,40) pad to the SAME bucket);
        # grouping should unzip the stream
        sizes = [(40, 48), (40, 64)] * 4
        futures = [server.submit(Image.fromarray(
            (rng_np.rand(h, w, 3) * 255).astype(np.uint8)))
            for h, w in sizes]
        for (h, w), f in zip(sizes, futures):
            merged, labels = f.result(timeout=300)
            assert merged.shape == (h, w, 21)
    finally:
        server.close()
    for grp in groups_seen:
        assert len(set(grp)) == 1, groups_seen
    assert sum(len(g) for g in groups_seen) == len(sizes)


def test_pp_slot_cap_budget():
    """Postprocess slot chunking: never binds at per-scale-bucket
    canvases; caps the reference global-PAD 1024^2 canvas well below 16
    (a 16-slot group there compiled to 20.2 GB on a 15.75 GB chip)."""
    cap = MultiScaleServer._pp_slot_cap
    assert cap(384, 512, 21) >= 16
    assert 1 <= cap(1024, 1024, 21) < 16


def test_server_device_views_close_to_host_views(model_vars, rng_np):
    """DEVICE_VIEWS (one original upload, resize/flip/pad on device)
    must agree with the host-PIL view path up to the documented ~LSB
    view deviation (ops/view_gen.py), including mixed image sizes and
    predicted (non-GT) labels."""
    _apply_cfg()
    model, variables = model_vars

    def run(device_views):
        cfg.TEST.DEVICE_VIEWS = device_views
        server = MultiScaleServer(model, variables, cfg.TEST,
                                  max_batch=3, max_wait_ms=50)
        try:
            imgs = [Image.fromarray(
                (np.random.RandomState(7 + i).rand(h, w, 3) * 255)
                .astype(np.uint8))
                for i, (h, w) in enumerate([(40, 48), (48, 40),
                                            (40, 48)])]
            futures = [server.submit(im) for im in imgs]
            return [f.result(timeout=300) for f in futures]
        finally:
            server.close()

    host = run(False)
    dev = run(True)
    for (m_h, l_h), (m_d, l_d) in zip(host, dev):
        assert m_d.shape == m_h.shape
        assert np.abs(m_d - m_h).mean() < 5e-3, np.abs(m_d - m_h).mean()
        am = (np.argmax(m_d, -1) == np.argmax(m_h, -1)).mean()
        assert am > 0.97, am
        np.testing.assert_array_equal(l_d, l_h)


def test_server_data_parallel_mesh_matches_single(model_vars, rng_np):
    """Data-parallel inference (reference infer_val.py:99 DataParallel):
    the mesh-sharded server must produce identical results to the
    single-device server — sharding the slot axis is a layout choice,
    not a numerics change."""
    _apply_cfg()
    cfg.TEST.DEVICE_VIEWS = True
    cfg.TEST.UINT8_TRANSFER = True
    model, variables = model_vars

    from wseg_tpu.parallel import make_mesh
    mesh = make_mesh(n_data=8, devices=jax.devices()[:8])

    imgs = [Image.fromarray(
        (rng_np.rand(40, 48, 3) * 255).astype(np.uint8))
        for _ in range(5)]

    def run(mesh_arg):
        server = MultiScaleServer(model, variables, cfg.TEST,
                                  max_batch=8, max_wait_ms=50,
                                  mesh=mesh_arg)
        server.warmup([(48, 40)])
        try:
            futs = [server.submit(im) for im in imgs]
            return [f.result(timeout=300) for f in futs]
        finally:
            server.close()

    single = run(None)
    sharded = run(mesh)
    for (m1, l1), (m8, l8) in zip(single, sharded):
        np.testing.assert_allclose(m8, m1, rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(l8, l1)


def test_server_mesh_rounded_batch_uneven_tail(model_vars, rng_np):
    """End-to-end serve through the ROUNDED max_batch derivation
    (serving.py max_batch -> next multiple of the data axis) with a
    tail group smaller than the rounded slot count: 3 images into a
    max_batch=5 server on an 8-way mesh (rounds to 8, so the one group
    is all tail padding).  Results must match the single-device server
    exactly — VERDICT r4 task 9 (reference infer_val.py:99)."""
    _apply_cfg()
    cfg.TEST.DEVICE_VIEWS = True
    cfg.TEST.UINT8_TRANSFER = True
    model, variables = model_vars

    from wseg_tpu.parallel import make_mesh
    mesh = make_mesh(n_data=8, devices=jax.devices()[:8])

    imgs = [Image.fromarray(
        (rng_np.rand(40, 48, 3) * 255).astype(np.uint8))
        for _ in range(3)]

    def run(mesh_arg, mb):
        if mesh_arg is not None:
            import warnings as _w
            with _w.catch_warnings():
                _w.simplefilter("ignore", UserWarning)
                server = MultiScaleServer(model, variables, cfg.TEST,
                                          max_batch=mb, max_wait_ms=50,
                                          mesh=mesh_arg)
            assert server.max_batch == 8
        else:
            server = MultiScaleServer(model, variables, cfg.TEST,
                                      max_batch=mb, max_wait_ms=50)
        server.warmup([(48, 40)])
        try:
            futs = [server.submit(im) for im in imgs]
            return [f.result(timeout=300) for f in futs]
        finally:
            server.close()

    single = run(None, 8)
    sharded = run(mesh, 5)
    for (m1, l1), (m8, l8) in zip(single, sharded):
        np.testing.assert_allclose(m8, m1, rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(l8, l1)


def test_server_mesh_rounds_batch_to_shardable(model_vars):
    """A non-divisible max_batch is rounded UP to the next multiple of
    the mesh data axis (with a warning) instead of asserting — the
    driver picks BATCH_SIZE without knowing the mesh size."""
    _apply_cfg()
    model, variables = model_vars
    from wseg_tpu.parallel import make_mesh
    mesh = make_mesh(n_data=8, devices=jax.devices()[:8])
    with pytest.warns(UserWarning, match="rounded"):
        server = MultiScaleServer(model, variables, cfg.TEST,
                                  max_batch=3, mesh=mesh)
    try:
        assert server.max_batch == 8
    finally:
        server.close()
