"""Tests for checkpoints, metrics, CRF, data transforms, multiscale merge."""

import os

import numpy as np
import pytest

from wseg_tpu.utils.checkpoints import Checkpoint, make_suffix, parse_suffix
from wseg_tpu.utils.metrics import confusion_matrix, iou_from_confusion


def test_suffix_roundtrip():
    s = make_suffix(20, 0.928)
    assert s == "e020Xs0.928"
    e, sc = parse_suffix(s)
    assert e == 20 and abs(sc - 0.928) < 1e-9


def test_checkpoint_save_load_evict(tmp_path):
    ck = Checkpoint(str(tmp_path), max_n=2)
    tree = {"a": np.arange(4, dtype=np.float32),
            "b": {"c": np.ones((2, 2), np.float32)}}
    for ep in range(4):
        t = {"a": tree["a"] + ep, "b": {"c": tree["b"]["c"] * ep}}
        ck.checkpoint(make_suffix(ep, 0.5 + ep / 10), {"enc": t})
    files = os.listdir(str(tmp_path))
    # only 2 newest remain
    assert len([f for f in files if f.startswith("model_enc")]) == 2
    found, states, _ = ck.load(make_suffix(3, 0.8), {"enc": tree})
    assert found
    np.testing.assert_array_equal(states["enc"]["a"], tree["a"] + 3)

    # crash recovery by mtime
    ck2 = Checkpoint(str(tmp_path), max_n=2)
    ck2.add_checkpoints()
    assert len(ck2.checkpoints) == 2


def test_confusion_matrix_matches_loop(rng_np):
    gt = rng_np.randint(0, 21, size=(13, 17))
    gt[0, :5] = 255  # ambiguous skipped
    pred = rng_np.randint(0, 21, size=(13, 17))
    M = confusion_matrix(gt, pred)
    # slow oracle loop (the reference's algorithm, eval_seg.py:170-183)
    M2 = np.zeros((21, 21))
    for g, p in zip(gt.reshape(-1), pred.reshape(-1)):
        if g < 21:
            M2[g, p] += 1
    np.testing.assert_array_equal(M, M2)
    stats = iou_from_confusion(M)
    assert 0 <= stats["miou"] <= 100


def test_crf_sharpens_probs():
    from wseg_tpu.ops.crf import crf_inference_np
    rng = np.random.RandomState(0)
    H = W = 48
    img = np.zeros((H, W, 3), np.uint8)
    img[:, W // 2:] = 200  # two homogeneous colour regions
    probs = np.full((H, W, 2), 0.5, np.float32)
    probs[:, : W // 2, 0] = 0.7
    probs[:, : W // 2, 1] = 0.3
    probs[:, W // 2:, 0] = 0.45
    probs[:, W // 2:, 1] = 0.55
    out = crf_inference_np(img, probs, t=5, sxy_bilateral=20.0)
    assert out.shape == probs.shape
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-4)
    # mean-field with homogeneous regions sharpens towards the majority
    assert out[:, : W // 2, 0].mean() > 0.9
    assert out[:, W // 2:, 1].mean() > 0.9


def test_crf_jax_matches_numpy_roughly():
    import jax
    from wseg_tpu.ops.crf import crf_inference_jax, crf_inference_np
    rng = np.random.RandomState(1)
    H = W = 32
    img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
    probs = rng.dirichlet(np.ones(4), size=(H, W)).astype(np.float32)
    out_np = crf_inference_np(img, probs, t=3, sxy_bilateral=8.0)
    out_j = crf_inference_jax(img[None].astype(np.float32),
                              probs[None], t=3, sxy_bilateral=8.0)
    out_j = np.asarray(out_j)[0]
    # same algorithm, different gaussian-filter boundary handling:
    # require close agreement, not bit equality
    assert np.abs(out_np - out_j).mean() < 0.02


def test_multiscale_merge_identity():
    from wseg_tpu.data.multiscale import merge_multiscale
    H, W, C = 20, 24, 4
    rng = np.random.RandomState(0)
    m = rng.rand(H + 8, W + 8, C).astype(np.float32)
    pads = [(4, 4, H, W)]
    labels = np.ones(C - 1, np.float32)
    out = merge_multiscale([m], pads, [False], labels, (H, W), bg_pow=1.0)
    np.testing.assert_allclose(out, m[4:4 + H, 4:4 + W], rtol=1e-5)


def test_multiscale_view_generation():
    from PIL import Image
    from wseg_tpu.data.multiscale import MultiscaleViews
    img = Image.fromarray(
        (np.random.RandomState(0).rand(60, 80, 3) * 255).astype(np.uint8))
    mv = MultiscaleViews([1.0, 0.5], flip=True, pad_size=(128, 128))
    views, pads, flips = mv.build(img)
    assert len(views) == 4
    assert all(v.shape == (128, 128, 3) for v in views)
    assert flips == [False, True, False, True]
    # per-scale buckets shrink the padded area
    mv2 = MultiscaleViews([1.0, 0.5], flip=True, pad_size=(128, 128),
                          pad_per_scale=True, pad_align=32)
    views2, pads2, _ = mv2.build(img)
    assert views2[2].shape[0] <= 64


def test_transforms_shapes(tmp_path):
    from PIL import Image
    from wseg_tpu.data import transforms as tf
    rng = np.random.RandomState(0)
    img = Image.fromarray((rng.rand(70, 90, 3) * 255).astype(np.uint8))
    mask = Image.fromarray(rng.randint(0, 21, (70, 90)).astype(np.uint8))
    pipe = tf.Compose([
        tf.MaskRandResizedCrop(48, 0.9, 1.0),
        tf.MaskHFlip(),
        tf.MaskColourJitter(p=1.0),
        tf.MaskNormalise((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
    ])
    out_img, out_mask = pipe(img, mask, rng)
    assert out_img.shape == (48, 48, 3)
    assert out_img.dtype == np.float32
    assert np.asarray(out_mask).shape == (48, 48)


def test_grain_loader(tmp_path):
    import sys
    sys.path.insert(0, "tests")
    from synthetic_voc import make_synthetic_voc

    from wseg_tpu.config import cfg
    from wseg_tpu.data.grain_loader import GrainLoader, make_train_loader
    from wseg_tpu.data.pascal_voc import VOCSegmentation

    root = make_synthetic_voc(str(tmp_path / "voc"), n_train=6, n_val=2)
    cfg.DATASET.ROOT = root
    cfg.DATASET.CROP_SIZE = 48
    ds = VOCSegmentation(cfg.DATASET, "train_augvoc", root=root)
    gl = GrainLoader(ds, batch_size=2, num_workers=0)
    batches = list(gl)
    assert len(batches) == 3
    assert batches[0]["image"].shape == (2, 48, 48, 3)
    assert batches[0]["labels"].shape == (2, 20)
    # sharding halves the work per host
    gl2 = GrainLoader(ds, batch_size=2, num_workers=0, shard_index=0,
                      shard_count=2)
    assert len(list(gl2)) == 1  # 3 records per shard -> 1 full batch
    # factory falls back cleanly
    dl = make_train_loader(ds, 2, use_grain=False)
    assert len(list(dl)) == 3


def test_orbax_backend(tmp_path):
    from wseg_tpu.utils.orbax_io import OrbaxCheckpoint
    ck = OrbaxCheckpoint(str(tmp_path / "orbax"), max_n=2)
    tree = {"a": np.arange(4, dtype=np.float32)}
    for ep in range(3):
        ck.checkpoint("e%03dXs0.5" % ep, {"enc": {"a": tree["a"] + ep}})
    assert len(ck.checkpoints) == 2
    ok, states, _ = ck.load("e002Xs0.5", {"enc": tree})
    assert ok
    np.testing.assert_array_equal(states["enc"]["a"], tree["a"] + 2)
    ck2 = OrbaxCheckpoint(str(tmp_path / "orbax"), max_n=2)
    ck2.add_checkpoints()
    assert len(ck2.checkpoints) == 2


def test_crf_jax_bfloat16_messages_close_to_f32():
    """bfloat16 message passing (the serving default) must match f32
    mean-field closely — softmax renormalises every iteration."""
    import jax.numpy as jnp
    from wseg_tpu.ops.crf import crf_inference_jax
    rng = np.random.RandomState(3)
    H = W = 32
    img = (rng.rand(H, W, 3) * 255).astype(np.float32)
    probs = rng.dirichlet(np.ones(5), size=(H, W)).astype(np.float32)
    f32 = np.asarray(crf_inference_jax(img[None], probs[None], t=5,
                                       sxy_bilateral=8.0))
    b16 = np.asarray(crf_inference_jax(img[None], probs[None], t=5,
                                       sxy_bilateral=8.0,
                                       dtype=jnp.bfloat16))
    assert np.abs(f32 - b16).mean() < 2e-3
    agree = (np.argmax(f32, -1) == np.argmax(b16, -1)).mean()
    assert agree > 0.99, agree


def test_crf_jax_strided_bilateral_close_to_full():
    """CRF_STRIDE=2 (bilateral message on an H/2 grid, upsampled) must
    track the full-resolution mean-field on region-structured inputs —
    the sxy=80-class kernel is tap-sampled far coarser than 2 px."""
    from wseg_tpu.ops.crf import crf_inference_jax
    rng = np.random.RandomState(7)
    H, W = 48, 40
    img = (rng.rand(H, W, 3) * 255).astype(np.float32)
    img[:, : W // 2] /= 4.0
    probs = np.full((H, W, 5), 0.1, np.float32)
    probs[:, : W // 2, 0] = 0.6
    probs[:, W // 2:, 1] = 0.6
    probs /= probs.sum(-1, keepdims=True)
    full = np.asarray(crf_inference_jax(img[None], probs[None], t=5,
                                        sxy_bilateral=16.0))
    half = np.asarray(crf_inference_jax(img[None], probs[None], t=5,
                                        sxy_bilateral=16.0,
                                        bilateral_stride=2))
    agree = (np.argmax(full, -1) == np.argmax(half, -1)).mean()
    assert agree > 0.97, agree
    assert np.abs(full - half).mean() < 0.02


def test_crf_jax_strided_respects_valid_mask():
    """Strided bilateral must not bleed padded pixels into the valid
    window (the merge canvas is padded to static shapes)."""
    from wseg_tpu.ops.crf import crf_inference_jax
    rng = np.random.RandomState(1)
    H = W = 32
    vh, vw = 25, 27  # odd valid window: exercises the H%s != 0 path
    img_small = (rng.rand(vh, vw, 3) * 255).astype(np.float32)
    probs_small = rng.dirichlet(np.ones(4), size=(vh, vw)) \
        .astype(np.float32)

    img = np.zeros((H, W, 3), np.float32)
    probs = np.full((H, W, 4), 0.25, np.float32)
    img[:vh, :vw] = img_small
    probs[:vh, :vw] = probs_small
    mask = np.zeros((H, W, 1), np.float32)
    mask[:vh, :vw] = 1.0

    padded = np.asarray(crf_inference_jax(
        img[None], probs[None], t=3, sxy_bilateral=8.0,
        valid_mask=mask[None], bilateral_stride=2))[0, :vh, :vw]
    exact = np.asarray(crf_inference_jax(
        img_small[None], probs_small[None], t=3, sxy_bilateral=8.0,
        bilateral_stride=2))[0]
    # interior agreement (the masked-path normalisation differs only
    # where the low-res cell straddles the window edge)
    agree = (np.argmax(padded, -1) == np.argmax(exact, -1)).mean()
    assert agree > 0.9, agree


def test_metric_buffer_batched_fetch():
    """MetricBuffer flushes scalars in one stacked transfer and extras
    in one concat, preserving per-step values and order."""
    import jax.numpy as jnp

    from wseg_tpu.engine.trainer import MetricBuffer
    from wseg_tpu.utils.stat_manager import StatManager

    stat = StatManager()
    buf = MetricBuffer(stat)
    for i in range(5):
        buf.append({"loss": jnp.asarray(float(i)),
                    "aux": jnp.asarray(10.0 + i)},
                   extra=jnp.full((2, 3), float(i)))
    last = buf.flush()
    assert last == {"loss": 4.0, "aux": 14.0}
    assert stat.summarize_key("loss") == 2.0
    rows = np.vstack(buf.extra_rows)
    assert rows.shape == (10, 3)
    np.testing.assert_array_equal(rows[:, 0],
                                  np.repeat(np.arange(5.0), 2))
    assert buf.flush() == last  # empty flush is a no-op


def test_checkpoint_roundtrips_batch_stats(tmp_path):
    """Live-BatchNorm models carry batch_stats; the checkpoint saves
    them as enc_bn and load_model_variables restores them (the
    reference persists BN buffers inside the torch state_dict).  Older
    params-only snapshots still load (stats notice, not an error)."""
    import numpy as np

    from wseg_tpu.utils.checkpoints import (
        Checkpoint,
        load_model_variables,
        make_suffix,
    )

    params = {"w": np.ones((2, 2), np.float32)}
    stats = {"bn": {"mean": np.full((2,), 3.0, np.float32)}}
    ck = Checkpoint(str(tmp_path), max_n=2)
    ck.add_model("enc", params)
    ck.add_model("enc_bn", stats)
    sfx = make_suffix(1, 0.5)
    ck.checkpoint(sfx, {"enc": {"w": params["w"] * 2},
                        "enc_bn": {"bn": {"mean": stats["bn"]["mean"]
                                          * 2}}})

    variables = {"params": params, "batch_stats": stats}
    found, out = load_model_variables(ck, sfx, dict(variables))
    assert found
    np.testing.assert_array_equal(out["params"]["w"], 2.0)
    np.testing.assert_array_equal(out["batch_stats"]["bn"]["mean"], 6.0)

    # params-only snapshot (old format): loads, stats stay at init
    ck2 = Checkpoint(str(tmp_path / "old"), max_n=2)
    ck2.add_model("enc", params)
    ck2.checkpoint(sfx, {"enc": params})
    found, out = load_model_variables(ck2, sfx, dict(variables))
    assert found
    np.testing.assert_array_equal(out["batch_stats"]["bn"]["mean"], 3.0)
