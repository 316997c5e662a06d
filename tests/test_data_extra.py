"""Optional data-pipeline features: the external scoremap stream
(reference datasets/pascal_voc.py:132-150,175-179) and the ResNet
deep_base stem (reference resnets.py:86-93)."""

import os

import flax
import jax
import jax.numpy as jnp
import numpy as np

from synthetic_voc import make_synthetic_voc
from wseg_tpu.config import cfg, reset_cfg
from wseg_tpu.data.loader import DataLoader
from wseg_tpu.data.pascal_voc import VOCSegmentation


def _dataset(tmp_path, scoremap_path=""):
    reset_cfg()
    root = make_synthetic_voc(str(tmp_path / "voc"))
    cfg.DATASET.ROOT = root
    cfg.DATASET.CROP_SIZE = 48
    return VOCSegmentation(cfg.DATASET, "train_augvoc", root=root,
                           scoremap_path=scoremap_path)


def test_scoremap_stream_joint_augmented(tmp_path):
    ds_plain = _dataset(tmp_path)
    assert len(ds_plain[0]) == 4  # no score unless a path is given

    # write a scoremap for image 0 only; image 1+ fall back to zeros
    sm_dir = tmp_path / "scoremaps"
    os.makedirs(sm_dir)
    img0 = ds_plain.entries[0][0]
    stem = os.path.splitext(os.path.basename(img0))[0]
    np.save(sm_dir / (stem + ".npy"),
            np.full((60, 80), 0.5, np.float32))

    ds = _dataset(tmp_path, scoremap_path=str(sm_dir))
    image, labels, name, mask, score = ds[0]
    assert score.shape == mask.shape == (48, 48)
    assert score.dtype == np.float32
    # bilinear resampling of a constant map stays constant
    np.testing.assert_allclose(score, 0.5, atol=1e-5)
    _, _, _, _, score1 = ds[1]
    np.testing.assert_array_equal(score1, 0.0)

    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    batch = next(iter(loader))
    assert batch["score"].shape == (2, 48, 48)


def test_resnet_deep_base_stem():
    from wseg_tpu.models.backbones.resnet import ResNet
    from wseg_tpu.parallel.optim import label_params
    from wseg_tpu.models.backbones.common import FROZEN, PRE_W

    model = ResNet(layers=(2, 2, 2, 2), deep_base=True)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)
    out = jax.jit(model.apply, static_argnames="train")(
        variables, x, train=False)
    assert out["conv6"].shape == (1, 4, 4, 2048)  # output stride 16

    flat = flax.traverse_util.flatten_dict(variables["params"])
    assert ("conv2", "kernel") in flat and ("bn3", "scale") in flat
    labels = flax.traverse_util.flatten_dict(
        label_params({"backbone": variables["params"]}, "resnet50"))
    # deep-stem modules frozen; bottleneck conv2 one level deeper is not
    assert labels[("backbone", "conv2", "kernel")] == FROZEN
    assert labels[("backbone", "bn3", "scale")] == FROZEN
    assert labels[("backbone", "layer1_0", "conv2", "kernel")] == PRE_W


def test_colorize_matches_palette():
    from wseg_tpu.data import colorize, get_mask_palette_image, voc_colormap
    mask = np.array([[0, 1], [20, 21]], np.int32)
    rgb = colorize(mask)
    cmap = voc_colormap()
    np.testing.assert_array_equal(rgb[0, 0], [0, 0, 0])
    np.testing.assert_array_equal(rgb[0, 1], cmap[1])
    np.testing.assert_array_equal(rgb[1, 0], cmap[20])
    # index 21 recovers to ambiguous/255 (reference pallete.py boundary)
    np.testing.assert_array_equal(rgb[1, 1], cmap[255])

    im = get_mask_palette_image(np.array([[3]], np.uint8))
    np.testing.assert_array_equal(
        np.asarray(im.convert("RGB"))[0, 0], cmap[3])


def test_threaded_loader_backpressure(tmp_path):
    """Workers may run at most ``prefetch`` batches ahead of the
    consumer (an unbounded pool once decoded whole epochs into RAM)."""
    import threading
    import time

    from wseg_tpu.data.loader import DataLoader

    produced = []
    lock = threading.Lock()

    class CountingDS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            with lock:
                produced.append(i)
            img = np.zeros((8, 8, 3), np.uint8)
            return img, np.zeros(20, np.float32), f"s{i}", \
                np.zeros((8, 8), np.int32)

    dl = DataLoader(CountingDS(), batch_size=4, shuffle=False,
                    num_workers=2, prefetch=2)
    it = iter(dl)
    next(it)
    time.sleep(0.3)  # give workers every chance to run ahead
    # consumer took 1 batch; at most 1 + prefetch(2) + in-flight(2
    # workers) batches of 4 samples may have been produced
    assert len(produced) <= 4 * (1 + 2 + 2), len(produced)
    rest = list(it)
    assert len(rest) == 15
    assert sorted(produced) == list(range(64))


def test_grain_loader_pool_persists_across_epochs(tmp_path):
    """__iter__ must reuse one underlying iterator (pool) and reshuffle
    per pass — a fresh pool per epoch pays process spawn every epoch."""
    from tests.synthetic_voc import make_synthetic_voc
    from wseg_tpu.config import cfg, reset_cfg
    from wseg_tpu.data.grain_loader import GrainLoader
    from wseg_tpu.data.pascal_voc import VOCSegmentation

    reset_cfg()
    root = make_synthetic_voc(str(tmp_path / "voc"), n_train=8, n_val=1)
    cfg.DATASET.ROOT = root
    cfg.DATASET.CROP_SIZE = 32
    ds = VOCSegmentation(cfg.DATASET, "train_augvoc", root=root)
    gl = GrainLoader(ds, batch_size=2, num_workers=0, seed=3)
    e1 = [b["name"] for b in gl]
    it_obj = gl._it
    e2 = [b["name"] for b in gl]
    assert gl._it is it_obj  # same pool
    assert len(e1) == len(e2) == 4
    flat1 = [n for b in e1 for n in b]
    flat2 = [n for b in e2 for n in b]
    assert sorted(flat1) == sorted(flat2)  # every record once per epoch
    assert flat1 != flat2  # reshuffled between passes


def test_grain_loader_epoch_alignment_non_divisible(tmp_path):
    """batch_size not dividing the dataset must NOT drift epoch
    boundaries: every epoch sees each record at most once and drops the
    same per-pass remainder as torch DataLoader(drop_last=True)."""
    from tests.synthetic_voc import make_synthetic_voc
    from wseg_tpu.config import cfg, reset_cfg
    from wseg_tpu.data.grain_loader import GrainLoader
    from wseg_tpu.data.pascal_voc import VOCSegmentation

    reset_cfg()
    root = make_synthetic_voc(str(tmp_path / "voc"), n_train=7, n_val=1)
    cfg.DATASET.ROOT = root
    cfg.DATASET.CROP_SIZE = 32
    ds = VOCSegmentation(cfg.DATASET, "train_augvoc", root=root)
    gl = GrainLoader(ds, batch_size=2, num_workers=0, seed=5)
    assert len(gl) == 3  # 7 // 2
    for _ in range(3):  # repeated epochs stay pass-aligned
        names = [n for b in gl for n in b["name"]]
        assert len(names) == 6
        assert len(set(names)) == 6  # no within-epoch repeats
    # drop_last=False yields the 1-record remainder batch
    gl2 = GrainLoader(ds, batch_size=2, num_workers=0, seed=5,
                      drop_last=False)
    batches = list(gl2)
    assert [b["image"].shape[0] for b in batches] == [2, 2, 2, 1]
    names = [n for b in batches for n in b["name"]]
    assert len(set(names)) == 7


def test_split_integrity_guard(tmp_path):
    """Official split names with wrong counts warn by default and raise
    under WSEG_STRICT_SPLITS (reference pascal_voc.py:155-157 asserts
    unconditionally)."""
    import pytest

    from wseg_tpu.data.pascal_voc import check_split_integrity

    check_split_integrity("train", 10582)  # official: silent
    check_split_integrity("train_voc", 1464)  # plain VOC train: silent
    check_split_integrity("val_voc", 1449)  # stem alias: silent
    check_split_integrity("custom_list", 3)  # unknown split: silent
    with pytest.warns(UserWarning):
        check_split_integrity("train_augvoc", 8)
    with pytest.raises(AssertionError):
        check_split_integrity("val", 3, strict=True)


def test_split_integrity_env_flag(monkeypatch):
    """WSEG_STRICT_SPLITS is value-parsed: '0'/'false' keep warn mode,
    '1' raises."""
    import pytest

    from wseg_tpu.data.pascal_voc import check_split_integrity

    monkeypatch.setenv("WSEG_STRICT_SPLITS", "0")
    with pytest.warns(UserWarning):
        check_split_integrity("val", 3)
    monkeypatch.setenv("WSEG_STRICT_SPLITS", "1")
    with pytest.raises(AssertionError):
        check_split_integrity("val", 3)


def test_grain_records_per_pass_sharded():
    """Per-shard pass size must match grain's ShardOptions semantics:
    drop_remainder=True floors every shard; otherwise the first
    n % count shards carry one extra record."""
    from wseg_tpu.data.grain_loader import GrainLoader

    class _FakeDs:
        def __len__(self):
            return 10

    def make(shard_index, drop_last):
        lo = GrainLoader.__new__(GrainLoader)
        lo.dataset = _FakeDs()
        lo.shard_count = 3
        lo.shard_index = shard_index
        lo.drop_last = drop_last
        return lo._records_per_pass()

    assert [make(i, True) for i in range(3)] == [3, 3, 3]
    assert [make(i, False) for i in range(3)] == [4, 3, 3]
    assert sum(make(i, False) for i in range(3)) == 10


def test_threaded_loader_propagates_worker_errors():
    """A dataset exception inside a worker thread must re-raise in the
    consumer (previously the consumer waited forever on the missing
    batch), and abandoning the iterator must release worker threads."""
    import pytest

    from wseg_tpu.data.loader import DataLoader

    class Bad:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise OSError("corrupt image")
            img = np.zeros((4, 4, 3), np.uint8)
            return img, np.ones(20, np.float32), f"im{i}", \
                np.zeros((4, 4), np.int32)

    loader = DataLoader(Bad(), batch_size=2, shuffle=False,
                        drop_last=True, num_workers=2)
    with pytest.raises(OSError, match="corrupt image"):
        for _ in loader:
            pass

    # abandoning mid-epoch must not deadlock the next epoch
    loader2 = DataLoader(Bad(), batch_size=2, shuffle=False,
                         drop_last=True, num_workers=2)
    it = iter(loader2)
    next(it)
    it.close()
    n = sum(1 for _ in zip(range(2), iter(DataLoader(
        Bad(), batch_size=1, shuffle=False, drop_last=True,
        num_workers=1))))
    assert n == 2
