"""Device colour jitter (ops/jitter.py) vs the byte-exact PIL host path.

The host transform (transforms.MaskColourJitter / apply_jitter_params)
replicates torchvision ColorJitter; the device op must reproduce it:
brightness/contrast/saturation byte-exact (PIL blend truncation), hue
within a quantified bound (PIL's uint8 HSV planes vs f32 emulation
differ on float boundary cases).
"""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from wseg_tpu.data.transforms import apply_jitter_params
from wseg_tpu.ops.jitter import (
    apply_colour_jitter,
    sample_colour_jitter,
)


def _host(imgs, params):
    return np.stack([
        np.asarray(apply_jitter_params(Image.fromarray(im), p))
        for im, p in zip(imgs, params)]).astype(np.float32)


def _dev(imgs, params):
    return np.asarray(apply_colour_jitter(
        jnp.asarray(imgs, jnp.float32), jnp.asarray(params)))


@pytest.fixture()
def imgs():
    rng = np.random.RandomState(7)
    return (rng.rand(6, 48, 56, 3) * 255).astype(np.uint8)


@pytest.mark.parametrize("op", [0, 1, 2])
def test_bcs_byte_exact(imgs, op):
    """Brightness/contrast/saturation reproduce PIL blend exactly."""
    rng = np.random.RandomState(11 + op)
    params = np.stack([sample_colour_jitter(rng, p=1.0)
                       for _ in range(len(imgs))])
    iso = params.copy()
    iso[:, :4] = [1.0, 1.0, 1.0, 0.0]
    iso[:, op] = params[:, op]
    np.testing.assert_array_equal(_dev(imgs, iso), _host(imgs, iso))


def test_hue_bounded(imgs):
    """Hue via the quantised-HSV emulation: tight statistical bound."""
    rng = np.random.RandomState(3)
    params = np.stack([sample_colour_jitter(rng, p=1.0)
                       for _ in range(len(imgs))])
    iso = params.copy()
    iso[:, :4] = [1.0, 1.0, 1.0, 0.0]
    iso[:, 3] = params[:, 3]
    d = np.abs(_dev(imgs, iso) - _host(imgs, iso))
    assert d.mean() < 0.05, d.mean()
    assert (d > 2).mean() < 0.005, (d > 2).mean()


def test_full_pipeline_bounded(imgs):
    rng = np.random.RandomState(5)
    params = np.stack([sample_colour_jitter(rng, p=1.0)
                       for _ in range(len(imgs))])
    d = np.abs(_dev(imgs, params) - _host(imgs, params))
    assert d.mean() < 0.1, d.mean()
    assert (d > 2).mean() < 0.01, (d > 2).mean()


def test_not_applied_is_identity(imgs):
    rng = np.random.RandomState(9)
    # p=0: the early-exit draw happens, params stay identity
    params = np.stack([sample_colour_jitter(rng, p=0.0)
                       for _ in range(len(imgs))])
    assert (params[:, 8] == 0.0).all()
    np.testing.assert_array_equal(_dev(imgs, params),
                                  imgs.astype(np.float32))


def test_sampling_matches_host_stream(imgs):
    """sample_colour_jitter consumes the same rng draws as the host
    MaskColourJitter, so a device-jitter run sees the same crops/flips
    downstream of the jitter draw."""
    r1, r2 = np.random.RandomState(42), np.random.RandomState(42)
    from wseg_tpu.data.transforms import MaskColourJitter
    t = MaskColourJitter(p=1.0)
    im = Image.fromarray(imgs[0])
    out, _, _ = t(im, im, r1)
    params = sample_colour_jitter(r2, p=1.0)
    assert r1.rand() == r2.rand()  # streams still aligned
    d = np.abs(np.asarray(out, np.float32) - _dev(imgs[:1], params[None])[0])
    assert d.mean() < 0.1


def test_loader_emits_jitter(tmp_path):
    """VOCSegmentation(device_jitter=True) batches carry (B, 9) params
    and ship un-jittered uint8 crops."""
    from wseg_tpu.config import cfg, reset_cfg
    from wseg_tpu.data.loader import DataLoader
    from wseg_tpu.data.pascal_voc import VOCSegmentation

    reset_cfg()
    rng = np.random.RandomState(0)
    (tmp_path / "img").mkdir()
    (tmp_path / "m").mkdir()
    lines = []
    for i in range(4):
        n = f"2007_{i:06d}"
        Image.fromarray((rng.rand(64, 80, 3) * 255).astype(
            np.uint8)).save(tmp_path / "img" / f"{n}.jpg")
        Image.fromarray(rng.randint(0, 21, (64, 80)).astype(
            np.uint8)).save(tmp_path / "m" / f"{n}.png")
        lines.append(f"/img/{n}.jpg /m/{n}.png\n")
    (tmp_path / "tr.txt").write_text("".join(lines))
    dcfg = cfg.DATASET
    dcfg.CROP_SIZE = 32
    ds = VOCSegmentation(dcfg, "tr", root=str(tmp_path), augment=True,
                         device_jitter=True)
    assert ds.device_jitter
    batch = next(iter(DataLoader(ds, 4, num_workers=1)))
    assert batch["image"].dtype == np.uint8
    assert batch["jitter"].shape == (4, 9)
    assert (batch["jitter"][:, 8] == 1.0).all()
