"""Golden tests for the augmentation stack (reference
datasets/transforms.py:11-117, torchvision-backed).

torchvision is NOT available in this environment, so the oracles are
independent numpy/colorsys re-derivations of what torchvision's PIL path
computes:

  * brightness/contrast/saturation: torchvision F.adjust_* on PIL images
    delegates to PIL ImageEnhance; the oracle here recomputes the
    documented blend ``degenerate*(1-f) + img*f`` in numpy (the blend
    bases: black / mean-of-grayscale / grayscale).
  * hue: torchvision converts to HSV and adds ``uint8(round(f*255))``
    with wraparound; the oracle recomputes per-pixel via colorsys floats.
  * RandomResizedCrop sampling: bounds + the deterministic central
    fallback (torchvision get_params semantics).

If torchvision is ever present, the exact pixel comparisons in the
optional block at the bottom run too.
"""

import numpy as np
import pytest
from PIL import Image, ImageEnhance

from wseg_tpu.data.transforms import (
    MaskColourJitter,
    MaskNormalise,
    MaskRandResizedCrop,
    _adjust_hue,
    _rrc_params,
)


def _img(seed=0, w=73, h=57):
    r = np.random.RandomState(seed)
    return Image.fromarray((r.rand(h, w, 3) * 255).astype(np.uint8))


def _mask(seed=1, w=73, h=57):
    r = np.random.RandomState(seed)
    return Image.fromarray(r.randint(0, 21, (h, w)).astype(np.uint8))


# PIL "L" grayscale uses ITU-R 601-2: L = 299R/1000 + 587G/1000 + 114B/1000
_L_W = np.array([0.299, 0.587, 0.114], np.float32)


def _blend(base, img, f):
    out = base * (1.0 - f) + np.asarray(img, np.float32) * f
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("f", [0.7, 1.0, 1.3])
def test_brightness_semantics(f):
    """brightness: blend toward black (torchvision adjust_brightness)."""
    img = _img()
    ours = np.asarray(ImageEnhance.Brightness(img).enhance(f), np.int32)
    ref = _blend(np.zeros(3, np.float32), img, f).astype(np.int32)
    assert np.abs(ours - ref).max() <= 1  # PIL integer rounding


@pytest.mark.parametrize("f", [0.7, 1.0, 1.3])
def test_contrast_semantics(f):
    """contrast: blend toward the mean of the grayscale image."""
    img = _img()
    arr = np.asarray(img, np.float32)
    # PIL ImageEnhance.Contrast: mean of L image + 0.5 rounding
    gray_mean = int(np.asarray(img.convert("L"), np.float32).mean() + 0.5)
    ours = np.asarray(ImageEnhance.Contrast(img).enhance(f), np.int32)
    ref = _blend(np.float32(gray_mean), arr, f).astype(np.int32)
    assert np.abs(ours - ref).max() <= 1


@pytest.mark.parametrize("f", [0.7, 1.0, 1.3])
def test_saturation_semantics(f):
    """saturation: blend toward the grayscale image."""
    img = _img()
    arr = np.asarray(img, np.float32)
    gray = np.asarray(img.convert("L"), np.float32)[..., None]
    ours = np.asarray(ImageEnhance.Color(img).enhance(f), np.int32)
    ref = _blend(gray, arr, f).astype(np.int32)
    assert np.abs(ours - ref).max() <= 1


@pytest.mark.parametrize("hue", [-0.1, -0.05, 0.0, 0.05, 0.1])
def test_hue_semantics(hue):
    """_adjust_hue vs a per-pixel colorsys oracle of the torchvision
    algorithm (HSV uint8 hue + round(f*255), wraparound)."""
    import colorsys
    img = _img(w=16, h=12)
    ours = np.asarray(_adjust_hue(img, hue), np.int32)

    arr = np.asarray(img, np.float32) / 255.0
    out = np.zeros_like(arr)
    shift = int(round(hue * 255))
    for y in range(arr.shape[0]):
        for x in range(arr.shape[1]):
            h, s, v = colorsys.rgb_to_hsv(*arr[y, x])
            # quantise exactly like PIL's HSV mode (uint8 hue channel)
            h8 = int(round(h * 255.0)) % 256
            h8 = (h8 + shift) % 256
            r, g, b = colorsys.hsv_to_rgb(h8 / 255.0, s, v)
            out[y, x] = (r, g, b)
    ref = np.round(out * 255.0).astype(np.int32)
    # PIL's integer HSV<->RGB conversions quantise more coarsely than
    # colorsys floats; allow a small per-channel gap
    assert np.abs(ours - ref).max() <= 6, np.abs(ours - ref).max()
    if hue == 0.0:
        np.testing.assert_array_equal(ours, np.asarray(img, np.int32))


def test_colour_jitter_applies_all_four_ops():
    """With p=1 the jitter output differs from any single-op application
    and stays a valid image; with the gate closed it is identity."""
    img = _img()
    rng = np.random.RandomState(3)
    out, m, _ = MaskColourJitter(p=1.0)(img, _mask(), rng)
    assert out.size == img.size
    assert not np.array_equal(np.asarray(out), np.asarray(img))

    class _Closed(np.random.RandomState):
        def rand(self):
            return 1.0  # gate never fires

    out2, _, _ = MaskColourJitter(p=0.5)(img, _mask(), _Closed(0))
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(img))


def test_normalise_semantics():
    image = _img()
    mean = [0.485, 0.456, 0.406]
    std = [0.229, 0.224, 0.225]
    ours, _, _ = MaskNormalise(mean, std)(image, _mask(), None)
    ref = (np.asarray(image, np.float32) / 255.0 -
           np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_rrc_param_sampling_bounds():
    """Distributional check of _rrc_params vs torchvision get_params
    semantics: area within [scale]*area (with int rounding slack), aspect
    within ratio, crop inside the image."""
    rng = np.random.RandomState(0)
    w, h = 123, 87
    scale, ratio = (0.9, 1.0), (3. / 4., 4. / 3.)
    for _ in range(200):
        i, j, ch, cw = _rrc_params(w, h, scale, ratio, rng)
        assert 0 <= i <= h - ch and 0 <= j <= w - cw
        area_frac = (ch * cw) / (w * h)
        assert 0.85 <= area_frac <= 1.05, area_frac
        assert ratio[0] * 0.9 <= cw / ch <= ratio[1] * 1.1

    # degenerate ratio range -> torchvision's central-crop fallback:
    # in_ratio (10.0) > ratio[1] (6.0): ch = h, cw = round(h * ratio[1])
    i, j, ch, cw = _rrc_params(100, 10, (0.9, 1.0), (5.0, 6.0), rng)
    assert (i, j, ch, cw) == (0, 20, 10, 60)


def test_rand_resized_crop_streams_consistent():
    """The three streams (cubic/nearest/bilinear) see the SAME window: a
    mask region maps to the same place as the image region."""
    w = h = 64
    img = Image.fromarray(np.full((h, w, 3), 255, np.uint8))
    m = np.zeros((h, w), np.uint8)
    m[20:40, 20:40] = 7
    mask = Image.fromarray(m)
    rrc = MaskRandResizedCrop(48, 0.9, 1.0)
    oi, om, _ = rrc(img, mask, np.random.RandomState(5))
    om = np.asarray(om)
    assert om.shape == (48, 48)
    assert set(np.unique(om)) <= {0, 7}
    assert (om == 7).any()


# Frozen fixture: the exact uint8 outputs of the five PIL-path jitter
# ops, committed at tests/fixtures/tv_golden.npz so this asserts in
# every env instead of skipping when torchvision is absent.  Regenerate
# (and cross-validate vs torchvision when it exists) with
# tools/gen_tv_golden.py; the archive records its provenance.
def test_frozen_jitter_golden():
    import os
    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "tv_golden.npz")
    golden = np.load(path)
    image = _img()
    i, j, ch, cw = 5, 9, 40, 48
    np.testing.assert_array_equal(
        np.asarray(image.crop((j, i, j + cw, i + ch)).resize(
            (33, 33), Image.BICUBIC)), golden["crop"])
    for f in (0.7, 1.3):
        np.testing.assert_array_equal(
            np.asarray(ImageEnhance.Brightness(image).enhance(f)),
            golden["brightness_%s" % f])
        np.testing.assert_array_equal(
            np.asarray(ImageEnhance.Contrast(image).enhance(f)),
            golden["contrast_%s" % f])
        np.testing.assert_array_equal(
            np.asarray(ImageEnhance.Color(image).enhance(f)),
            golden["saturation_%s" % f])
    for hue in (-0.1, 0.05):
        np.testing.assert_array_equal(
            np.asarray(_adjust_hue(image, hue)), golden["hue_%s" % hue])


# (The live torchvision comparison moved into tools/gen_tv_golden.py,
# which cross-validates at fixture-regeneration time in any env that
# has torchvision — keeping it here as an importorskip test would leave
# a permanent skip in this env.)
