"""Device view generation vs the host PIL pipeline (golden).

The device path (ops/view_gen.py) must reproduce MultiscaleViews.build's
uint8 views (PIL BICUBIC resize + hflip + centre zero-pad, reference
datasets/pascal_voc_ms.py:126-155) up to PIL's fixed-point rounding.
"""

import numpy as np
import pytest
from PIL import Image

from wseg_tpu.data.multiscale import MultiscaleViews
from wseg_tpu.ops.view_gen import build_views_u8


def _host_views(image, scales, pad_align=64):
    mv = MultiscaleViews(scales, True, (0, 0), pad_per_scale=True,
                         pad_align=pad_align, transfer="uint8")
    return mv, *mv.build(image)


@pytest.mark.parametrize("size", [(50, 37), (96, 64)])
def test_device_views_match_pil(size):
    rng = np.random.RandomState(0)
    # smooth-ish image: cubic ringing on white noise overstates LSB
    # differences no real image shows
    base = rng.rand(size[1] // 4 + 2, size[0] // 4 + 2, 3) * 255
    image = Image.fromarray(base.astype(np.uint8)).resize(
        size, Image.BILINEAR)
    scales = [1.0, 0.5, 1.5, 2.0]
    mv, views, pads, flips = _host_views(image, scales)

    w, h = image.size
    canvas = np.zeros((h, w, 3), np.uint8)
    canvas[:] = np.asarray(image)
    owin = np.asarray([[0, 0, h, w]], np.int32)

    vi = 0
    for s, out_hw in zip(scales, mv.view_shapes(w, h)):
        vwin = np.asarray([pads[vi]], np.int32)
        dev = np.asarray(build_views_u8(
            canvas[None], owin, vwin, out_hw=tuple(out_hw)))
        for k, do_flip in enumerate([False, True]):
            host = views[vi]
            assert flips[vi] == do_flip
            d = dev[k].astype(np.int32) - host.astype(np.int32)
            # PIL uses 8-bit fixed-point filter coefficients; allow a
            # couple of LSBs, require near-exact agreement on average
            assert np.abs(d).max() <= 3, (s, do_flip, np.abs(d).max())
            assert np.abs(d).mean() < 0.35, (s, do_flip, np.abs(d).mean())
            vi += 1


def test_device_views_padded_original():
    """Original sitting in a larger canvas window must give the same
    views as the tight original (traced-window correctness)."""
    rng = np.random.RandomState(1)
    h, w = 40, 56
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    owin_tight = np.asarray([[0, 0, h, w]], np.int32)
    out_hw = (64, 64)
    vwin = np.asarray([[2, 3, 20, 28]], np.int32)

    tight = np.asarray(build_views_u8(
        img[None], owin_tight, vwin, out_hw=out_hw))

    canvas = np.zeros((64, 96, 3), np.uint8)
    canvas[11:11 + h, 17:17 + w] = img
    owin_pad = np.asarray([[11, 17, h, w]], np.int32)
    padded = np.asarray(build_views_u8(
        canvas[None], owin_pad, vwin, out_hw=out_hw))

    np.testing.assert_array_equal(tight, padded)
    # padding region must be exactly zero
    m = np.ones(out_hw, bool)
    m[2:22, 3:31] = False
    assert padded[:, m].max() == 0
