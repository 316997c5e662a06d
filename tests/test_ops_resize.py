"""Golden tests: resize ops vs torch.nn.functional.interpolate (CPU oracle)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from wseg_tpu.ops import resize_bilinear, resize_nearest, rescale_as


def _torch_bilinear(x_nhwc, size, align_corners):
    t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    out = F.interpolate(t, size=size, mode="bilinear",
                        align_corners=align_corners)
    return np.transpose(out.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("hw_in,hw_out", [
    ((7, 9), (21, 27)),
    ((21, 27), (7, 9)),
    ((41, 41), (321, 321)),
    ((5, 5), (5, 5)),
    ((1, 4), (3, 8)),
])
def test_bilinear_matches_torch(rng_np, align, hw_in, hw_out):
    x = rng_np.randn(2, *hw_in, 3).astype(np.float32)
    want = _torch_bilinear(x, hw_out, align)
    got = np.asarray(resize_bilinear(x, hw_out, align_corners=align))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-5)


def test_rescale_as(rng_np):
    x = rng_np.randn(1, 8, 8, 4).astype(np.float32)
    y = np.zeros((1, 24, 20, 1), np.float32)
    out = rescale_as(x, y)
    assert out.shape == (1, 24, 20, 4)
    want = _torch_bilinear(x, (24, 20), True)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)


def test_nearest_matches_torch(rng_np):
    x = rng_np.randint(0, 21, size=(1, 13, 17, 1)).astype(np.float32)
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    want = F.interpolate(t, size=(29, 31), mode="nearest").numpy()
    want = np.transpose(want, (0, 2, 3, 1))
    got = np.asarray(resize_nearest(x, (29, 31)))
    np.testing.assert_array_equal(got, want)


def test_rank2_and_rank3_inputs(rng_np):
    x2 = rng_np.randn(6, 6).astype(np.float32)
    out2 = resize_bilinear(x2, (12, 12))
    assert out2.shape == (12, 12)
    x3 = rng_np.randn(6, 6, 3).astype(np.float32)
    out3 = resize_bilinear(x3, (12, 12))
    assert out3.shape == (12, 12, 3)
    np.testing.assert_allclose(np.asarray(out2),
                               np.asarray(out3)[:, :, 0] * 0
                               + np.asarray(resize_bilinear(
                                   x2[:, :, None], (12, 12))[:, :, 0]),
                               rtol=1e-6)
