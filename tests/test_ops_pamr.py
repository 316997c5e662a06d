"""Golden test: PAMR vs an independent torch oracle.

The oracle implements the published PAMR definition (local affinity at
multiple dilations + Jacobi propagation) with torch's replicate padding and
unbiased std, the same semantics as reference models/mods/pamr.py.
"""

import numpy as np
import torch
import torch.nn.functional as F

from wseg_tpu.ops import pamr_affinity, pamr_propagate
from wseg_tpu.ops.pamr import pamr


def _oracle_taps(x_nchw, dilations):
    """Gather neighbour taps with replicate padding.

    Returns (B, K, D*8, H, W) neighbours and (B, K, D*9, H, W) incl centre.
    """
    offsets = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
               (1, -1), (1, 0), (1, 1)]
    B, K, H, W = x_nchw.shape
    neighbours, with_centre = [], []
    for d in dilations:
        xp = F.pad(x_nchw, [d] * 4, mode="replicate")
        block = []
        for dy, dx in offsets:
            n = xp[:, :, d + dy * d:d + dy * d + H,
                   d + dx * d:d + dx * d + W]
            block.append(n)
        neighbours.extend(block)
        with_centre.extend(block)
        with_centre.append(x_nchw)
    return torch.stack(neighbours, 2), torch.stack(with_centre, 2)


def _oracle_pamr(im_nchw, mask_nchw, dilations, num_iter):
    x = im_nchw
    neigh, wc = _oracle_taps(x, dilations)
    std = wc.std(2, keepdim=True)  # unbiased, over all taps jointly
    aff = -(x.unsqueeze(2) - neigh).abs() / (1e-8 + 0.1 * std)
    aff = aff.mean(1, keepdim=True)
    aff = F.softmax(aff, 2)
    mask = mask_nchw
    for _ in range(num_iter):
        m, _ = _oracle_taps(mask, dilations)
        mask = (m * aff).sum(2)
    return mask


def _to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_oracle_taps_equal_dilated_onehot_conv(rng_np):
    """Sanity-check the oracle itself: a neighbour tap must equal a dilated
    conv with a one-hot 3x3 kernel on a replicate-padded input (the PAMR
    paper's formulation)."""
    x = torch.from_numpy(rng_np.rand(1, 1, 12, 12).astype(np.float32))
    d = 4
    neigh, _ = _oracle_taps(x, (d,))
    offsets = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
               (1, -1), (1, 0), (1, 1)]
    xp = F.pad(x, [d] * 4, mode="replicate")
    for t, (dy, dx) in enumerate(offsets):
        k = torch.zeros(1, 1, 3, 3)
        k[0, 0, dy + 1, dx + 1] = 1.0
        want = F.conv2d(xp, k, dilation=d)
        np.testing.assert_allclose(neigh[:, :, t].numpy(), want.numpy(),
                                   rtol=1e-6)


def test_affinity_matches_oracle(rng_np):
    dil = (1, 2, 4)
    im = rng_np.rand(2, 3, 17, 19).astype(np.float32)
    neigh, wc = _oracle_taps(torch.from_numpy(im), dil)
    std = wc.std(2, keepdim=True)
    aff = -(torch.from_numpy(im).unsqueeze(2) - neigh).abs() / (
        1e-8 + 0.1 * std)
    aff = F.softmax(aff.mean(1, keepdim=True), 2)[:, 0]  # (B,T,H,W)
    want = np.transpose(aff.numpy(), (0, 2, 3, 1))
    got = np.asarray(pamr_affinity(_to_nhwc(im), dil))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_full_pamr_matches_oracle(rng_np):
    dil = (1, 2, 4, 8)
    num_iter = 5
    im = rng_np.rand(2, 3, 24, 24).astype(np.float32)
    mask = rng_np.rand(2, 21, 24, 24).astype(np.float32)
    mask = mask / mask.sum(1, keepdims=True)

    want = _oracle_pamr(torch.from_numpy(im), torch.from_numpy(mask),
                        dil, num_iter).numpy()
    aff = pamr_affinity(_to_nhwc(im), dil)
    got = np.asarray(pamr_propagate(aff, _to_nhwc(mask), dil, num_iter))
    np.testing.assert_allclose(got, _to_nhwc(want), rtol=2e-3, atol=2e-5)


def test_pamr_wrapper_resizes_guide(rng_np):
    # full-res image guides a low-res mask: wrapper must downsample the guide
    im = rng_np.rand(1, 64, 64, 3).astype(np.float32)
    mask = rng_np.rand(1, 16, 16, 21).astype(np.float32)
    out = pamr(im, mask, dilations=(1, 2), num_iter=3, impl="lax")
    assert out.shape == mask.shape
    # propagation is an affinity-weighted average: per-pixel simplex masses
    # stay bounded by the input's range
    assert float(np.max(out)) <= float(np.max(mask)) + 1e-5
    assert float(np.min(out)) >= float(np.min(mask)) - 1e-5
