"""Golden tests for pooling / pseudo-GT / balanced CE / stochastic gate.

Oracles are independent torch implementations of the published formulas
(written from the paper's definitions, executed on CPU).
"""

import jax
import numpy as np
import torch
import torch.nn.functional as F

from wseg_tpu.ops import (
    balanced_mask_loss_ce,
    focal_penalty,
    ngwp_focal_scores,
    ngwp_pool,
    pseudo_gtmask,
)
from wseg_tpu.ops.sg import stochastic_gate


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def test_ngwp_and_focal(rng_np):
    B, H, W, C = 2, 9, 11, 21
    logits = rng_np.randn(B, H, W, C).astype(np.float32)
    masks = rng_np.rand(B, H, W, C).astype(np.float32)

    # oracle
    lt = _nchw(logits).reshape(B, C, -1)
    mt = _nchw(masks).reshape(B, C, -1)
    cls1 = (lt * mt).sum(-1) / (1.0 + mt.sum(-1))
    np.testing.assert_allclose(np.asarray(ngwp_pool(logits, masks)),
                               cls1.numpy(), rtol=1e-5, atol=1e-5)

    p, lam = 3.0, 0.01
    cls2 = torch.pow(1 - mt.mean(-1), p) * torch.log(lam + mt.mean(-1))
    want = (cls1 + cls2)[:, 1:].numpy()
    got = np.asarray(ngwp_focal_scores(logits, masks, p, lam))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    x = rng_np.rand(5).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(focal_penalty(x, 2.0, 0.1)),
        np.power(1 - x, 2.0) * np.log(0.1 + x), rtol=1e-6)


def _oracle_pseudo_gtmask(mask_nhwc, cutoff_top=0.6, cutoff_bkg=0.7,
                          cutoff_low=0.2):
    m = _nchw(mask_nhwc)
    bs, c, h, w = m.shape
    m = m.reshape(bs, c, -1)
    mx = m.max(-1, keepdim=True)[0].clone()
    mx[:, :1] *= cutoff_bkg
    mx[:, 1:] *= cutoff_top
    mx = torch.maximum(mx, torch.tensor(cutoff_low))
    pg = (m > mx).float()
    amb = (pg.sum(1, keepdim=True) > 1).float()
    pg = (1 - amb) * pg
    return np.transpose(pg.reshape(bs, c, h, w).numpy(), (0, 2, 3, 1))


def test_pseudo_gtmask(rng_np):
    mask = rng_np.rand(3, 8, 8, 21).astype(np.float32)
    want = _oracle_pseudo_gtmask(mask)
    got = np.asarray(pseudo_gtmask(mask))
    np.testing.assert_array_equal(got, want)
    # every pixel has at most one active class
    assert np.all(got.sum(-1) <= 1)


def _oracle_balanced_ce(mask_logits, pseudo_gt, gt_labels):
    mask = _nchw(mask_logits)
    pgt = _nchw(pseudo_gt)
    gl = torch.from_numpy(gt_labels)
    mask = F.interpolate(mask, size=pgt.shape[-2:], mode="bilinear",
                         align_corners=True)
    mask_gt = torch.argmax(pgt, 1)
    ignore = pgt.sum(1) < 1.0
    mask_gt[ignore] = 255
    bs, c, h, w = pgt.shape
    npix = pgt.reshape(bs, c, -1).sum(-1)
    ntot = npix.sum(-1, keepdim=True)
    cw = (ntot - npix) / (1 + ntot)
    cw = (pgt * cw[:, :, None, None]).sum(1).reshape(bs, -1)
    loss = F.cross_entropy(mask, mask_gt, ignore_index=255,
                           reduction="none").reshape(bs, -1)
    gt_n = gl.sum(-1) + 1
    ps_n = (npix > 0).float().sum(-1)
    bw = (gt_n == ps_n).float()
    return (bw * (cw * loss).mean(-1)).numpy()


def test_balanced_mask_loss_ce(rng_np):
    B, h, w, H, W, C = 4, 6, 6, 24, 24, 21
    logits = rng_np.randn(B, h, w, C).astype(np.float32)
    # realistic pseudo-GT from random soft masks
    soft = rng_np.rand(B, H, W, C).astype(np.float32) ** 4
    pgt = np.asarray(pseudo_gtmask(soft))
    # labels that match the pseudo mask for some rows, not others
    labels = np.zeros((B, C - 1), np.float32)
    for b in range(B):
        present = np.unique(np.argmax(pgt[b], -1)[pgt[b].sum(-1) > 0])
        present = present[present > 0]
        labels[b, present - 1] = 1.0
    want = _oracle_balanced_ce(logits, pgt, labels)
    got = np.asarray(balanced_mask_loss_ce(logits, pgt, labels))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert got.shape == (B,)


def test_stochastic_gate():
    rng = jax.random.PRNGKey(0)
    x1 = np.full((1, 16, 16, 8), 2.0, np.float32)
    x2 = np.full((1, 16, 16, 8), -1.0, np.float32)
    # eval: deterministic blend
    out = stochastic_gate(x1, x2, psi=0.3, train=False)
    np.testing.assert_allclose(np.asarray(out), 0.7 * 2.0 + 0.3 * -1.0,
                               rtol=1e-6)
    # train: values are either corrected-deep or shallow; mean ~ x1
    out = np.asarray(stochastic_gate(x1, x2, psi=0.3, train=True, rng=rng))
    corrected = (np.float32(2.0) - np.float32(0.3) * np.float32(-1.0)) / (
        np.float32(1.0) - np.float32(0.3))
    near_deep = np.isclose(out, corrected, atol=1e-4)
    near_shallow = np.isclose(out, -1.0, atol=1e-4)
    assert np.all(near_deep | near_shallow)
    assert abs(out.mean() - 2.0) < 0.25
