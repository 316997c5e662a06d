"""Functional loss layer.

Replaces the reference's losses/__init__.py plus the loss logic embedded in
model forwards.  Everything is a pure function over NHWC tensors returning
per-sample values; reductions happen in the trainer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wseg_tpu.ops.pseudo_mask import balanced_mask_loss_ce, pseudo_gtmask
from wseg_tpu.ops.resize import resize_bilinear


def multilabel_soft_margin_loss(logits, targets):
    """torch.nn.MultiLabelSoftMarginLoss semantics, per-sample.

    loss_b = -mean_c [ y log sigma(x) + (1-y) log sigma(-x) ]
    (the reference's default criterion, cfg.NET.LOSS='SoftMargin').
    """
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -jnp.mean(targets * log_p + (1.0 - targets) * log_not_p, axis=-1)


def multilabel_hinge_loss(logits, targets):
    """torch.nn.functional.multilabel_margin_loss over multi-hot targets.

    For each sample: sum over (positive i, negative j) pairs of
    max(0, 1 - (x_i - x_j)) / C.  (reference losses/__init__.py:6-17
    converts {0,1} targets to index form before calling torch's op; the
    pairwise definition below is equivalent.)
    """
    x = logits.astype(jnp.float32)
    y = targets.astype(jnp.float32)
    c = x.shape[-1]
    pos = y[:, :, None]          # (B, C, 1) indicator for i
    neg = (1.0 - y)[:, None, :]  # (B, 1, C) indicator for j
    margin = jnp.maximum(0.0, 1.0 - (x[:, :, None] - x[:, None, :]))
    return jnp.sum(margin * pos * neg, axis=(1, 2)) / c


def get_criterion(loss_name: str):
    losses = {
        "SoftMargin": multilabel_soft_margin_loss,
        "Hinge": multilabel_hinge_loss,
    }
    return losses[loss_name]


def mask_loss_ce(mask_logits, pseudo_gt, ignore_all_zero: bool = True):
    """Plain (unbalanced) CE against argmax pseudo-GT
    (reference losses/__init__.py:31-45)."""
    B, H, W, C = pseudo_gt.shape
    logits = resize_bilinear(mask_logits, (H, W), align_corners=True)
    logits = logits.astype(jnp.float32)
    pseudo_gt = pseudo_gt.astype(jnp.float32)
    valid = jnp.sum(pseudo_gt, axis=-1) >= 1.0
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(pseudo_gt * log_probs, axis=-1)
    ce = jnp.where(valid, ce, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.sum(ce) / denom


def segmentation_ce_loss(logits, target, ignore_index: int = 255):
    """Pixel CE with ignore label (reference losses/__init__.py:64-77
    SegmentationLosses.CrossEntropyLoss; kept for inventory parity).

    Args: logits (B, H, W, C); target (B, H, W) int.
    """
    logits = logits.astype(jnp.float32)
    valid = target != ignore_index
    tgt = jnp.where(valid, target, 0)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(log_probs, tgt[..., None], axis=-1)[..., 0]
    ce = jnp.where(valid, ce, 0.0)
    return jnp.sum(ce) / jnp.maximum(jnp.sum(valid), 1)


def segmentation_focal_loss(logits, target, gamma: float = 2.0,
                            alpha: float = 0.5, ignore_index: int = 255):
    """Focal variant (reference losses/__init__.py:79-95)."""
    logpt = -segmentation_ce_loss(logits, target, ignore_index)
    pt = jnp.exp(logpt)
    if alpha is not None:
        logpt = logpt * alpha
    return -jnp.power(1.0 - pt, gamma) * logpt


def attention_loss(attn_map):
    """L2 penalty on the SA softmax map: sum over positions of a^2
    (reference models/CAM_SA.py:116)."""
    return jnp.sum(jnp.square(attn_map.astype(jnp.float32)), axis=-1)


def self_supervision_loss(mask_logits, masks_dec, gt_labels):
    """pseudo-GT construction + class-balanced CE, with stop-gradient.

    Mirrors the tail of every PAMR-refined forward (e.g. reference
    models/SoftMaxAE.py:257-259).  Returns (per-sample loss (B,), pseudo_gt).
    """
    pseudo_gt = jax.lax.stop_gradient(pseudo_gtmask(masks_dec))
    loss = balanced_mask_loss_ce(mask_logits, pseudo_gt, gt_labels)
    return loss, pseudo_gt
