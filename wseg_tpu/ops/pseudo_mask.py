"""Pseudo-ground-truth construction and the class-balanced mask CE loss.

Pure NHWC ops replacing the loss logic the reference embeds in its models
(reference models/SoftMaxAE.py:29-88).  All branching is elementwise
(jnp.where) so the functions jit/pjit cleanly with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wseg_tpu.ops.resize import resize_bilinear


def pseudo_gtmask(mask, cutoff_top: float = 0.6, cutoff_bkg: float = 0.7,
                  cutoff_low: float = 0.2):
    """Binarise continuous masks into one-hot pseudo ground truth.

    Per class: threshold at ``cutoff * max_xy``, floored at ``cutoff_low``;
    background uses ``cutoff_bkg``.  Pixels claimed by more than one class
    are zeroed (= ambiguous).  (reference models/SoftMaxAE.py:29-50)

    Args:
      mask: (B, H, W, C) continuous masks, channel 0 = background.
    Returns:
      (B, H, W, C) float {0,1} pseudo-GT.
    """
    mask = mask.astype(jnp.float32)
    mask_max = jnp.max(mask, axis=(1, 2), keepdims=True)  # (B,1,1,C)
    c = mask.shape[-1]
    cut = jnp.concatenate(
        [jnp.full((1,), cutoff_bkg, jnp.float32),
         jnp.full((c - 1,), cutoff_top, jnp.float32)])
    thresh = jnp.maximum(mask_max * cut, cutoff_low)
    pseudo = (mask > thresh).astype(jnp.float32)
    ambiguous = jnp.sum(pseudo, axis=-1, keepdims=True) > 1.0
    return jnp.where(ambiguous, 0.0, pseudo)


def balanced_mask_loss_ce(mask_logits, pseudo_gt, gt_labels):
    """Class-balanced cross-entropy against argmax pseudo-GT.

    Semantics (reference models/SoftMaxAE.py:53-88):
      * ``mask_logits`` are bilinearly upscaled (align_corners=True) to the
        pseudo-GT size;
      * per-pixel target = argmax_c pseudo_gt; pixels with no class ignored;
      * per-pixel weight = (N_total - N_class) / (1 + N_total) of its class;
      * a batch row contributes only if its pseudo mask contains exactly
        all GT classes + background.

    Args:
      mask_logits: (B, h, w, C) raw mask logits.
      pseudo_gt:   (B, H, W, C) binary pseudo-GT (stop-gradient upstream).
      gt_labels:   (B, C-1) multi-hot image-level labels (no background).
    Returns:
      (B,) per-sample loss.
    """
    B, H, W, C = pseudo_gt.shape
    logits = resize_bilinear(mask_logits, (H, W), align_corners=True)
    logits = logits.astype(jnp.float32)
    pseudo_gt = pseudo_gt.astype(jnp.float32)

    valid = jnp.sum(pseudo_gt, axis=-1) >= 1.0  # (B,H,W)

    # pseudo_gt has at most one active class per pixel, so the CE against
    # its argmax equals -sum_c pgt_c * log_softmax(logits)_c
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(pseudo_gt * log_probs, axis=-1)  # (B,H,W)

    # class balancing
    num_pixels_per_class = jnp.sum(pseudo_gt, axis=(1, 2))  # (B,C)
    num_pixels_total = jnp.sum(num_pixels_per_class, axis=-1, keepdims=True)
    class_weight = (num_pixels_total - num_pixels_per_class) / (
        1.0 + num_pixels_total)  # (B,C)
    pixel_weight = jnp.einsum("bhwc,bc->bhw", pseudo_gt, class_weight)

    # batch row cancelled unless pseudo mask covers all GT classes + BG
    gt_num_labels = jnp.sum(gt_labels.astype(jnp.float32), axis=-1) + 1.0
    ps_num_labels = jnp.sum((num_pixels_per_class > 0).astype(jnp.float32),
                            axis=-1)
    batch_weight = (gt_num_labels == ps_num_labels).astype(jnp.float32)

    loss_px = jnp.where(valid, pixel_weight * ce, 0.0)
    return batch_weight * jnp.mean(loss_px.reshape(B, -1), axis=-1)
