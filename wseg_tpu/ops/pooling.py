"""Classification-score pooling ops (nGWP + focal penalty).

Pure functions over NHWC tensors.  Reference formulas:
  * nGWP (normalised global weighted pooling):
      cls_c = sum_xy(logits_c * m_c) / (1 + sum_xy m_c)
    (reference models/SoftMaxAE.py:229)
  * focal penalty:  (1 - m̄_c)^p * log(lambda + m̄_c)
    (reference models/SoftMaxAE.py:25,232)
"""

from __future__ import annotations

import jax.numpy as jnp


def focal_penalty(x, p: float = 3.0, c: float = 0.01):
    """(1-x)^p * log(c + x), elementwise."""
    x = x.astype(jnp.float32)
    return jnp.power(1.0 - x, p) * jnp.log(c + x)


def ngwp_pool(logits, masks):
    """Normalised global weighted pooling.

    Args:
      logits: (B, H, W, C) mask logits.
      masks:  (B, H, W, C) softmax masks (same spatial size).
    Returns:
      (B, C) pooled class scores.
    """
    logits = logits.astype(jnp.float32)
    masks = masks.astype(jnp.float32)
    num = jnp.sum(logits * masks, axis=(1, 2))
    den = 1.0 + jnp.sum(masks, axis=(1, 2))
    return num / den


def ngwp_focal_scores(logits, masks, focal_p: float = 3.0,
                      focal_lambda: float = 0.01):
    """nGWP + focal penalty, dropping the background channel.

    Returns (B, C-1) foreground scores:  cls_1[:,1:] + cls_2[:,1:]
    (reference models/SoftMaxAE.py:229-237; channel 0 is background).
    """
    cls_1 = ngwp_pool(logits, masks)
    m_mean = jnp.mean(masks.astype(jnp.float32), axis=(1, 2))
    cls_2 = focal_penalty(m_mean, focal_p, focal_lambda)
    return cls_1[:, 1:] + cls_2[:, 1:]
