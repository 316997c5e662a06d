"""PAMR — pixel-adaptive mask refinement (lax reference implementation).

Replaces reference models/mods/pamr.py:114-143.  Semantics:

  * the guide image is resized (align_corners=True bilinear) to the mask's
    spatial size; refinement runs at mask resolution;
  * per pixel, 8 neighbours at each dilation in ``dilations`` (default
    [1,2,4,8,12,24] -> 48 taps) are compared to the centre with replicate
    boundary handling;
  * sigma = sample-std (Bessel-corrected, matching torch.std) over the
    9*len(dilations) taps *jointly* (centre included once per dilation);
  * affinity = softmax over the 48 taps of mean_RGB(-|diff| / (1e-8 +
    0.1*sigma));
  * ``num_iter`` Jacobi iterations propagate the mask:
    m <- sum_k aff_k * shift_k(m).

The torch original materialises a (B, C, 48, H, W) tensor per iteration;
here the propagation is a scan whose inner 48-tap multiply-accumulate XLA
fuses into a single VPU loop (and a Pallas kernel in pamr_pallas.py fuses it
explicitly).  Layout NHWC; no gradients flow (callers stop_gradient).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from wseg_tpu.ops.resize import resize_bilinear

DEFAULT_DILATIONS = (1, 2, 4, 8, 12, 24)

# 8-neighbour offsets in (dy, dx) order matching a row-major 3x3 scan with
# the centre removed (the tap ordering only needs to be consistent between
# affinity and propagation).
_OFFSETS = ((-1, -1), (-1, 0), (-1, 1),
            (0, -1), (0, 1),
            (1, -1), (1, 0), (1, 1))


def _shift(padded, pad: int, dy: int, dx: int, h: int, w: int):
    """Static window into an edge-padded NHWC tensor = replicate-pad shift."""
    return padded[:, pad + dy:pad + dy + h, pad + dx:pad + dx + w, :]


def pamr_affinity(im, dilations: Sequence[int] = DEFAULT_DILATIONS):
    """Compute the 8*len(dilations) tap affinity from an NHWC guide image.

    Internally computes in a channels-major (B, K, H, W) layout: TPU pads
    the minor dimension to 128 lanes, so keeping K=3 (or T=48) minor would
    inflate every intermediate by up to 42x in physical memory.

    Args:
      im: (B, H, W, K) guide (RGB) image at mask resolution.
    Returns:
      (B, H, W, T) softmax affinities, T = 8 * len(dilations).
    """
    im = jnp.transpose(im.astype(jnp.float32), (0, 3, 1, 2))  # (B,K,H,W)
    b, k, h, w = im.shape
    pad = max(dilations)
    padded = jnp.pad(im, ((0, 0), (0, 0), (pad, pad), (pad, pad)),
                     mode="edge")

    def shift(dy, dx):
        return padded[:, :, pad + dy:pad + dy + h, pad + dx:pad + dx + w]

    diffs = []  # per tap: (B,K,H,W) centre-minus-neighbour
    neigh = []  # per (dilation, 9-point) tap incl. centre, for the std
    for d in dilations:
        for dy, dx in _OFFSETS:
            n = shift(dy * d, dx * d)
            diffs.append(im - n)
            neigh.append(n)
        neigh.append(im)  # centre tap, once per dilation (torch kernel row 4)

    diffs = jnp.stack(diffs, axis=1)  # (B,T,K,H,W)
    neigh = jnp.stack(neigh, axis=1)  # (B,9D,K,H,W)

    # Bessel-corrected std over all 9*D taps jointly (torch .std(2) default)
    n_taps = neigh.shape[1]
    mean = jnp.mean(neigh, axis=1, keepdims=True)
    var = jnp.sum(jnp.square(neigh - mean), axis=1, keepdims=True) / (
        n_taps - 1)
    std = jnp.sqrt(var)  # (B,1,K,H,W)

    aff = -jnp.abs(diffs) / (1e-8 + 0.1 * std)
    aff = jnp.mean(aff, axis=2)  # mean over colour -> (B,T,H,W)
    aff = jax.nn.softmax(aff, axis=1)
    return jnp.transpose(aff, (0, 2, 3, 1))  # public NHWC contract


def pamr_propagate(aff, mask, dilations: Sequence[int] = DEFAULT_DILATIONS,
                   num_iter: int = 10):
    """Run ``num_iter`` Jacobi propagation steps of ``mask`` under ``aff``.

    Channels-major internally (see :func:`pamr_affinity`): the C=21 minor
    dim would be lane-padded to 128, making every shifted read 6x larger.

    Args:
      aff:  (B, H, W, T) affinities from :func:`pamr_affinity`.
      mask: (B, H, W, C) masks.
    Returns:
      (B, H, W, C) refined masks.
    """
    mask = jnp.transpose(mask.astype(jnp.float32), (0, 3, 1, 2))
    aff_t = jnp.transpose(aff.astype(jnp.float32), (0, 3, 1, 2))
    b, c, h, w = mask.shape
    pad = max(dilations)
    taps = [(dy * d, dx * d) for d in dilations for dy, dx in _OFFSETS]

    def step(m, _):
        padded = jnp.pad(m, ((0, 0), (0, 0), (pad, pad), (pad, pad)),
                         mode="edge")
        acc = jnp.zeros_like(m)
        for t, (dy, dx) in enumerate(taps):
            win = padded[:, :, pad + dy:pad + dy + h,
                         pad + dx:pad + dx + w]
            acc = acc + aff_t[:, t:t + 1] * win
        return acc, None

    out, _ = jax.lax.scan(step, mask, None, length=num_iter)
    return jnp.transpose(out, (0, 2, 3, 1))


def pamr(im, mask, dilations: Sequence[int] = DEFAULT_DILATIONS,
         num_iter: int = 10, impl: str = "lax"):
    """Full PAMR: affinity from ``im`` (resized to mask size) + propagation.

    Mirrors the composition SoftMaxAE.run_pamr -> PAMR.forward
    (reference models/SoftMaxAE.py:176-179, models/mods/pamr.py:124-143).

    Args:
      im:   (B, H, W, 3) raw RGB image (any spatial size).
      mask: (B, h, w, C) masks to refine.
      impl: 'lax' | 'pallas' | 'auto'.
    """
    im = resize_bilinear(im, (mask.shape[1], mask.shape[2]),
                         align_corners=True)
    if impl == "auto":
        # Pallas kernels lower only on TPU; lax path elsewhere.  The
        # backend query is trace-time Python, so 'auto' is resolved when
        # the surrounding jit traces.
        impl = "pallas" if jax.default_backend() == "tpu" else "lax"
    if impl == "pallas":
        from wseg_tpu.ops.pamr_pallas import (
            pamr_affinity_pallas,
            pamr_propagate_pallas,
        )
        aff = pamr_affinity_pallas(im, dilations)
        return pamr_propagate_pallas(aff, mask, dilations, num_iter)
    aff = pamr_affinity(im, dilations)
    return pamr_propagate(aff, mask, dilations, num_iter)
