"""Static-shape bilinear/nearest resize as MXU matmuls.

The reference uses ``F.interpolate(..., align_corners=True)`` throughout the
model (reference models/SoftMaxAE.py:19-22) and ``align_corners=False`` in the
multi-scale merge (reference utils/inference_tools.py:143).  ``jax.image.resize``
only implements half-pixel sampling, so we build the 1-D interpolation
matrices ourselves — which is also the TPU-fast formulation: a separable
resize becomes two dense matmuls that run on the MXU instead of gathers on
the VPU.  Shapes are static, so the matrices are trace-time numpy constants.

Layout: NHWC (TPU-native; channels on the 128-lane minor dimension).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _interp_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """Rows sum to 1; A @ x linearly resamples a length-n_in signal to n_out."""
    A = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1:
        A[:, 0] = 1.0
        return A
    if n_out == 1:
        # both conventions sample the origin for a single output point
        A[0, 0] = 1.0
        return A
    if align_corners:
        src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    else:
        src = (np.arange(n_out, dtype=np.float64) + 0.5) * n_in / n_out - 0.5
        src = np.clip(src, 0.0, n_in - 1)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.clip(i0, 0, n_in - 2)
    frac = src - i0
    A[np.arange(n_out), i0] = (1.0 - frac).astype(np.float32)
    A[np.arange(n_out), i0 + 1] += frac.astype(np.float32)
    return A


@functools.lru_cache(maxsize=256)
def _nearest_index(n_in: int, n_out: int) -> np.ndarray:
    """PIL/PyTorch 'nearest' convention: floor(i * n_in / n_out)."""
    idx = np.floor(np.arange(n_out, dtype=np.float64) * n_in / n_out)
    return np.clip(idx.astype(np.int64), 0, n_in - 1)


def resize_bilinear(x, size, align_corners: bool = True):
    """Bilinear-resize NHWC (or HWC / HW) ``x`` to spatial ``size=(H, W)``.

    Equivalent to ``F.interpolate(mode='bilinear', align_corners=...)`` on the
    same data in NCHW.  Interior math runs in float32 and is cast back to the
    input dtype.
    """
    h_out, w_out = int(size[0]), int(size[1])
    squeeze = []
    if x.ndim == 2:
        x = x[None, :, :, None]
        squeeze = [0, -1]
    elif x.ndim == 3:
        x = x[None]
        squeeze = [0]
    assert x.ndim == 4, "expected NHWC"
    _, h_in, w_in, _ = x.shape
    orig_dtype = x.dtype
    out = x.astype(jnp.float32)
    if h_in != h_out:
        A_h = jnp.asarray(_interp_matrix(h_in, h_out, align_corners))
        out = jnp.einsum("oh,bhwc->bowc", A_h, out)
    if w_in != w_out:
        A_w = jnp.asarray(_interp_matrix(w_in, w_out, align_corners))
        out = jnp.einsum("ow,bhwc->bhoc", A_w, out)
    out = out.astype(orig_dtype)
    if squeeze == [0, -1]:
        out = out[0, :, :, 0]
    elif squeeze == [0]:
        out = out[0]
    return out


def resize_nearest(x, size):
    """Nearest-neighbour resize of NHWC (or HWC / HW) to ``size=(H, W)``."""
    h_out, w_out = int(size[0]), int(size[1])
    squeeze = []
    if x.ndim == 2:
        x = x[None, :, :, None]
        squeeze = [0, -1]
    elif x.ndim == 3:
        x = x[None]
        squeeze = [0]
    _, h_in, w_in, _ = x.shape
    out = x
    if h_in != h_out:
        out = jnp.take(out, jnp.asarray(_nearest_index(h_in, h_out)), axis=1)
    if w_in != w_out:
        out = jnp.take(out, jnp.asarray(_nearest_index(w_in, w_out)), axis=2)
    if squeeze == [0, -1]:
        out = out[0, :, :, 0]
    elif squeeze == [0]:
        out = out[0]
    return out


def rescale_as(x, y, align_corners: bool = True):
    """Resize NHWC ``x`` to the spatial size of NHWC ``y``.

    Mirrors reference models/SoftMaxAE.py:19-22.
    """
    return resize_bilinear(x, (y.shape[1], y.shape[2]), align_corners)


@functools.lru_cache(maxsize=64)
def _adaptive_pool_mask(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bool mask; row i covers [floor(i*n/m), ceil((i+1)*n/m))."""
    starts = (np.arange(n_out) * n_in) // n_out
    ends = -((np.arange(1, n_out + 1) * n_in) // -n_out)  # ceil division
    j = np.arange(n_in)
    return (j[None, :] >= starts[:, None]) & (j[None, :] < ends[:, None])


def adaptive_max_pool(x, size):
    """torch.adaptive_max_pool2d semantics for NHWC input, static shapes."""
    h_out, w_out = int(size[0]), int(size[1])
    _, h_in, w_in, _ = x.shape
    neg = jnp.asarray(-jnp.inf, x.dtype) if jnp.issubdtype(
        x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    if h_in != h_out:
        m = jnp.asarray(_adaptive_pool_mask(h_in, h_out))  # (Ho, Hi)
        x = jnp.max(jnp.where(m[None, :, :, None, None], x[:, None], neg),
                    axis=2)
    if w_in != w_out:
        m = jnp.asarray(_adaptive_pool_mask(w_in, w_out))  # (Wo, Wi)
        x = jnp.max(jnp.where(m[None, None, :, :, None], x[:, :, None], neg),
                    axis=3)
    return x
