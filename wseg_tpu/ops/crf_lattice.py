"""Exact permutohedral-lattice CRF on device.

The reference's +CRF headline numbers come from pydensecrf's exact
permutohedral lattice (reference utils/dcrf.py:6-21).  ops/crf.py
approximates the bilateral kernel with a sparse tap grid (0.85-0.97%
argmax deviation at production geometry, docs/PARITY.md); this module
removes the approximation: the SAME splat -> blur -> slice arithmetic as
native/densecrf/permutohedral.cc, with the lattice hash build on the
host (the one data-dependent, vectorisation-hostile step) and every
mean-field iteration on the TPU.

Design (see tools/bench_scatter2.py): XLA:TPU gather/scatter costs
~5-17 ns PER ROW regardless of row width, dtype, or index order, so the
naive scatter formulation runs ~320 ms/img at the 384x512 canvas.  The
fast path here re-expresses splat/blur/slice as chunked one-hot matmuls
on the MXU:

* contributions sorted by destination lattice id have a GUARANTEED
  destination window < chunk size (every lattice id receives at least
  one splat contribution — it was created by one), so each chunk is a
  dense (K, R) one-hot times (K, C) values matmul into a sliding
  (R, C) window of the lattice;
* with lattice ids assigned in lexicographic key order, the blur
  neighbour maps are monotone partial injections (adding the constant
  axis offset preserves lexicographic order), so each K-run of
  destinations reads a bounded source window (host-measured, padded to
  a bucket);
* slice reuses the id-sorted windows transposed.

Tables are fixed per image; only Q changes across the t mean-field
iterations.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


class LatticeTables(NamedTuple):
    """Per-image lattice tables, padded to static shapes.

    ``offsets``/``bary``: (N, d+1) int32/f32 — splat/slice targets and
    weights; padded pixels carry ``m_pad`` (the zero slot) and weight 0.
    ``nbr``: (d+1, m_pad, 2) int32 — blur neighbours, missing/padded
    encoded as ``m_pad``.
    ``n_valid``: () int32 — actual lattice points (<= m_pad).
    """
    offsets: jax.Array
    bary: jax.Array
    nbr: jax.Array
    n_valid: jax.Array

    @property
    def d(self) -> int:
        return self.offsets.shape[-1] - 1

    @property
    def m_pad(self) -> int:
        return self.nbr.shape[-2]


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def m_bucket(m: int, quantum: int = 16384) -> int:
    """Static lattice-capacity bucket (limits program count)."""
    return round_up(max(m, 1), quantum)


def build_tables_host(features: np.ndarray, m_pad: int | None = None,
                      quantum: int = 16384) -> LatticeTables:
    """Host lattice build (native C++ hash) -> padded device tables.

    ``features``: (N, d) float32, already divided by the kernel sigmas
    (native/densecrf/densecrf.cc:57-69).
    """
    from wseg_tpu.ops.crf_native import build_lattice_tables
    off, bary, nbr, m = build_lattice_tables(
        np.ascontiguousarray(features, np.float32))
    d1 = off.shape[1]
    if m_pad is None:
        m_pad = m_bucket(m, quantum)
    assert m <= m_pad, (m, m_pad)
    # remap the "missing neighbour" sentinel m -> m_pad (zero slot) and
    # pad the neighbour table with zero-slot rows
    nbr = np.where(nbr == m, m_pad, nbr)
    if m < m_pad:
        pad = np.full((d1, m_pad - m, 2), m_pad, np.int32)
        nbr = np.concatenate([nbr, pad], axis=1)
    return LatticeTables(jnp.asarray(off), jnp.asarray(bary),
                         jnp.asarray(nbr), jnp.asarray(m, jnp.int32))


def paste_window_tables(tables: LatticeTables, window, canvas_hw,
                        win_hw) -> LatticeTables:
    """Embed window-built tables into a padded canvas pixel order.

    The device postprocess runs at a static merge-canvas shape with the
    real image occupying ``window`` = (y0, x0, h, w); lattice tables are
    built over the h*w window pixels only.  Canvas pixels outside the
    window splat/slice with weight 0 into the zero slot, which keeps
    them exactly inert (permutohedral.cc never sees them).
    """
    y0, x0, h, w = (int(v) for v in window)
    Hc, Wc = (int(v) for v in canvas_hw)
    hw_h, hw_w = (int(v) for v in win_hw)
    assert (h, w) == (hw_h, hw_w)
    d1 = tables.offsets.shape[-1]
    m_pad = tables.m_pad
    off = np.full((Hc, Wc, d1), m_pad, np.int32)
    bar = np.zeros((Hc, Wc, d1), np.float32)
    off[y0:y0 + h, x0:x0 + w] = np.asarray(tables.offsets).reshape(
        h, w, d1)
    bar[y0:y0 + h, x0:x0 + w] = np.asarray(tables.bary).reshape(h, w, d1)
    return LatticeTables(jnp.asarray(off.reshape(-1, d1)),
                         jnp.asarray(bar.reshape(-1, d1)),
                         tables.nbr, tables.n_valid)


def bilateral_features(img_rgb: np.ndarray, sxy: float,
                       srgb: float) -> np.ndarray:
    """(H, W, 3) uint8 -> (H*W, 5) float32 bilateral lattice features
    (densecrf.cc:64-68)."""
    H, W, _ = img_rgb.shape
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    f = np.empty((H, W, 5), np.float32)
    f[..., 0] = x / sxy
    f[..., 1] = y / sxy
    f[..., 2:] = img_rgb.astype(np.float32) / srgb
    return f.reshape(-1, 5)


def gaussian_features(hw, sxy: float) -> np.ndarray:
    """(h, w) -> (h*w, 2) float32 spatial lattice features
    (densecrf.cc:62-63).  Image-independent: cache per (h, w, sxy)."""
    h, w = hw
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    f = np.stack([x / sxy, y / sxy], axis=-1)
    return f.reshape(-1, 2)


@functools.lru_cache(maxsize=64)
def _gaussian_tables_cached(h: int, w: int, sxy: float) -> LatticeTables:
    return build_tables_host(gaussian_features((h, w), sxy))


def gaussian_tables(hw, sxy: float) -> LatticeTables:
    return _gaussian_tables_cached(int(hw[0]), int(hw[1]), float(sxy))


# --------------------------------------------------------------- filter
def lattice_filter(values: jax.Array, tables: LatticeTables) -> jax.Array:
    """Exact permutohedral filter: values (N, C) -> (N, C).

    Mirrors native/densecrf/permutohedral.cc::compute — splat with
    barycentric weights, [1, 2, 1]/2 blur along each of the d+1 lattice
    axes, slice with the 1/(1 + 2^-d) gain correction.  v1: row-wise XLA
    scatter/gather formulation (correct but per-row-cost bound; the
    matmul formulation replaces it for production, see module
    docstring).
    """
    off, bary, nbr = tables.offsets, tables.bary, tables.nbr
    d1 = off.shape[-1]
    m_pad = tables.m_pad
    C = values.shape[-1]

    # splat (zero slot at m_pad absorbs padded-pixel contributions)
    lat = jnp.zeros((m_pad + 1, C), values.dtype)
    for r in range(d1):
        lat = lat.at[off[:, r]].add(bary[:, r, None] * values)

    # blur: sequential over axes; the zero slot never updates
    for j in range(d1):
        body = lat[:m_pad]
        n1 = jnp.take(lat, nbr[j, :, 0], axis=0)
        n2 = jnp.take(lat, nbr[j, :, 1], axis=0)
        lat = jnp.concatenate(
            [body + 0.5 * (n1 + n2), lat[m_pad:]], axis=0)

    # slice
    alpha = 1.0 / (1.0 + 2.0 ** -(d1 - 1))
    out = jnp.zeros_like(values)
    for r in range(d1):
        out = out + bary[:, r, None] * jnp.take(lat, off[:, r], axis=0)
    return alpha * out


def kernel_norm(tables: LatticeTables, n_pix: int) -> jax.Array:
    """Symmetric normalisation 1/sqrt(K(1)) per pixel (densecrf.cc:34-40).
    Padded pixels (weight-0 tables) get norm 0 so they stay inert."""
    ones = jnp.ones((n_pix, 1), jnp.float32)
    k1 = lattice_filter(ones, tables)[:, 0]
    return jnp.where(k1 > 1e-20, jax.lax.rsqrt(jnp.maximum(k1, 1e-20)),
                     0.0)


def crf_inference_lattice(probs: jax.Array, tables_g: LatticeTables,
                          tables_b: LatticeTables, t: int = 10,
                          compat_gaussian: float = 3.0,
                          compat_bilateral: float = 10.0) -> jax.Array:
    """Exact mean-field dense CRF for one image.

    ``probs``: (H, W, C) float32 softmax output (padded canvas pixels
    may hold anything — the weight-0 tables zero their effect).
    Matches native/densecrf/densecrf.cc::wseg_densecrf_inference: unary
    from -log(p), symmetric kernel normalisation, Potts update with the
    self term included, softmax each iteration.
    """
    H, W, C = probs.shape
    N = H * W
    p = probs.reshape(N, C).astype(jnp.float32)

    norm_g = kernel_norm(tables_g, N)[:, None]
    norm_b = kernel_norm(tables_b, N)[:, None]

    unary = -jnp.log(jnp.maximum(p, 1e-8))

    def body(Q, _):
        mg = lattice_filter(Q * norm_g, tables_g) * norm_g
        mb = lattice_filter(Q * norm_b, tables_b) * norm_b
        logit = -unary + compat_gaussian * mg + compat_bilateral * mb
        return jax.nn.softmax(logit, axis=-1), None

    Q, _ = jax.lax.scan(body, p, None, length=t)
    return Q.reshape(H, W, C)
