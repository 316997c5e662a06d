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
    splat: "SortedSplat | None" = None

    @property
    def d(self) -> int:
        return self.offsets.shape[-1] - 1

    @property
    def m_pad(self) -> int:
        return self.nbr.shape[-2]


@jax.tree_util.register_pytree_node_class
class SortedSplat:
    """Chunked dst-sorted contribution tables for the matmul splat.

    Every lattice id receives >= 1 contribution (it was created by one),
    so K consecutive dst-sorted contributions span < K lattice ids — each
    chunk accumulates into a bounded [lo, lo+R) window via one one-hot
    matmul on the MXU instead of a per-row scatter (XLA:TPU scatter-add
    costs ~15 ns/row in every formulation, tools/bench_scatter3.py).

    ``pix``/``w``/``dst``: (nc, K) contribution source pixel / weight /
    destination id; tail padded with weight-0 copies of the last real
    destination.  ``lo``: (nc,) window starts (8-aligned).  ``r_win``:
    static window size (bucketed max chunk spread) — pytree aux data so
    jit sees it as a compile-time constant.
    """

    def __init__(self, pix, w, dst, lo, r_win: int):
        self.pix, self.w, self.dst, self.lo = pix, w, dst, lo
        self.r_win = int(r_win)

    def tree_flatten(self):
        return (self.pix, self.w, self.dst, self.lo), self.r_win

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, r_win=aux)


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def m_bucket(m: int, quantum: int = 16384) -> int:
    """Static lattice-capacity bucket (limits program count)."""
    return round_up(max(m, 1), quantum)


def build_tables_host(features: np.ndarray, m_pad: int | None = None,
                      quantum: int = 16384,
                      sorted_splat: bool = False,
                      chunk: int = 2048) -> LatticeTables:
    """Host lattice build (native C++ hash) -> padded device tables.

    ``features``: (N, d) float32, already divided by the kernel sigmas
    (native/densecrf/densecrf.cc:57-69).  ``sorted_splat`` additionally
    builds the chunked matmul-splat tables (the fast device path).
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
    sp = build_sorted_splat(off, bary, m, chunk) if sorted_splat else None
    return LatticeTables(jnp.asarray(off), jnp.asarray(bary),
                         jnp.asarray(nbr), jnp.asarray(m, jnp.int32), sp)


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
    off = off.reshape(-1, d1)
    bar = bar.reshape(-1, d1)
    sp = None
    if tables.splat is not None:
        chunk = tables.splat.pix.shape[1]
        sp = build_sorted_splat(off, bar, int(tables.n_valid), chunk)
    return LatticeTables(jnp.asarray(off), jnp.asarray(bar),
                         tables.nbr, tables.n_valid, sp)


def build_sorted_splat(offsets: np.ndarray, bary: np.ndarray,
                       m_valid: int, chunk: int = 2048,
                       r_quantum: int = 256) -> SortedSplat:
    """Sort splat contributions by destination and chunk them for the
    one-hot matmul accumulate (see :class:`SortedSplat`).

    Zero-weight contributions (padded canvas pixels) are retargeted to
    the last real lattice id so the padded tail cannot blow up the last
    chunk's window (their weight keeps them exactly inert).
    """
    E = offsets.size
    d1 = offsets.shape[1]
    flat = offsets.reshape(-1).astype(np.int32)
    wf = bary.reshape(-1).astype(np.float32)
    flat = np.where(wf == 0.0, np.int32(max(m_valid - 1, 0)), flat)
    order = np.argsort(flat, kind="stable")
    sdst = flat[order]
    spix = (order // d1).astype(np.int32)
    sw = wf[order]

    nc = -(-E // chunk)
    pad = nc * chunk - E
    if pad:
        sdst = np.concatenate([sdst, np.full(pad, sdst[-1], np.int32)])
        spix = np.concatenate([spix, np.zeros(pad, np.int32)])
        sw = np.concatenate([sw, np.zeros(pad, np.float32)])
    sdst = sdst.reshape(nc, chunk)
    spix = spix.reshape(nc, chunk)
    sw = sw.reshape(nc, chunk)
    lo = (sdst[:, 0] // 8 * 8).astype(np.int32)
    spread = int((sdst[:, -1] - lo).max()) + 1
    r_win = round_up(spread, r_quantum)
    return SortedSplat(jnp.asarray(spix), jnp.asarray(sw),
                       jnp.asarray(sdst), jnp.asarray(lo), r_win)


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
def _gaussian_tables_cached(h: int, w: int, sxy: float,
                            sorted_splat: bool) -> LatticeTables:
    return build_tables_host(gaussian_features((h, w), sxy),
                             sorted_splat=sorted_splat)


def gaussian_tables(hw, sxy: float,
                    sorted_splat: bool = False) -> LatticeTables:
    return _gaussian_tables_cached(int(hw[0]), int(hw[1]), float(sxy),
                                   bool(sorted_splat))


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
    N, C = values.shape

    if tables.splat is not None:
        sp = tables.splat
        R = sp.r_win
        nc, K = sp.pix.shape
        # one fused gather of source rows in dst-sorted order (per-row
        # cost bottoms out at ~4.6 ns/row only for large single gathers,
        # tools/bench_scatter3.py), then batched one-hot matmuls produce
        # per-chunk (R, C) window blocks on the MXU; a final scatter-add
        # of nc*R block rows (K/R-fold fewer rows than the naive splat)
        # assembles the lattice.  Grouped lax.map keeps the materialised
        # one-hots bounded (~64 MB per group).
        upd = (sp.w.reshape(-1)[:, None] *
               jnp.take(values, sp.pix.reshape(-1), axis=0))
        upd = upd.reshape(nc, K, C)
        iot = jnp.arange(R, dtype=jnp.int32)

        group = max(1, min(nc, (64 * 1024 * 1024) // (K * R * 4)))
        while nc % group:
            group -= 1

        def blocks_fn(args):
            dst, lo, u = args  # (g, K), (g,), (g, K, C)
            # f32 one-hots keep the filter bit-comparable to the native
            # oracle (bf16 updates would round w*Q to 8 mantissa bits);
            # the FLOPs here are negligible either way
            oh = (dst[:, :, None] - lo[:, None, None]
                  == iot[None, None, :]).astype(values.dtype)
            return jax.lax.dot_general(
                oh, u, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (g, R, C)

        blocks = jax.lax.map(
            blocks_fn, (sp.dst.reshape(-1, group, K),
                        sp.lo.reshape(-1, group),
                        upd.reshape(-1, group, K, C)))
        rows = blocks.reshape(nc * R, C).astype(values.dtype)
        idx = (sp.lo[:, None] + iot[None, :]).reshape(-1)
        lat = jnp.zeros((m_pad + R, C), values.dtype).at[idx].add(rows)
        # zero slot for missing blur neighbours lives at m_pad
        lat = jnp.concatenate(
            [lat[:m_pad], jnp.zeros((1, C), values.dtype)], axis=0)
    else:
        # row-wise scatter fallback (v1): zero slot at m_pad absorbs
        # padded-pixel contributions
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

    # slice: one fused gather + weighted per-vertex sum
    alpha = 1.0 / (1.0 + 2.0 ** -(d1 - 1))
    g = jnp.take(lat, off.reshape(-1), axis=0).reshape(N, d1, C)
    out = jnp.einsum("nr,nrc->nc", bary, g)
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
