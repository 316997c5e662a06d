"""Exact permutohedral CRF as windowed multi-hot matmuls (Pallas).

The v2 exact device CRF (ops/crf_lattice.py) is row-op bound: XLA
gather/scatter costs 4-17 ns/row and the mean-field needs ~4M gathered
rows per iteration -> ~265 ms/img at the 384x512/C21/t10 production
geometry.  This module removes every per-row op from the iteration:

* pixels are visited in row-major chunks of K; lattice ids are
  renumbered by FIRST TOUCH under that scan, so each chunk's vertices
  fall into a bounded id window (measured: bilateral ~1.8k eff, spatial
  ~0.7k at production geometry);
* splat and slice both become block matmuls against a per-chunk
  MULTI-HOT matrix ``oh`` (K, R0): row p holds the pixel's d+1
  barycentric weights at the lane offsets of its vertices.  splat is
  ``oh^T @ q`` into a [lo, lo+R0) window of the lattice, slice is
  ``oh @ lat[lo:lo+R0]`` — contraction over PIXELS, i.e. 6x fewer
  matmul rows than per-contribution formulations;
* the [1, 2, 1]/2 lattice blur per axis is the same gather kernel with
  a (center=1, n1=0.5, n2=0.5) multi-hot over lattice rows;
* chunks whose window exceeds R0 get several blocks (multi-window),
  so the static R0 stays small while outlier chunks still work;
* f32 faithfulness at bf16 matmul cost: values are packed as three
  bf16 planes [hi | lo | lo2] in one 128-lane row (21*3 = 63 lanes).
  bf16 x bf16 products are exact in the f32 MXU accumulator, so the
  recombined sum carries ~2^-25 value error; the barycentric weights
  ride in the multi-hot as bf16 (2^-17 relative), bounding the filter
  output at ~1e-5 relative error — the strict f32 path in
  crf_lattice.py remains the bit-grade oracle.

Matches native/densecrf (reference utils/dcrf.py:6-21 semantics); the
lattice hash build stays on the host (crf_native).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D_PAD = 8          # vertex slots per pixel (d+1 <= 8 padded)
DEF_K = 256        # pixels per chunk
DEF_R0 = 256       # window rows per block
DEF_KM = 256       # lattice rows per blur chunk


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.tree_util.register_pytree_node_class
class HotSpec:
    """Block tables for one windowed multi-hot matmul family.

    ``ids``/``w``: (nc, K, D_PAD) int32/f32 — renumbered target ids and
    weights per source row (pixels for splat/slice, lattice rows for
    blur); padding entries carry a sentinel id beyond every window and
    weight 0.  ``blk_c``/``blk_lo``/``blk_first``: (B,) int32 — chunk,
    8-aligned window start, and first-block-of-chunk flag per block.
    ``r0`` (static): window rows.
    """

    def __init__(self, ids, w, blk_c, blk_lo, blk_first, r0: int):
        self.ids, self.w = ids, w
        self.blk_c, self.blk_lo, self.blk_first = blk_c, blk_lo, blk_first
        self.r0 = int(r0)

    def tree_flatten(self):
        return ((self.ids, self.w, self.blk_c, self.blk_lo,
                 self.blk_first), self.r0)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, r0=aux)


@jax.tree_util.register_pytree_node_class
class MMLattice:
    """One kernel's lattice as multi-hot block tables.

    ``pix``: pixel<->lattice HotSpec (splat uses it transposed, slice
    straight).  ``blur``: one lattice->lattice HotSpec per axis, center
    included at weight 1.  ``m_lat`` (static): lattice rows incl. the
    window slack; ``d1`` (static): d+1 (slice gain 1/(1+2^-d)).
    """

    def __init__(self, pix: HotSpec, blur: tuple, m_lat: int, d1: int,
                 perm=None):
        self.pix, self.blur = pix, tuple(blur)
        self.m_lat, self.d1 = int(m_lat), int(d1)
        self.perm = perm

    def tree_flatten(self):
        return ((self.pix, self.blur, self.perm), (self.m_lat, self.d1))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux, perm=children[2])

    @property
    def alpha(self) -> float:
        return 1.0 / (1.0 + 2.0 ** -(self.d1 - 1))


# ------------------------------------------------------------- host build
def _chunk_blocks(ids, w, K, R0, m_lat, blk_quantum, D=D_PAD):
    """ids/w (rows, D) -> HotSpec with rows chunked by K.

    Each chunk's weighted ids are covered by GREEDY 16-aligned R0
    windows (sort the chunk's ids; start a window at the first
    uncovered id) — ids far from the chunk's main cluster cost one
    extra block instead of a contiguous [min, max] sweep.  Out-of-
    window ids simply never match the kernel's iota, so any cover
    works.  Block list padded to ``blk_quantum`` with inert blocks
    whose window [m_lat - R0, m_lat) only ever reads/writes zero rows.
    """
    rows = ids.shape[0]
    nc = rows // K
    idc = ids.reshape(nc, K, D)
    wc = w.reshape(nc, K, D)
    masked = np.where(wc != 0.0, idc, np.int64(2 ** 62))
    srt = np.sort(masked.reshape(nc, -1), axis=1)
    blk_c, blk_lo, blk_first = [], [], []
    for c in range(nc):
        row = srt[c]
        row = row[row < 2 ** 62]
        if len(row) == 0:
            blk_c.append(c)
            blk_lo.append(m_lat - R0)
            blk_first.append(1)
            continue
        j, first = 0, 1
        while j < len(row):
            start = int(row[j]) // 16 * 16
            blk_c.append(c)
            blk_lo.append(start)
            blk_first.append(first)
            first = 0
            j = int(np.searchsorted(row, start + R0))
    B = len(blk_c)
    blk_c = np.asarray(blk_c, np.int32)
    blk_lo = np.asarray(blk_lo, np.int32)
    blk_first = np.asarray(blk_first, np.int32)
    Bp = _round_up(max(B, 1), blk_quantum)
    if Bp > B:
        pad = Bp - B
        blk_c = np.concatenate([blk_c, np.full(pad, nc - 1, np.int32)])
        blk_lo = np.concatenate(
            [blk_lo, np.full(pad, m_lat - R0, np.int32)])
        blk_first = np.concatenate([blk_first, np.zeros(pad, np.int32)])
    assert int(blk_lo.max()) + R0 <= m_lat
    return HotSpec(jnp.asarray(idc.astype(np.int32)),
                   jnp.asarray(wc.astype(np.float32)),
                   jnp.asarray(blk_c), jnp.asarray(blk_lo),
                   jnp.asarray(blk_first), R0)


def tile_perm(h: int, w: int, b: int = 32) -> np.ndarray:
    """Pixel visit order grouped in b x b tiles (raster within/between).

    Bilateral lattice ids of nearby pixels cluster; tiling the chunk
    scan shrinks each chunk's id spread ~2.3x vs raster rows at
    production geometry (measured), which is the mm formulation's cost.
    """
    y, x = np.mgrid[0:h, 0:w]
    key = ((y // b).astype(np.int64) * (w // b + 2) + (x // b)) \
        * (b * b) + (y % b).astype(np.int64) * b + (x % b)
    return np.argsort(key.reshape(-1), kind="stable")


def build_mm_lattice(features: np.ndarray, n_pix: int | None = None,
                     valid_mask: np.ndarray | None = None,
                     perm: np.ndarray | None = None,
                     K: int = DEF_K, R0: int = DEF_R0, Km: int = DEF_KM,
                     blk_quantum: int = 256,
                     blur_quantum: int = 64) -> MMLattice:
    """Host lattice build (native C++) -> multi-hot block tables.

    ``features``: (Nf, d) float32 pre-divided by the kernel sigmas.
    ``n_pix``/``valid_mask``: embed the Nf feature rows into a padded
    canvas of ``n_pix`` pixels where ``valid_mask`` (n_pix,) marks the
    real ones (weight-0 sentinel rows elsewhere) — the device program
    runs at the static canvas shape.  ``perm`` (n_pix,): pixel visit
    order (e.g. ``tile_perm``); the caller must feed values in the
    same order (``crf_inference_mm`` handles this when the lattice
    carries one).  Lattice ids are renumbered by FIRST TOUCH under the
    permuted scan so chunk windows stay tight.
    """
    from wseg_tpu.ops.crf_native import build_lattice_tables
    off, bary, nbr, m = build_lattice_tables(
        np.ascontiguousarray(features, np.float32))
    d1 = off.shape[1]
    assert d1 <= D_PAD
    w = bary.astype(np.float32)

    if n_pix is None:
        n_pix = off.shape[0]
        valid_mask = None
    Np = _round_up(n_pix, K)
    BIG = np.int64(2 ** 62)
    ids_p = np.full((Np, d1), BIG, np.int64)
    w_p = np.zeros((Np, d1), np.float32)
    if valid_mask is None:
        ids_p[:off.shape[0]] = off
        w_p[:w.shape[0]] = w
    else:
        rows = np.nonzero(valid_mask)[0]
        assert rows.shape[0] == off.shape[0]
        ids_p[rows] = off
        w_p[rows] = w
    if perm is not None:
        full = np.arange(Np, dtype=np.int64)
        full[:n_pix] = np.asarray(perm, np.int64)
        ids_p, w_p = ids_p[full], w_p[full]

    # first-touch renumbering over the (permuted) scan order
    flat = ids_p.reshape(-1)
    uniq, first_pos = np.unique(flat, return_index=True)
    uniq, first_pos = uniq[uniq < BIG], first_pos[uniq < BIG]
    assert len(uniq) == m
    order = np.argsort(first_pos)
    new_of_old = np.empty(m, np.int64)
    new_of_old[uniq[order]] = np.arange(m)

    m_lat = _round_up(m + R0, 256)
    SENT = m_lat + 16
    ids_p = np.where(ids_p < BIG, new_of_old[np.minimum(ids_p, m - 1)],
                     SENT)
    pix = _chunk_blocks(ids_p, w_p, K, R0, m_lat, blk_quantum, D=d1)

    # blur tables: per axis, dst rows in NEW order; entries
    # [center 1.0, n1 0.5, n2 0.5]; rows >= m stay all-pad (zero)
    old_of_new = np.empty(m, np.int64)
    old_of_new[new_of_old] = np.arange(m)
    blur = []
    for j in range(d1):
        ids_b = np.full((m_lat, 3), SENT, np.int64)
        w_b = np.zeros((m_lat, 3), np.float32)
        ids_b[:m, 0] = np.arange(m)
        w_b[:m, 0] = 1.0
        for s in range(2):
            src_old = nbr[j, old_of_new, s].astype(np.int64)
            ok = src_old < m
            ids_b[:m, 1 + s] = np.where(
                ok, new_of_old[np.clip(src_old, 0, m - 1)], SENT)
            w_b[:m, 1 + s] = np.where(ok, 0.5, 0.0)
        blur.append(_chunk_blocks(ids_b, w_b, Km, R0, m_lat,
                                  blur_quantum, D=3))
    dperm = None
    if perm is not None:
        dperm = jnp.asarray(np.asarray(perm, np.int32))
    return MMLattice(pix, blur, m_lat, d1, perm=dperm)


# --------------------------------------------------------------- kernels
def _ohgen_call(spec: HotSpec):
    """Two (B, K, R0) bf16 multi-hot planes [w_hi, w_lo].

    A single bf16 weight plane would carry 2^-9 relative error; the
    hi/lo split bounds the folded weight at ~2^-18 (w = hi + lo + eps,
    products with each plane exact in the f32 MXU accumulator).
    """
    B = spec.blk_c.shape[0]
    nc, K, D = spec.ids.shape
    R0 = spec.r0

    def kern(c_ref, lo_ref, ids_ref, w_ref, hi_ref, lo2_ref):
        b = pl.program_id(0)
        lo = lo_ref[b]
        iot = jax.lax.broadcasted_iota(jnp.int32, (K, R0), 1)
        acc_h = jnp.zeros((K, R0), jnp.bfloat16)
        acc_l = jnp.zeros((K, R0), jnp.bfloat16)
        for r in range(D):
            idr = ids_ref[0, :, r]
            w = w_ref[0, :, r]
            wh = w.astype(jnp.bfloat16)
            wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
            # vertex slots of one pixel never collide, so adds on a
            # zero-init accumulator build the multi-hot exactly; the
            # (K,1)->(K,R0) broadcasts are materialised up front
            # (Mosaic rejects the fused broadcast-compare relayout)
            idb = jnp.broadcast_to((idr - lo)[:, None], (K, R0))
            hit = (idb == iot).astype(jnp.bfloat16)
            acc_h = acc_h + hit * jnp.broadcast_to(wh[:, None], (K, R0))
            acc_l = acc_l + hit * jnp.broadcast_to(wl[:, None], (K, R0))
        hi_ref[0] = acc_h
        lo2_ref[0] = acc_l

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, K, D), lambda b, c, lo: (c[b], 0, 0)),
            pl.BlockSpec((1, K, D), lambda b, c, lo: (c[b], 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, K, R0), lambda b, c, lo: (b, 0, 0)),
            pl.BlockSpec((1, K, R0), lambda b, c, lo: (b, 0, 0)),
        ),
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((B, K, R0), jnp.bfloat16),
                   jax.ShapeDtypeStruct((B, K, R0), jnp.bfloat16)),
    )(spec.blk_c, spec.blk_lo, spec.ids, spec.w)


def _splat_call(spec: HotSpec, oh_hi: jax.Array, oh_lo, qpk: jax.Array,
                m_lat: int) -> jax.Array:
    """lat (m_lat, 128) f32 += oh^T @ qpk per block window."""
    B = spec.blk_c.shape[0]
    nc, K, _ = spec.ids.shape
    R0 = spec.r0
    two = oh_lo is not None

    def kern(c_ref, lo_ref, oh_ref, *rest):
        (ohl_ref, q_ref, lat_ref) = rest if two else (None,) + rest
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            lat_ref[:] = jnp.zeros_like(lat_ref)

        # host builds blk_lo 16-aligned; Mosaic needs the static proof
        lo = pl.multiple_of(lo_ref[b], 16)
        blk = jax.lax.dot_general(
            oh_ref[0], q_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if two:
            blk = blk + jax.lax.dot_general(
                ohl_ref[0], q_ref[0], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        lat_ref[pl.ds(lo, R0), :] = lat_ref[pl.ds(lo, R0), :] + blk

    oh_spec = pl.BlockSpec((1, K, R0), lambda b, c, lo: (b, 0, 0))
    in_specs = [oh_spec] + ([oh_spec] if two else []) + [
        pl.BlockSpec((1, K, 128), lambda b, c, lo: (c[b], 0, 0))]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m_lat, 128), lambda b, c, lo: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    args = (oh_hi, oh_lo) if two else (oh_hi,)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_lat, 128), jnp.float32),
    )(spec.blk_c, spec.blk_lo, *args, qpk.reshape(nc, K, 128))


def _gather_call(spec: HotSpec, oh_hi: jax.Array, oh_lo,
                 latpk: jax.Array) -> jax.Array:
    """out (nc, K, 128) f32: out[c] += oh @ latpk[lo:lo+R0] per block."""
    B = spec.blk_c.shape[0]
    nc, K, _ = spec.ids.shape
    R0 = spec.r0
    two = oh_lo is not None

    def kern(c_ref, lo_ref, first_ref, oh_ref, *rest):
        (ohl_ref, latpk_ref, out_ref) = rest if two else (None,) + rest
        b = pl.program_id(0)
        lo = pl.multiple_of(lo_ref[b], 16)
        win = latpk_ref[pl.ds(lo, R0), :]
        blk = jax.lax.dot_general(
            oh_ref[0], win, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if two:
            blk = blk + jax.lax.dot_general(
                ohl_ref[0], win, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(first_ref[b] == 1)
        def _():
            out_ref[0] = blk

        @pl.when(first_ref[b] == 0)
        def _():
            out_ref[0] = out_ref[0] + blk

    oh_spec = pl.BlockSpec((1, K, R0), lambda b, c, lo, f: (b, 0, 0))
    in_specs = [oh_spec] + ([oh_spec] if two else []) + [
        pl.BlockSpec(memory_space=pltpu.VMEM)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, K, 128), lambda b, c, lo, f:
                               (c[b], 0, 0)),
    )
    args = (oh_hi, oh_lo) if two else (oh_hi,)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nc, K, 128), jnp.float32),
    )(spec.blk_c, spec.blk_lo, spec.blk_first, *args, latpk)


# ------------------------------------------------------------------ glue
def pack3(x: jax.Array) -> jax.Array:
    """(rows, C) f32 -> (rows, 128) bf16 planes [hi | lo | lo2]."""
    rows, C = x.shape
    assert 3 * C <= 128, C
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    lo = r.astype(jnp.bfloat16)
    lo2 = (r - lo.astype(jnp.float32)).astype(jnp.bfloat16)
    z = jnp.zeros((rows, 128 - 3 * C), jnp.bfloat16)
    return jnp.concatenate([hi, lo, lo2, z], axis=1)


def unpack3(p: jax.Array, C: int) -> jax.Array:
    """f32 matmul result lanes -> (rows, C) f32 value."""
    return p[:, :C] + p[:, C:2 * C] + p[:, 2 * C:3 * C]


class MMOh(NamedTuple):
    """Pre-generated multi-hot blocks (fixed per image).

    ``pix``: (hi, lo) bf16 weight planes — ``lo`` is None when the
    filter runs single-plane (planes=1).  ``blur``: hi plane per axis
    (blur weights 1.0/0.5 are exact in bf16 — no lo plane needed).
    """
    pix: tuple
    blur: tuple


def gen_oh(mm: MMLattice, planes: int = 2) -> MMOh:
    hi, lo = _ohgen_call(mm.pix)
    return MMOh((hi, lo if planes == 2 else None),
                tuple(_ohgen_call(s)[0] for s in mm.blur))


def scale_oh(oh: MMOh, mm: MMLattice, norm: jax.Array) -> MMOh:
    """Fold the per-pixel symmetric normalisation into the pixel planes.

    The filter is norm * (S^T B S (norm * q)); with S' = S diag(norm)
    both multiplies disappear: S'^T B S' q.  ``norm``: (Np, 1) f32 in
    the lattice's (permuted) pixel order.  One elementwise pass over
    the planes per image buys back two per-pixel multiplies and one
    value re-pack per mean-field iteration.
    """
    nc, K, _ = mm.pix.ids.shape
    n_blk = norm.reshape(nc, K).astype(jnp.bfloat16)[mm.pix.blk_c]
    hi, lo = oh.pix
    return MMOh((hi * n_blk[:, :, None],
                 lo * n_blk[:, :, None] if lo is not None else None),
                oh.blur)


def mm_filter(qpk: jax.Array, mm: MMLattice, oh: MMOh,
              C: int) -> jax.Array:
    """Exact permutohedral filter of packed values: (N,128)bf16 -> (N,C)."""
    lat = _splat_call(mm.pix, oh.pix[0], oh.pix[1], qpk, mm.m_lat)
    for j in range(mm.d1):
        latpk = pack3(unpack3(lat, C))
        blk = _gather_call(mm.blur[j], oh.blur[j], None, latpk)
        lat = blk.reshape(mm.m_lat, 128)
    latpk = pack3(unpack3(lat, C))
    out = _gather_call(mm.pix, oh.pix[0], oh.pix[1], latpk)
    nc, K, _ = out.shape
    return mm.alpha * unpack3(out.reshape(nc * K, 128), C)


def crf_inference_mm(probs: jax.Array, mm_g: MMLattice, mm_b: MMLattice,
                     oh_g: MMOh, oh_b: MMOh, t: int = 10,
                     compat_gaussian: float = 3.0,
                     compat_bilateral: float = 10.0) -> jax.Array:
    """Exact mean-field dense CRF, multi-hot matmul formulation.

    ``probs``: (H, W, C) f32.  Semantics mirror
    crf_lattice.crf_inference_lattice (and densecrf.cc): unary -log(p),
    symmetric normalisation, Potts update with self term, softmax.
    Both lattices must be built with the SAME pixel ``perm``.
    """
    assert (mm_g.perm is None) == (mm_b.perm is None)
    H, W, C = probs.shape
    N = H * W
    Np = mm_b.pix.ids.shape[0] * mm_b.pix.ids.shape[1]
    p = probs.reshape(N, C).astype(jnp.float32)
    perm = mm_b.perm
    if perm is not None:
        p = jnp.take(p, perm, axis=0)
    if Np > N:
        p = jnp.concatenate(
            [p, jnp.zeros((Np - N, C), jnp.float32)], axis=0)

    ones = jnp.ones((Np, C), jnp.float32)

    def norm_of(mm, oh):
        k1 = mm_filter(pack3(ones), mm, oh, C)[:, :1]
        return jnp.where(k1 > 1e-20,
                         jax.lax.rsqrt(jnp.maximum(k1, 1e-20)), 0.0)

    # fold norm into the pixel planes once: the per-iteration body then
    # packs Q a single time and runs both filters with no per-pixel
    # multiplies (scale_oh docstring has the algebra)
    oh_g = scale_oh(oh_g, mm_g, norm_of(mm_g, oh_g))
    oh_b = scale_oh(oh_b, mm_b, norm_of(mm_b, oh_b))

    unary = -jnp.log(jnp.maximum(p, 1e-8))

    def body(Q, _):
        qpk = pack3(Q)
        mg = mm_filter(qpk, mm_g, oh_g, C)
        mb = mm_filter(qpk, mm_b, oh_b, C)
        logit = -unary + compat_gaussian * mg + compat_bilateral * mb
        return jax.nn.softmax(logit, axis=-1), None

    Q, _ = jax.lax.scan(body, p, None, length=t)
    Q = Q[:N]
    if perm is not None:
        inv = jnp.zeros((N,), jnp.int32).at[perm].set(
            jnp.arange(N, dtype=jnp.int32))
        Q = jnp.take(Q, inv, axis=0)
    return Q.reshape(H, W, C)
