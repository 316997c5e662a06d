"""Multi-scale / multi-crop inference engine.

Replaces the per-image loop in reference infer_val.py:112-143: generates
scale/flip views, runs the jitted test-mode forward per static shape
bucket, predicts image-level labels (GT or sigmoid-max over views
thresholded at FP_CUT_SCORE), merges masks on host (cv2).

Buckets are keyed by the padded view shape, so with the reference's global
PAD_SIZE there is exactly one compiled program; with TEST.PAD_PER_SCALE
there is one per scale.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import numpy as np
from PIL import Image

import functools

import jax.numpy as jnp

from wseg_tpu.data.multiscale import (
    CropViews,
    MultiscaleViews,
    merge_crops,
    merge_multiscale,
)
from wseg_tpu.engine.train_loop import make_infer_fn
from wseg_tpu.ops.resize import resize_bilinear


def _tent_matrix(dst_n, src_n, dst_start, dst_len, src_start, src_len,
                 flip):
    """(dst_n, src_n) bilinear-sampling matrix with TRACED window params.

    Maps the dst window [dst_start, dst_start+dst_len) onto the src window
    [src_start, src_start+src_len) with half-pixel sampling and edge
    clamping (= resize of the cut view, the reference merge semantics,
    utils/inference_tools.py:137-143), optionally mirrored.  Rows outside
    the dst window replicate the window edge; they are cut on host.
    Built from broadcasted iota so the program stays static-shaped while
    the geometry is dynamic per image.
    """
    i = jax.lax.broadcasted_iota(jnp.float32, (dst_n, 1), 0)
    j = jax.lax.broadcasted_iota(jnp.float32, (1, src_n), 1)
    y = (i - dst_start + 0.5) * (src_len / dst_len) - 0.5
    y = jnp.where(flip, src_len - 1.0 - y, y)
    y = jnp.clip(y, 0.0, src_len - 1.0) + src_start
    return jax.nn.relu(1.0 - jnp.abs(y - j))


def _merge_views(masks, src_windows, dst_window, flips, H, W):
    """Window-to-window resize + accumulate of one image's views.

    Args:
      masks: (B, Hs, Ws, C) per-view mask scores (padded canvas).
      src_windows: (B, 4) float (pt, pl, h, w) view window per view.
      dst_window: (4,) float window of the scale-1.0 view in the merge
        canvas — all views map onto it.
      flips: (B,) bool.
      H, W: merge canvas size (static).
    Returns:
      (H, W, C) sum over views.
    """
    b, hs, ws, c = masks.shape

    def one(view, srcw, flip):
        A_h = _tent_matrix(H, hs, dst_window[0], dst_window[2],
                           srcw[0], srcw[2], False)
        A_w = _tent_matrix(W, ws, dst_window[1], dst_window[3],
                           srcw[1], srcw[3], flip)
        out = jnp.einsum("oh,hwc->owc", A_h, view.astype(jnp.float32))
        return jnp.einsum("pw,owc->opc", A_w, out)

    return jnp.sum(jax.vmap(one)(masks, src_windows, flips), axis=0)


@functools.partial(jax.jit, static_argnames=("merge_hw",))
def _device_merge_bucket(masks, src_windows, dst_window, flips, merge_hw):
    """One image's bucket views -> (merge_H, merge_W, C) partial sum."""
    return _merge_views(masks, src_windows, dst_window, flips,
                        merge_hw[0], merge_hw[1])


@functools.partial(jax.jit, static_argnames=("merge_hw",))
def _device_merge_group(masks, src_windows, dst_windows, flips, merge_hw):
    """Slot-batched merge for serving groups.

    Args:
      masks: (S, V, Hs, Ws, C) — S image slots, V views each.
      src_windows: (S, V, 4); dst_windows: (S, 4); flips: (S, V).
      merge_hw: static canvas (must hold every slot's dst window).
    Returns:
      (S, merge_H, merge_W, C) per-slot partial sums.
    """
    def per_slot(m, s, d, f):
        return _merge_views(m, s, d, f, merge_hw[0], merge_hw[1])

    return jax.vmap(per_slot)(masks, src_windows, dst_windows, flips)


def make_infer_merge_fn(model):
    """Fused device program for one scale bucket: view generation
    (ops/view_gen.py) -> normalise/pad -> test-mode forward -> per-image
    merge of the bucket's views onto the merge canvas.

    fn(variables, orig_u8 (S, Hc, Wc, 3), owin (S, 4), vwin (S, 4),
    dstwin (S, 4), out_hw=(ph, pw), flip_pair=bool, merge_hw=(mh, mw))
    -> (cls (S*vpi, C-1), partial_sums (S, mh, mw, C)).

    Fusing the merge into the forward program keeps the (S*vpi, ph, pw,
    C) mask tensor inside one XLA program (no HBM round trip between
    programs) and cuts per-group dispatches from ~4 bucket forwards +
    ~4*S merges to 4 fused calls."""
    import functools as _ft

    from wseg_tpu.data.pascal_voc import MEAN, STD
    from wseg_tpu.ops.view_gen import build_views_u8
    mean = jnp.asarray(MEAN, jnp.float32)
    std = jnp.asarray(STD, jnp.float32)

    @_ft.partial(jax.jit, static_argnames=("out_hw", "flip_pair",
                                           "merge_hw"))
    def infer_mv(variables, orig_u8, owin, vwin, dstwin, *, out_hw,
                 flip_pair, merge_hw):
        views_u8 = build_views_u8(orig_u8, owin, vwin, out_hw=out_hw,
                                  flip_pair=flip_pair)
        x = (views_u8.astype(jnp.float32) / 255.0 - mean) / std
        h, w = out_hw
        vpi = 2 if flip_pair else 1
        win = vwin.astype(jnp.int32)
        if vpi == 2:
            win = jnp.repeat(win, 2, axis=0)
        ri = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 1)
        ci = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 2)
        pt = win[:, 0][:, None, None, None]
        pl = win[:, 1][:, None, None, None]
        vh = win[:, 2][:, None, None, None]
        vw_ = win[:, 3][:, None, None, None]
        inside = ((ri >= pt) & (ri < pt + vh) &
                  (ci >= pl) & (ci < pl + vw_))
        x = jnp.where(inside, x, 0.0)
        out = model.apply(variables, x, train=False)
        masks = out.masks.astype(jnp.float32)
        s = orig_u8.shape[0]
        hs, ws, c = masks.shape[1:]
        m = masks.reshape(s, vpi, hs, ws, c)
        flips = jnp.asarray([False, True][:vpi])

        def per_slot(mrows, vwf, dw):
            src = jnp.tile(vwf[None], (vpi, 1))
            return _merge_views(mrows, src, dw, flips,
                                merge_hw[0], merge_hw[1])

        sums = jax.vmap(per_slot)(m, vwin.astype(jnp.float32),
                                  dstwin.astype(jnp.float32))
        return out.cls, sums

    return infer_mv


def _postprocess_one(sum_map, labels, window, img_u8, *, n_views,
                     bg_pow, threshs, crf_threshs, crf_iters,
                     crf_dtype="bfloat16", crf_stride=1,
                     crf_tap_div=2.0, crf_full_stride=1,
                     crf_refine_iters=0, ret_merged=False):
    """Writer math on device: clean -> BG^pow -> (CRF) -> threshold ->
    argmax, at the static merge-canvas shape.  Only (K, H, W) uint8 label
    maps cross the link (the merged score map is ~84x bigger).

    Mirrors reference utils/inference_tools.py:85-116 + utils/dcrf.py:6-21
    (CRF = the batched XLA mean-field approximation, ops/crf.py)."""
    merged = sum_map.astype(jnp.float32) / float(n_views)
    fg = merged[..., 1:] * labels[None, None, :]
    bg = jnp.power(jnp.clip(merged[..., :1], 0.0, None), float(bg_pow))
    merged = jnp.concatenate([bg, fg], axis=-1)

    def pred(m, t):
        fgm = jnp.where(m[..., 1:] < t, 0.0, m[..., 1:])
        s = jnp.concatenate([m[..., :1], fgm], axis=-1)
        return jnp.argmax(s, axis=-1).astype(jnp.uint8)

    preds = [pred(merged, float(t)) for t in threshs]
    if crf_threshs:
        from wseg_tpu.ops.crf import crf_inference_jax
        h, w = merged.shape[0], merged.shape[1]
        ri = jax.lax.broadcasted_iota(jnp.int32, (h, w, 1), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (h, w, 1), 1)
        win = window.astype(jnp.int32)
        valid = ((ri >= win[0]) & (ri < win[0] + win[2]) &
                 (ci >= win[1]) & (ci < win[1] + win[3]))
        q = crf_inference_jax(img_u8.astype(jnp.float32)[None],
                              merged[None], t=int(crf_iters),
                              valid_mask=valid.astype(jnp.float32)[None],
                              dtype={"bfloat16": jnp.bfloat16,
                                     "float32": jnp.float32}[crf_dtype],
                              bilateral_stride=int(crf_stride),
                              tap_spacing_div=float(crf_tap_div),
                              full_stride=int(crf_full_stride),
                              refine_iters=int(crf_refine_iters))
        preds += [pred(q[0], float(t)) for t in crf_threshs]
    if ret_merged:
        # exact-CRF mode: the cleaned/BG^pow map stays ON DEVICE for
        # the per-image exact stage (ExactCRF) to consume
        return jnp.stack(preds), merged
    return jnp.stack(preds)


@functools.partial(jax.jit, static_argnames=(
    "n_views", "bg_pow", "threshs", "crf_threshs", "crf_iters",
    "crf_dtype", "crf_stride", "crf_tap_div", "crf_full_stride",
    "crf_refine_iters", "ret_merged"))
def _device_postprocess_jit(sum_map, labels, window, img_u8, *, n_views,
                            bg_pow, threshs, crf_threshs, crf_iters,
                            crf_dtype="bfloat16", crf_stride=1,
                            crf_tap_div=2.0, crf_full_stride=1,
                            crf_refine_iters=0, ret_merged=False):
    return _postprocess_one(sum_map, labels, window, img_u8,
                            n_views=n_views, bg_pow=bg_pow,
                            threshs=threshs, crf_threshs=crf_threshs,
                            crf_iters=crf_iters, crf_dtype=crf_dtype,
                            crf_stride=crf_stride,
                            crf_tap_div=crf_tap_div,
                            crf_full_stride=crf_full_stride,
                            crf_refine_iters=crf_refine_iters,
                            ret_merged=ret_merged)


@functools.partial(jax.jit, static_argnames=(
    "n_views", "bg_pow", "threshs", "crf_threshs", "crf_iters",
    "crf_dtype", "crf_stride", "crf_tap_div", "crf_full_stride",
    "crf_refine_iters", "ret_merged"))
def _device_postprocess_group_jit(sum_maps, labels, windows, imgs_u8, *,
                                  n_views, bg_pow, threshs, crf_threshs,
                                  crf_iters, crf_dtype="bfloat16",
                                  crf_stride=1, crf_tap_div=2.0,
                                  crf_full_stride=1,
                                  crf_refine_iters=0, ret_merged=False):
    """Slot-batched writer math: ONE dispatch and ONE (S, K, H, W)
    uint8 fetch per serving group instead of S of each (each fetch pays
    the link round trip on remote-attached chips)."""
    return jax.vmap(lambda s, l, w, i: _postprocess_one(
        s, l, w, i, n_views=n_views, bg_pow=bg_pow, threshs=threshs,
        crf_threshs=crf_threshs, crf_iters=crf_iters,
        crf_dtype=crf_dtype, crf_stride=crf_stride,
        crf_tap_div=crf_tap_div, crf_full_stride=crf_full_stride,
        crf_refine_iters=crf_refine_iters, ret_merged=ret_merged))(
        sum_maps, labels, windows, imgs_u8)


@functools.partial(jax.jit, static_argnames=(
    "n_views", "bg_pow", "threshs", "crf_threshs", "crf_iters",
    "crf_dtype", "crf_stride", "crf_tap_div", "crf_full_stride",
    "crf_refine_iters", "fp_cut", "ret_merged"))
def _device_postprocess_group_cls_jit(sum_maps, cls_list, windows,
                                      imgs_u8, *, n_views, bg_pow,
                                      threshs, crf_threshs, crf_iters,
                                      crf_dtype="bfloat16", crf_stride=1,
                                      crf_tap_div=2.0, crf_full_stride=1,
                                      crf_refine_iters=0, fp_cut=0.1,
                                      ret_merged=False):
    """Predicted-labels variant: image-level labels are computed ON
    DEVICE from the per-view cls logits — sigmoid, max over views,
    threshold at FP_CUT_SCORE (reference infer_val.py:115-125) — so the
    serving worker can dispatch the postprocess without first fetching
    cls from the finisher thread (that fetch-before-dispatch serialised
    the pipeline in non-GT runs the same way the GT path's
    finisher-side dispatch once did).  Returns (preds (S,K,H,W) uint8,
    labels (S, C-1) f32) — fetched together.

    ``cls_list``: per-scale (S*vpi, C-1) logits from the fused bucket
    programs, scale-major; vpi inferred from sum_maps' slot count."""
    cls = jnp.stack(cls_list)                      # (ns, S*vpi, C-1)
    ns, sv, c1 = cls.shape
    s_slots = sum_maps.shape[0]
    vpi = sv // s_slots
    cls = cls.reshape(ns, s_slots, vpi, c1)
    cls = cls.transpose(1, 0, 2, 3).reshape(s_slots, ns * vpi, c1)
    sig = jax.nn.sigmoid(cls.astype(jnp.float32)).max(axis=1)
    labels = (sig > fp_cut).astype(jnp.float32)
    out = jax.vmap(lambda s, l, w, i: _postprocess_one(
        s, l, w, i, n_views=n_views, bg_pow=bg_pow, threshs=threshs,
        crf_threshs=crf_threshs, crf_iters=crf_iters,
        crf_dtype=crf_dtype, crf_stride=crf_stride,
        crf_tap_div=crf_tap_div, crf_full_stride=crf_full_stride,
        crf_refine_iters=crf_refine_iters, ret_merged=ret_merged))(
        sum_maps, labels, windows, imgs_u8)
    if ret_merged:
        preds, merged = out
        return preds, labels, merged
    return out, labels


def make_device_postprocess(threshs, crf_threshs, crf_iters: int = 10,
                            bg_pow: float = 3.0,
                            crf_dtype: str = "bfloat16",
                            crf_stride: int = 1,
                            crf_tap_div: float = 2.0,
                            crf_full_stride: int = 1,
                            crf_refine_iters: int = 0,
                            crf_mode: str = "fast"):
    """Returns pp(sum_map, labels, window, img_u8_canvas, size_hw,
    n_views) -> dict thresh -> {"pred": (h,w) uint8, "pred_crf": ...}.

    The scale-1.0 window IS the original resolution, so cutting it on
    host yields exactly the reference's final map (the reference's
    bilinear resize-to-original is an identity there).

    ``crf_mode``: "fast" = coarse-to-fine sparse-tap CRF inside the
    batched program (throughput knob, 0.7-1.1%% argmax deviation);
    "exact" = the batched program returns the merged maps and a
    per-image ExactCRF stage runs the exact permutohedral mean field
    (0.0000%% measured deviation — the parity-grade default,
    TEST.CRF_MODE)."""
    threshs = tuple(float(t) for t in threshs)
    crf_threshs = tuple(float(t) for t in crf_threshs)
    exact = crf_mode == "exact" and bool(crf_threshs)
    prog_crf_threshs = () if exact else crf_threshs

    def dispatch(sum_map, labels, window, img_u8, n_views):
        """Launch the device program; returns the (K, H, W) uint8 device
        array WITHOUT fetching (callers pipeline many images' programs
        before paying the host<->device round trip)."""
        return _device_postprocess_jit(
            sum_map, jnp.asarray(labels, jnp.float32),
            jnp.asarray(window, jnp.int32), jnp.asarray(img_u8),
            n_views=int(n_views), bg_pow=float(bg_pow), threshs=threshs,
            crf_threshs=prog_crf_threshs, crf_iters=int(crf_iters),
            crf_dtype=str(crf_dtype), crf_stride=int(crf_stride),
            crf_tap_div=float(crf_tap_div),
            crf_full_stride=int(crf_full_stride),
            crf_refine_iters=int(crf_refine_iters),
            ret_merged=exact)

    def finalize(preds_np, window, size_hw, crf_preds_np=None):
        pt, pl, vh, vw = window
        assert (vh, vw) == tuple(size_hw), (window, size_hw)
        cut = preds_np[:, pt:pt + vh, pl:pl + vw]
        out = {}
        for k, t in enumerate(threshs):
            out[t] = {"pred": cut[k]}
        if exact:
            # crf preds come from the per-image ExactCRF stage
            crf_cut = crf_preds_np[:, pt:pt + vh, pl:pl + vw]
            for k, t in enumerate(crf_threshs):
                out.setdefault(t, {})["pred_crf"] = crf_cut[k]
            return out
        for k, t in enumerate(crf_threshs):
            out.setdefault(t, {})["pred_crf"] = cut[len(threshs) + k]
        return out

    def dispatch_group(sum_maps, labels, windows, imgs_u8, n_views):
        """Slot-batched dispatch: (S, ...) stacked inputs -> one device
        program returning (S, K, H, W) uint8."""
        return _device_postprocess_group_jit(
            sum_maps, jnp.asarray(labels, jnp.float32),
            jnp.asarray(windows, jnp.int32), jnp.asarray(imgs_u8),
            n_views=int(n_views), bg_pow=float(bg_pow), threshs=threshs,
            crf_threshs=prog_crf_threshs, crf_iters=int(crf_iters),
            crf_dtype=str(crf_dtype), crf_stride=int(crf_stride),
            crf_tap_div=float(crf_tap_div),
            crf_full_stride=int(crf_full_stride),
            crf_refine_iters=int(crf_refine_iters),
            ret_merged=exact)

    def dispatch_group_cls(sum_maps, cls_list, windows, imgs_u8,
                           n_views, fp_cut):
        """Predicted-labels slot-batched dispatch: labels computed on
        device from the per-scale cls logits; returns (preds device
        (S,K,H,W) uint8, labels device (S,C-1) f32) unfetched."""
        return _device_postprocess_group_cls_jit(
            sum_maps, tuple(cls_list),
            jnp.asarray(windows, jnp.int32), jnp.asarray(imgs_u8),
            n_views=int(n_views), bg_pow=float(bg_pow), threshs=threshs,
            crf_threshs=prog_crf_threshs, crf_iters=int(crf_iters),
            crf_dtype=str(crf_dtype), crf_stride=int(crf_stride),
            crf_tap_div=float(crf_tap_div),
            crf_full_stride=int(crf_full_stride),
            crf_refine_iters=int(crf_refine_iters),
            fp_cut=float(fp_cut), ret_merged=exact)

    def pp(sum_map, labels, window, img_u8, size_hw, n_views):
        dev = dispatch(sum_map, labels, window, img_u8, n_views)
        if exact:
            preds_dev, merged = dev
            tables = pp.exact.build(
                np.asarray(img_u8)[window[0]:window[0] + window[2],
                                   window[1]:window[1] + window[3]],
                merged.shape[:2], window)
            crf_dev = pp.exact.dispatch(tables, merged[None], 0)
            return finalize(np.asarray(jax.device_get(preds_dev)),
                            window, size_hw,
                            np.asarray(jax.device_get(crf_dev)))
        preds = np.asarray(jax.device_get(dev))
        return finalize(preds, window, size_hw)

    pp.dispatch = dispatch
    pp.dispatch_group = dispatch_group
    pp.dispatch_group_cls = dispatch_group_cls
    pp.finalize = finalize
    pp.crf_mode = "exact" if exact else "fast"
    pp.exact = ExactCRF(crf_threshs, crf_iters=int(crf_iters)) \
        if exact else None
    return pp


class ExactCRF:
    """Per-image EXACT permutohedral CRF stage for the serving fast
    path (``TEST.CRF_MODE: exact``).

    The coarse-to-fine device CRF (ops/crf.py) approximates the dense
    bilateral kernel with sparse taps (0.7-1.1% argmax deviation,
    docs/PARITY.md); this stage runs the exact-lattice mean field
    (ops/crf_mm.py, 0.0000% measured argmax deviation vs
    native/densecrf) and matches the reference's pydensecrf semantics
    (/root/reference/utils/dcrf.py:6-21) on device.

    Per image: the host builds the lattice block tables from the
    ORIGINAL rgb pixels (~180 ms on one core, overlapped with device
    work by the serving CRF thread), ships them in one device_put, and
    dispatches a single program (multi-hot gen + norm + t mean-field
    iterations + thresholded argmax).  Device shapes are content-
    dependent (lattice size m, window-block count B); a monotone
    per-canvas cap ratchet pads them so the compiled program count
    stays bounded.
    """

    # K=256 keeps the per-image multi-hot planes small in HBM
    # (oh bytes = B x K x R0; at K=1024 the window count B shrinks
    # sub-linearly, so planes cost ~1.6x more and OOM'd alongside the
    # serving pipeline's in-flight merge buffers)
    GEOM = dict(K=256, R0=256, Km=256, blk_quantum=256,
                blur_quantum=256)

    def __init__(self, crf_threshs, crf_iters: int = 10,
                 tile: int = 16, planes: int = 1,
                 compat_g: float = 3.0, compat_b: float = 10.0,
                 sxy_g: float = 3.0, sxy_b: float = 80.0,
                 srgb: float = 13.0):
        import threading

        self.crf_threshs = tuple(float(t) for t in crf_threshs)
        self.iters = int(crf_iters)
        self.tile = int(tile)
        self.planes = int(planes)
        self.compat_g, self.compat_b = float(compat_g), float(compat_b)
        self.sxy_g, self.sxy_b, self.srgb = (float(sxy_g), float(sxy_b),
                                             float(srgb))
        self._caps = {}
        # the gaussian lattice is CONTENT-INDEPENDENT (features depend
        # only on the window geometry, ops/crf_lattice.py
        # gaussian_features) — cache it per (canvas, window, caps) so
        # the per-image host build pays only the bilateral half
        # (VERDICT r4 task 5: ~180 ms/img/core recovered)
        self._gauss_cache = {}
        self._lock = threading.Lock()
        # interpret-mode Pallas (CPU tests) keeps global interpreter
        # state (e.g. the output-revisit checker) that concurrent
        # dispatches corrupt — serialise them there; real-TPU Mosaic
        # dispatches stay lock-free
        self._interp_lock = threading.Lock()

        def run(merged_stack, row, bug, big, bub, bib, *, spec_g,
                spec_b):
            from wseg_tpu.ops.crf_mm import crf_exact_mm, unpack_lattices
            mm_g = unpack_lattices(bug, big, spec_g)
            mm_b = unpack_lattices(bub, bib, spec_b)
            m = jax.lax.dynamic_index_in_dim(merged_stack, row, 0,
                                             keepdims=False)
            q = crf_exact_mm(m, mm_g, mm_b, t=self.iters,
                             planes=self.planes,
                             compat_gaussian=self.compat_g,
                             compat_bilateral=self.compat_b)

            def pred(mm, t):
                fgm = jnp.where(mm[..., 1:] < t, 0.0, mm[..., 1:])
                s = jnp.concatenate([mm[..., :1], fgm], axis=-1)
                return jnp.argmax(s, axis=-1).astype(jnp.uint8)

            return jnp.stack([pred(q, t) for t in self.crf_threshs])

        self._run = jax.jit(run, static_argnames=("spec_g", "spec_b"))

    def build(self, img_rgb_u8: np.ndarray, canvas_hw, window):
        """Host lattice build.  ``img_rgb_u8``: the ORIGINAL (h, w, 3)
        uint8 pixels; ``window`` (pt, pl, h, w): where they sit in the
        (Hc, Wc) merge canvas the merged maps live on.  Returns device-
        resident (mm_g, mm_b) (one batched transfer).  Thread-safe."""
        from wseg_tpu.ops.crf_lattice import (
            bilateral_features,
            gaussian_features,
        )
        from wseg_tpu.ops.crf_mm import build_mm_lattice, tile_perm

        Hc, Wc = (int(v) for v in canvas_hw)
        pt, pl, h, w = (int(v) for v in window)
        assert img_rgb_u8.shape[:2] == (h, w), (img_rgb_u8.shape, window)
        valid = np.zeros((Hc, Wc), bool)
        valid[pt:pt + h, pl:pl + w] = True
        perm = tile_perm(Hc, Wc, self.tile)
        with self._lock:
            caps = dict(self._caps.get((Hc, Wc), {}))
        mm_b = build_mm_lattice(
            bilateral_features(img_rgb_u8, self.sxy_b, self.srgb),
            n_pix=Hc * Wc, valid_mask=valid.reshape(-1), perm=perm,
            min_m_lat=caps.get("bm", 0), min_pix_b=caps.get("bB", 0),
            min_blur_b=caps.get("bL", 0), **self.GEOM)
        gkey = (Hc, Wc, pt, pl, h, w, caps.get("gm", 0),
                caps.get("gB", 0), caps.get("gL", 0))
        with self._lock:
            gauss = self._gauss_cache.get(gkey)
        if gauss is None:
            from wseg_tpu.ops.crf_mm import pack_lattices
            mm_g = build_mm_lattice(
                gaussian_features((h, w), self.sxy_g),
                n_pix=Hc * Wc, valid_mask=valid.reshape(-1), perm=perm,
                min_m_lat=caps.get("gm", 0), min_pix_b=caps.get("gB", 0),
                min_blur_b=caps.get("gL", 0), **self.GEOM)
            # cache the packed gaussian tables DEVICE-resident: the
            # gaussian half is content-independent, so steady state
            # skips both its ~60 ms host build AND its ~4 MB/img upload
            # (relay uplink ~55 MB/s)
            bug, big, spec_g = pack_lattices(mm_g)
            gdims = (int(mm_g.m_lat),
                     int(mm_g.pix.blk_c.shape[0]),
                     int(max(s.blk_c.shape[0] for s in mm_g.blur)))
            gauss = (jnp.asarray(bug), jnp.asarray(big), spec_g, gdims)
            with self._lock:
                if len(self._gauss_cache) >= 64:  # few geometries/run
                    self._gauss_cache.pop(next(iter(self._gauss_cache)))
                self._gauss_cache[gkey] = gauss
        bug_d, big_d, spec_g, gdims = gauss
        # ratchet the per-canvas caps so later images reuse the same
        # compiled program: grow PAST the observed size (coarse quanta;
        # 1.5x on the first observation of a canvas, 1.25x after) —
        # exact-fit ratcheting recompiles on every new content-dependent
        # lattice-size high-water mark (~10 s of remote compile per
        # variant), and the wider first step keeps later images of the
        # same canvas from ratcheting mid-run
        with self._lock:
            caps = self._caps.setdefault((Hc, Wc), {})
            for key, val, q in (
                    ("bm", mm_b.m_lat, 2048),
                    ("bB", mm_b.pix.blk_c.shape[0], 512),
                    ("bL", max(s.blk_c.shape[0] for s in mm_b.blur),
                     512),
                    ("gm", gdims[0], 2048),
                    ("gB", gdims[1], 512),
                    ("gL", gdims[2], 512)):
                if int(val) > caps.get(key, 0):
                    mult = 1.25 if key in caps else 1.5
                    caps[key] = -(-int(val * mult) // q) * q
        # pack the ~30 bilateral table leaves into TWO transfers: the
        # relay pays a ~130 ms round trip per array (pack_lattices
        # docstring); the gaussian half rides the device-resident cache
        from wseg_tpu.ops.crf_mm import pack_lattices
        bub, bib, spec_b = pack_lattices(mm_b)
        return (bug_d, big_d, jnp.asarray(bub), jnp.asarray(bib),
                spec_g, spec_b)

    def dispatch(self, tables, merged_stack, row: int):
        """One device program: (S, Hc, Wc, C) merged stack + this
        image's tables -> (n_crf_threshs, Hc, Wc) uint8, unfetched."""
        bug, big, bub, bib, spec_g, spec_b = tables
        row = jnp.asarray(int(row), jnp.int32)
        if jax.default_backend() == "cpu":  # tests: interpret Pallas
            from jax.experimental.pallas import tpu as pltpu
            with self._interp_lock, pltpu.force_tpu_interpret_mode():
                out = self._run(merged_stack, row, bug, big, bub, bib,
                                spec_g=spec_g, spec_b=spec_b)
                jax.block_until_ready(out)
                return out
        return self._run(merged_stack, row, bug, big, bub, bib,
                         spec_g=spec_g, spec_b=spec_b)

    def warmup(self, canvas_hw, n_classes: int):
        """Compile the per-canvas program on the caller's thread with a
        smooth synthetic image (photo-like lattice occupancy; noise
        would blow the content-dependent lattice size cap)."""
        Hc, Wc = (int(v) for v in canvas_hw)
        rng = np.random.RandomState(0)
        low = rng.rand(max(Hc // 48, 2), max(Wc // 48, 2), 3)
        import cv2
        img = (cv2.resize(low, (Wc, Hc)) * 255).astype(np.uint8)
        self.build(img, (Hc, Wc), (0, 0, Hc, Wc))
        # give real images headroom over the synthetic warmup content
        # so the first few don't each mint a program variant (modest:
        # the multi-hot planes scale with the B caps in HBM)
        with self._lock:
            caps = self._caps[(Hc, Wc)]
            caps["bm"] = caps["bm"] * 2
            caps["gm"] = -(-caps["gm"] * 3 // 2)
        tables = self.build(img, (Hc, Wc), (0, 0, Hc, Wc))
        merged = jnp.asarray(
            rng.rand(1, Hc, Wc, n_classes).astype(np.float32))
        out = self.dispatch(tables, merged, 0)
        np.asarray(jax.device_get(out))


def finalize_device_merge(sum_map: np.ndarray, dst_window, size_hw,
                          labels: np.ndarray, n_views: int,
                          bg_pow: float) -> np.ndarray:
    """Host tail of the device merge: cut the scale-1.0 valid window,
    resize to the original size, clean absent channels, BG discount
    (reference utils/inference_tools.py:155-160)."""
    import cv2

    pt, pl, vh, vw = dst_window
    merged = np.asarray(sum_map, np.float32) / float(n_views)
    merged = merged[pt:pt + vh, pl:pl + vw]
    merged = cv2.resize(merged, (size_hw[1], size_hw[0]),
                        interpolation=cv2.INTER_LINEAR)
    merged[..., 1:] *= labels[None, None, :]
    merged[..., 0] = np.power(merged[..., 0], bg_pow)
    return merged


class InferenceEngine:
    def __init__(self, model, variables, test_cfg, mesh=None):
        self.model = model
        self.variables = variables
        # data-parallel inference (reference infer_val.py:99): replicate
        # params; bucket batches whose leading axis divides the mesh
        # ``data`` axis shard over it (per-image view batches are small —
        # the batched MultiScaleServer is the path that actually scales).
        self.mesh = mesh
        if mesh is not None:
            from wseg_tpu.parallel.mesh import replicate
            self.variables = replicate(mesh, variables)
        self.cfg = test_cfg
        method = str(test_cfg.METHOD)
        self.uint8 = (method == "multiscale" and
                      bool(getattr(test_cfg, "UINT8_TRANSFER", False)))
        self.infer = make_infer_fn(model, device_norm=self.uint8)
        if method == "multiscale":
            self.views = MultiscaleViews(
                test_cfg.SCALES, bool(test_cfg.FLIP), test_cfg.PAD_SIZE,
                bool(getattr(test_cfg, "PAD_PER_SCALE", False)),
                int(getattr(test_cfg, "PAD_ALIGN", 128)),
                transfer="uint8" if self.uint8 else "float32")
        elif method in ("multicrop", "crop"):
            self.views = CropViews(test_cfg.CROP_SIZE,
                                   test_cfg.CROP_GRID_SIZE,
                                   test_cfg.PAD_SIZE,
                                   bool(test_cfg.FLIP))
        else:
            raise NotImplementedError(f"Method {method} is unknown")
        self.method = method

    def _put(self, x):
        from wseg_tpu.parallel.mesh import shard_leading_if_divisible
        return shard_leading_if_divisible(self.mesh, x)

    def _infer_batch(self, batch, pads_rows):
        """Dispatch one bucket batch (uint8 path passes pad windows)."""
        if self.uint8:
            return self.infer(self.variables, self._put(batch),
                              np.asarray(pads_rows, np.int32))
        return self.infer(self.variables, self._put(batch))

    def _forward_views(self, views: List[np.ndarray], pads=None):
        """Group same-shape views into batches; returns per-view
        (cls, mask) in original order.

        All bucket programs are dispatched before any result is fetched,
        so device work for the buckets overlaps with host transfers
        (fetch-per-bucket would serialize on round trips)."""
        buckets: Dict[Tuple[int, int], List[int]] = {}
        for i, v in enumerate(views):
            buckets.setdefault(v.shape[:2], []).append(i)
        cls_out = [None] * len(views)
        mask_out = [None] * len(views)
        pending = []
        for shape, idxs in buckets.items():
            batch = np.stack([views[i] for i in idxs])
            wins = [pads[i] for i in idxs] if pads is not None else None
            pending.append((idxs, self._infer_batch(batch, wins)))
        for idxs, (cls, masks) in pending:
            cls = np.asarray(jax.device_get(cls), np.float32)
            masks = np.asarray(jax.device_get(masks), np.float32)
            for k, i in enumerate(idxs):
                cls_out[i] = cls[k]
                mask_out[i] = masks[k]
        return cls_out, mask_out

    def predict_labels(self, cls_views: List[np.ndarray],
                       gt_labels: np.ndarray) -> np.ndarray:
        """Image-level labels: GT, or sigmoid-max over views > cutoff
        (reference infer_val.py:115-125)."""
        if bool(self.cfg.USE_GT_LABELS):
            return gt_labels.astype(np.float32)
        sig = 1.0 / (1.0 + np.exp(-np.stack(cls_views)))
        sig = sig.max(axis=0)
        return (sig > float(self.cfg.FP_CUT_SCORE)).astype(np.float32)

    def run_image(self, image: Image.Image, gt_labels: np.ndarray
                  ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (merged (H,W,C) mask scores, predicted labels (C-1,))."""
        w, h = image.size
        if self.method == "multiscale":
            if bool(getattr(self.cfg, "DEVICE_MERGE", False)):
                return self._run_image_device_merge(image, gt_labels)
            views, pads, flips = self.views.build(image)
            cls_views, mask_views = self._forward_views(views, pads)
            labels = self.predict_labels(cls_views, gt_labels)
            merged = merge_multiscale(mask_views, pads, flips, labels,
                                      (h, w), float(self.cfg.BG_POW))
        else:
            views, coords, flips = self.views.build(image)
            cls_views, mask_views = self._forward_views(views)
            labels = self.predict_labels(cls_views, gt_labels)
            merged = merge_crops(mask_views, coords, flips, labels, (h, w))
        return merged, labels

    def _run_image_device_merge(self, image: Image.Image,
                                gt_labels: np.ndarray):
        """TPU-fast path: views are merged on device at the scale-1.0
        padded resolution and only the single merged map is fetched
        (host merge fetches every view — 8 full-resolution tensors).

        Deviations vs the reference merge (utils/inference_tools.py:
        134-161), both bilinear-chain effects at the epsilon level:
        padding is removed by weight renormalisation instead of cutting,
        and the final resize to the original size happens once from the
        merge resolution instead of per view.
        """
        w, h = image.size
        views, pads, flips = self.views.build(image)
        shapes = self.views.view_shapes(w, h)
        merge_hw = shapes[0]  # scale-1.0 bucket

        # group by padded shape, like _forward_views
        buckets: Dict[Tuple[int, int], List[int]] = {}
        for i, v in enumerate(views):
            buckets.setdefault(v.shape[:2], []).append(i)

        cls_views = [None] * len(views)
        dst_window = jnp.asarray(pads[0], jnp.float32)  # scale-1.0 window
        sum_m = None
        for shape, idxs in buckets.items():
            batch = np.stack([views[i] for i in idxs])
            src_windows = np.asarray([pads[i] for i in idxs], np.float32)
            fl = np.asarray([flips[i] for i in idxs])
            cls, masks = self._infer_batch(batch, [pads[i] for i in idxs])
            for k, i in enumerate(idxs):
                cls_views[i] = np.asarray(cls[k], np.float32)
            m = _device_merge_bucket(masks, jnp.asarray(src_windows),
                                     dst_window, jnp.asarray(fl),
                                     tuple(merge_hw))
            sum_m = m if sum_m is None else sum_m + m

        labels = self.predict_labels(cls_views, gt_labels)
        merged = finalize_device_merge(sum_m, pads[0], (h, w), labels,
                                       len(views), float(self.cfg.BG_POW))
        return merged, labels
