"""Batched multicrop inference server (TEST.METHOD=multicrop fast path).

The reference's multicrop mode (CropLoader,
/root/reference/datasets/pascal_voc_ms.py:180-243) tiles the padded
image with a CROP_SIZE grid (flip variant FIRST when FLIP is on) and
MergeCrops (/root/reference/utils/inference_tools.py:257-301)
reassembles the per-crop masks with per-pixel overlap counting — note:
unlike the multiscale merge there is NO BG_POW discount.

TPU-native design: unlike multiscale views, every crop has ONE static
shape and the grid coordinates depend only on config — so the whole
per-image pipeline fuses into a single program:

  uint8 padded canvases (B, PH, PW, 3)
    -> device normalise + zero outside each image window
    -> static-slice the G grid crops (+reversed-lane flip variants)
    -> ONE model forward over the (B*G) crop batch (image-major)
    -> unflip + static-slice scatter-adds back onto the padded canvas
    -> divide by the (trace-time constant) overlap counts

The merged maps stay slot-batched on device and feed the same
postprocess programs (threshold/argmax/CRF, engine/infer.py) as the
multiscale server; only (K, H, W) uint8 label maps cross the link.
`MultiCropServer` reuses the MultiScaleServer group/dispatch/finisher
machinery — only view building and the fused forward differ.
"""

from __future__ import annotations

import functools as _ft
import math
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from wseg_tpu.data.multiscale import CropViews
from wseg_tpu.engine.serving import MultiScaleServer


def grid_coords(pad_hw, crop_hw, grid_hw) -> Tuple[Tuple[int, int], ...]:
    """Static top-left corners of the crop grid over the padded canvas.

    Mirrors CropViews.build / reference pascal_voc_ms.py:198-209:
    stride = ceil(pad/grid), each crop clamped so it ends inside the
    canvas (start pulled back, never shrunk)."""
    ph, pw = (int(p) for p in pad_hw)
    ch, cw = (int(c) for c in crop_hw)
    gh, gw = (int(g) for g in grid_hw)
    sh, sw = math.ceil(ph / gh), math.ceil(pw / gw)
    # sparse grids (stride > crop) leave uncovered bands the fused
    # merge would silently zero-fill; the reference CropLoader asserts
    # the same invariant (pascal_voc_ms.py:192-195)
    assert ch <= ph and cw <= pw, (
        f"crop {ch}x{cw} exceeds padded canvas {ph}x{pw}")
    assert sh <= ch and sw <= cw, (
        f"crop grid is sparse: stride {sh}x{sw} > crop {ch}x{cw} "
        f"(pad {ph}x{pw} / grid {gh}x{gw}) leaves uncovered bands")
    out = []
    for gi in range(gh):
        for gj in range(gw):
            e_h = min(gi * sh + ch, ph)
            e_w = min(gj * sw + cw, pw)
            out.append((e_h - ch, e_w - cw))
    return tuple(out)


def make_crop_infer_fn(model):
    """fn(variables, canv_u8 (B,PH,PW,3), owin (B,4)) ->
    (cls (B*G, C-1) image-major, merged (B, PH, PW, C)).

    ``merged`` is ``sum/counts * G`` so the shared postprocess program
    (engine/infer.py _postprocess_one, which divides by n_views=G)
    lands exactly on the reference's count-normalised mean; overlap
    counts are a trace-time constant (the grid never depends on the
    image)."""
    from wseg_tpu.data.pascal_voc import MEAN, STD
    mean = jnp.asarray(MEAN, jnp.float32)
    std = jnp.asarray(STD, jnp.float32)

    @_ft.partial(jax.jit, static_argnames=("coords", "crop_hw", "flip"))
    def infer_crops(variables, canv_u8, owin, *, coords, crop_hw, flip):
        b, ph, pw, _ = canv_u8.shape
        ch, cw = crop_hw
        x = (canv_u8.astype(jnp.float32) / 255.0 - mean) / std
        # zero outside each image's window: the reference normalises
        # the image then pastes it into a ZERO canvas
        # (pascal_voc_ms.py:193-196) — byte-exact with that host path
        ri = jax.lax.broadcasted_iota(jnp.int32, (1, ph, pw, 1), 1)
        ci = jax.lax.broadcasted_iota(jnp.int32, (1, ph, pw, 1), 2)
        win = owin.astype(jnp.int32)
        pt = win[:, 0][:, None, None, None]
        pl = win[:, 1][:, None, None, None]
        vh = win[:, 2][:, None, None, None]
        vw = win[:, 3][:, None, None, None]
        inside = ((ri >= pt) & (ri < pt + vh) &
                  (ci >= pl) & (ci < pl + vw))
        x = jnp.where(inside, x, 0.0)

        crops = []
        for (s_h, s_w) in coords:
            c = jax.lax.slice(x, (0, s_h, s_w, 0),
                              (b, s_h + ch, s_w + cw, 3))
            if flip:  # flip variant FIRST (reference CropLoader:213)
                crops.append(c[:, :, ::-1])
            crops.append(c)
        g = len(crops)
        # image-major: slot i's G views are rows [i*G, (i+1)*G) — the
        # postprocess cls reshape (dispatch_group_cls) relies on this
        xb = jnp.stack(crops, axis=1).reshape(b * g, ch, cw, 3)
        out = model.apply(variables, xb, train=False)
        masks = out.masks.astype(jnp.float32)
        nc = masks.shape[-1]
        m = masks.reshape(b, g, ch, cw, nc)

        total = jnp.zeros((b, ph, pw, nc), jnp.float32)
        counts = np.zeros((ph, pw), np.float32)
        vi = 0
        for (s_h, s_w) in coords:
            for f in ([True, False] if flip else [False]):
                mg = m[:, vi]
                if f:
                    mg = mg[:, :, ::-1]
                total = total.at[:, s_h:s_h + ch, s_w:s_w + cw].add(mg)
                counts[s_h:s_h + ch, s_w:s_w + cw] += 1.0
                vi += 1
        # clamp: a sparse grid can leave canvas pixels (outside every
        # image window) uncovered; the reference asserts counts > 0
        # over the image itself (inference_tools.py:295)
        denom = jnp.asarray(np.maximum(counts, 1.0))[None, :, :, None]
        merged = total * (float(g) / denom)
        return out.cls, merged

    return infer_crops


class MultiCropServer(MultiScaleServer):
    """Drop-in MultiScaleServer sibling for TEST.METHOD=multicrop.

    Inherits the queue/group/finisher/postprocess machinery; every
    image shares one static signature (the padded canvas), so grouping
    never fragments and exactly one fused program serves all shapes.
    """

    def __init__(self, model, variables, test_cfg, max_batch: int = 4,
                 max_wait_ms: float = 5.0, postprocess=None, mesh=None):
        super().__init__(model, variables, test_cfg, max_batch,
                         max_wait_ms, postprocess, mesh)
        self.views = CropViews(test_cfg.CROP_SIZE,
                               test_cfg.CROP_GRID_SIZE,
                               test_cfg.PAD_SIZE,
                               bool(test_cfg.FLIP))
        self.device_views = False
        # postprocess cls rows per slot (dispatch chunk slicing)
        self._cls_vpi = self.views.num_views
        self._coords = grid_coords(self.views.pad_size,
                                   (self.views.crop_h,
                                    self.views.crop_w),
                                   (self.views.grid_h,
                                    self.views.grid_w))
        self.infer_crops = make_crop_infer_fn(model)

    # -------------------------------------------------------------
    def _group_sig(self, image):
        return None  # one static canvas: every image fits every group

    def _dispatch_crops(self, canv_dev, owin_dev):
        return self.infer_crops(
            self.variables, canv_dev, owin_dev, coords=self._coords,
            crop_hw=(self.views.crop_h, self.views.crop_w),
            flip=self.views.flip)

    def warmup(self, image_sizes=None):
        """Compile the fused crop program + the postprocess program on
        the caller's thread (same rationale as the base class)."""
        cap = self.max_batch
        ph, pw = self.views.pad_size
        canv = self._put(jnp.zeros((cap, ph, pw, 3), jnp.uint8))
        wins = self._put(jnp.asarray(
            np.tile(np.asarray([0, 0, ph, pw], np.int32), (cap, 1))))
        cls, merged = self._dispatch_crops(canv, wins)
        np.asarray(jax.device_get(cls))
        if self.postprocess is None:
            return
        nc = int(merged.shape[-1])
        g = self.views.num_views
        cs = self._mesh_round(min(cap, self._pp_slot_cap(ph, pw, nc)))
        zero_sums = self._put(jnp.zeros((cs, ph, pw, nc), jnp.float32))
        zero_wn = np.tile(np.asarray([0, 0, ph, pw], np.int32), (cs, 1))
        zero_u8 = self._put(jnp.zeros((cs, ph, pw, 3), jnp.uint8))
        if bool(self.cfg.USE_GT_LABELS):
            dev = self.postprocess.dispatch_group(
                zero_sums, np.zeros((cs, nc - 1), np.float32), zero_wn,
                zero_u8, g)
            jax.tree.map(np.asarray, jax.device_get(dev))
        else:
            zero_cls = [self._put(jnp.zeros((cs * g, nc - 1),
                                            cls.dtype))]
            dev = self.postprocess.dispatch_group_cls(
                zero_sums, zero_cls, zero_wn, zero_u8, g,
                float(self.cfg.FP_CUT_SCORE))
            jax.tree.map(np.asarray, jax.device_get(dev[0]))
        if getattr(self.postprocess, "exact", None) is not None:
            self.postprocess.exact.warmup((ph, pw), nc)

    # ---------------------------------------------------------- worker
    def _process(self, group):
        cap = self.max_batch
        n = len(group)
        ph, pw = self.views.pad_size
        canv = np.zeros((cap, ph, pw, 3), np.uint8)
        owin = np.tile(np.asarray([0, 0, ph, pw], np.int32), (cap, 1))
        per_image = []
        for gi, (image, _, _) in enumerate(group):
            w, h = image.size
            if h > ph or w > pw:
                raise ValueError(
                    f"image {w}x{h} exceeds TEST.PAD_SIZE ({pw}x{ph}); "
                    "the reference CropLoader cannot pad it either "
                    "(pascal_voc_ms.py:193)")
            pt, pl = (ph - h) // 2, (pw - w) // 2
            canv[gi, pt:pt + h, pl:pl + w] = np.asarray(image, np.uint8)
            owin[gi] = (pt, pl, h, w)
            per_image.append((None, [(pt, pl, h, w)], None, (h, w)))
        canv_dev = self._put(jnp.asarray(canv))
        owin_dev = self._put(jnp.asarray(owin))
        cls, merged = self._dispatch_crops(canv_dev, owin_dev)

        gis = list(range(n))
        sig_batches = [(gis, (ph, pw), merged, canv_dev, [cls])]
        use_gt = (bool(self.cfg.USE_GT_LABELS)
                  and all(g[1] is not None for g in group))
        if self.postprocess is not None:
            if use_gt:
                labels_all = [g[1].astype(np.float32) for g in group]
                pending = self._dispatch_postprocess(
                    per_image, sig_batches, labels_all, group)
                self._submit_finish(
                    group, lambda: self._finalize_postprocess(
                        group, per_image, pending, labels_all))
            else:
                pending = self._dispatch_postprocess(
                    per_image, sig_batches, group=group)
                self._submit_finish(
                    group, lambda: self._finalize_postprocess(
                        group, per_image, pending))
            return

        # no device postprocess: resolve futures to host merged maps
        # with exactly the reference MergeCrops math (labels applied
        # after count-normalisation, no BG_POW)
        g_views = self.views.num_views

        def finish():
            mg = np.asarray(jax.device_get(merged), np.float32)
            cls_np = np.asarray(jax.device_get(cls), np.float32)
            for gi, (image, gt_labels, fut) in enumerate(group):
                pt, pl, h, w = per_image[gi][1][0]
                rows = [cls_np[gi * g_views + k] for k in range(g_views)]
                labels = self._labels(rows, gt_labels)
                m = mg[gi, pt:pt + h, pl:pl + w] / float(g_views)
                m = m.copy()
                m[..., 1:] *= labels[None, None, :]
                fut.set_result((m, labels))

        self._submit_finish(group, finish)
