"""Multi-scale / multi-crop inference view generation and mask merging.

Replaces reference datasets/pascal_voc_ms.py + the merge math in
utils/inference_tools.py:128-161.

TPU-first split of responsibilities:
  * view generation (host): resize (PIL cubic) / flip / zero-pad each view
    to a STATIC padded size, so the device sees one compiled program per
    (scale-bucket) shape.  The reference pads every view to one global
    PAD_SIZE (1024^2); with ``pad_per_scale`` each scale gets a tight
    bucket rounded to ``pad_align``, saving up to ~2.3x FLOPs at identical
    merged output (padding is cut before merging either way).
  * forward (device): batched views.
  * merge (host, cv2): cut padding -> bilinear resize to the original HW
    (half-pixel sampling = torch align_corners=False, reference
    inference_tools.py:143) -> unflip -> zero non-GT channels -> mean over
    views -> BG^BG_POW.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import cv2
import numpy as np
from PIL import Image

from wseg_tpu.data.pascal_voc import MEAN, STD, labels_from_mask


def _round_up(x: int, align: int) -> int:
    return int(math.ceil(x / align) * align)


class MultiscaleViews:
    """Generate scale/flip views of one image.

    Views are returned grouped by padded shape (bucket) so each bucket is
    one jit-compiled forward.  View order within the flat list matches the
    reference: for each scale, [view, flipped-view] when flip is on.
    """

    def __init__(self, scales: Sequence[float], flip: bool,
                 pad_size: Tuple[int, int], pad_per_scale: bool = False,
                 pad_align: int = 128, transfer: str = "float32"):
        self.scales = list(scales)
        self.flip = flip
        self.pad_size = tuple(int(p) for p in pad_size)
        self.pad_per_scale = pad_per_scale
        self.pad_align = pad_align
        # "uint8": ship raw resized pixels (4x less host->device traffic)
        # and let the device normalise + zero the padding (exact: PIL
        # resize outputs uint8 anyway, so nothing is quantised)
        self.transfer = transfer

    @property
    def num_views(self) -> int:
        return len(self.scales) * (2 if self.flip else 1)

    def view_shapes(self, w: int, h: int) -> List[Tuple[int, int]]:
        """Padded (H, W) per scale."""
        shapes = []
        for s in self.scales:
            if self.pad_per_scale:
                th = _round_up(int(round(h * s)), self.pad_align)
                tw = _round_up(int(round(w * s)), self.pad_align)
                shapes.append((th, tw))
            else:
                shapes.append(self.pad_size)
        return shapes

    def view_windows(self, w: int, h: int):
        """(pads, flips) per flat view id — the window arithmetic of
        ``build`` without touching pixels (used by the device-side view
        generator, ops/view_gen.py)."""
        pads, flips = [], []
        for s, (ph, pw) in zip(self.scales, self.view_shapes(w, h)):
            tw, th = int(round(w * s)), int(round(h * s))
            pt, pl = max(0, (ph - th) // 2), max(0, (pw - tw) // 2)
            for do_flip in ([False, True] if self.flip else [False]):
                pads.append((pt, pl, th, tw))
                flips.append(do_flip)
        return pads, flips

    def build_device(self, image: Image.Image, canvas_hw):
        """Host side of the device view path: place the original into a
        static uint8 canvas; all resize/flip/pad happens on device.

        Returns (canvas (Hc, Wc, 3) uint8, owin (4,), pads, flips) with
        pads/flips as in ``build``.  The original sits at the canvas
        top-left, owin = (0, 0, h, w).
        """
        w, h = image.size
        ch, cw = canvas_hw
        assert h <= ch and w <= cw, ((h, w), canvas_hw)
        canvas = np.zeros((ch, cw, 3), np.uint8)
        canvas[:h, :w] = np.asarray(image.convert("RGB"))
        pads, flips = self.view_windows(w, h)
        return canvas, (0, 0, h, w), pads, flips

    def build(self, image: Image.Image):
        """Returns (views, pads, flips): lists indexed by flat view id.

        views: float32 (Hp, Wp, 3) ImageNet-normalised with zeroed padding;
        pads:  (pad_t, pad_l, h, w) ints (reference pascal_voc_ms.py:150);
        flips: bool per view.
        """
        w, h = image.size
        shapes = self.view_shapes(w, h)
        views, pads, flips = [], [], []
        uint8 = self.transfer == "uint8"
        mean = np.asarray(MEAN, np.float32)
        std = np.asarray(STD, np.float32)
        for s, (ph, pw) in zip(self.scales, shapes):
            tw, th = int(round(w * s)), int(round(h * s))
            img_s = image.resize((tw, th), Image.BICUBIC)
            for do_flip in ([False, True] if self.flip else [False]):
                im = img_s.transpose(Image.FLIP_LEFT_RIGHT) if do_flip \
                    else img_s
                arr = np.asarray(im)
                if not uint8:
                    arr = (arr.astype(np.float32) / 255.0 - mean) / std
                pad_h, pad_w = ph - th, pw - tw
                assert pad_h >= 0 and pad_w >= 0, \
                    f"view {th}x{tw} exceeds pad {ph}x{pw}"
                pt, pl = max(0, pad_h // 2), max(0, pad_w // 2)
                canvas = np.zeros((ph, pw, 3),
                                  np.uint8 if uint8 else np.float32)
                canvas[pt:pt + th, pl:pl + tw] = arr
                views.append(canvas)
                pads.append((pt, pl, th, tw))
                flips.append(do_flip)
        return views, pads, flips


def merge_multiscale(masks: np.ndarray, pads, flips, labels_fg: np.ndarray,
                     imsize_hw: Tuple[int, int], bg_pow: float = 3.0
                     ) -> np.ndarray:
    """Merge per-view masks into one (H, W, C) map.

    Args:
      masks: list/array of per-view (Hp, Wp, C) float maps (padded size may
        differ per view).
      pads: per-view (pad_t, pad_l, h, w).
      flips: per-view bool.
      labels_fg: (C-1,) multi-hot foreground image labels.
      imsize_hw: original image (H, W).
    """
    H, W = imsize_hw
    acc = None
    n = 0
    for m, (pt, pl, h, w), fl in zip(masks, pads, flips):
        cut = np.asarray(m[pt:pt + h, pl:pl + w], np.float32)
        cut = cv2.resize(cut, (W, H), interpolation=cv2.INTER_LINEAR)
        if fl:
            cut = cut[:, ::-1]
        cut[..., 1:] *= labels_fg[None, None, :]
        acc = cut if acc is None else acc + cut
        n += 1
    mean = acc / n
    mean[..., 0] = np.power(mean[..., 0], bg_pow)
    return mean


class CropViews:
    """Sliding-window crop views (TEST.METHOD=multicrop).

    reference datasets/pascal_voc_ms.py:180-243: grid of CROP_SIZE crops at
    strides ceil(pad/grid) over the padded image, flip variant FIRST when
    flip is on (the reference flips even indices, CropLoader:213).
    """

    def __init__(self, crop_size, grid_size, pad_size, flip: bool):
        self.crop_h, self.crop_w = (int(c) for c in crop_size)
        self.grid_h, self.grid_w = (int(g) for g in grid_size)
        self.pad_size = tuple(int(p) for p in pad_size)
        self.flip = flip
        self.stride_h = math.ceil(self.pad_size[0] / self.grid_h)
        self.stride_w = math.ceil(self.pad_size[1] / self.grid_w)
        # reference pascal_voc_ms.py:192-195 asserts stride <= crop so
        # the grid tiles the canvas with no uncovered bands
        assert (self.crop_h <= self.pad_size[0]
                and self.crop_w <= self.pad_size[1]), (
            f"crop {self.crop_h}x{self.crop_w} exceeds padded canvas "
            f"{self.pad_size}")
        assert (self.stride_h <= self.crop_h
                and self.stride_w <= self.crop_w), (
            f"crop grid is sparse: stride {self.stride_h}x"
            f"{self.stride_w} > crop {self.crop_h}x{self.crop_w}")

    @property
    def num_views(self):
        return self.grid_h * self.grid_w * (2 if self.flip else 1)

    def build(self, image: Image.Image):
        w, h = image.size
        ph, pw = self.pad_size
        pad_h, pad_w = ph - h, pw - w
        pt, pl = max(0, pad_h // 2), max(0, pad_w // 2)
        mean = np.asarray(MEAN, np.float32)
        std = np.asarray(STD, np.float32)
        arr = (np.asarray(image, np.float32) / 255.0 - mean) / std
        canvas = np.zeros((ph, pw, 3), np.float32)
        canvas[pt:pt + h, pl:pl + w] = arr

        views, coords, flips = [], [], []
        for gi in range(self.grid_h):
            for gj in range(self.grid_w):
                s_h = gi * self.stride_h
                e_h = min(s_h + self.crop_h, ph)
                s_h = e_h - self.crop_h
                s_w = gj * self.stride_w
                e_w = min(s_w + self.crop_w, pw)
                s_w = e_w - self.crop_w
                crop = canvas[s_h:e_h, s_w:e_w]
                for k, do_flip in enumerate(
                        [True, False] if self.flip else [False]):
                    v = crop[:, ::-1] if do_flip else crop
                    views.append(np.ascontiguousarray(v))
                    coords.append((s_h, e_h, s_w, e_w, pt, pl))
                    flips.append(do_flip)
        return views, coords, flips


def merge_crops(masks, coords, flips, labels_fg, imsize_hw) -> np.ndarray:
    """Reassemble crop-view masks with overlap counting
    (reference utils/inference_tools.py:257-301)."""
    H, W = imsize_hw
    C = masks[0].shape[-1]
    total = np.zeros((H, W, C), np.float32)
    counts = np.zeros((H, W), np.float32)
    for m, (s_h, e_h, s_w, e_w, pt, pl), fl in zip(masks, coords, flips):
        m = np.asarray(m, np.float32)
        if fl:
            m = m[:, ::-1]
        m_h = 0 if s_h > 0 else pt
        m_w = 0 if s_w > 0 else pl
        s_h2 = max(0, s_h - pt)
        s_w2 = max(0, s_w - pl)
        e_h2 = min(e_h - pt, H)
        e_w2 = min(e_w - pl, W)
        m_he = m_h + e_h2 - s_h2
        m_we = m_w + e_w2 - s_w2
        total[s_h2:e_h2, s_w2:e_w2] += m[m_h:m_he, m_w:m_we]
        counts[s_h2:e_h2, s_w2:e_w2] += 1
    assert np.all(counts > 0)
    total /= counts[..., None]
    total[..., 1:] *= labels_fg[None, None, :]
    return total
