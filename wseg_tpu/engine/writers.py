"""Result writers: merged masks -> threshold/argmax -> paletted PNGs.

Replaces reference utils/inference_tools.py:14-126.  Outputs per image:
``no_crf/<name>.png`` (argmax mask), ``crf/<name>.png`` (CRF-refined),
``vis/<name>.png`` (overlay strip pred|[crf]|gt), optional ``heatmap/`` and
``scoremap/*.npy``.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
from PIL import Image

from wseg_tpu.data.pascal_voc import get_palette


def _save_indexed_png(path: str, mask: np.ndarray):
    # single-pass RLE-deflate encoder (utils/fastpng.py, native C when
    # built): ~7x faster than PIL at compress_level=1 — the encode runs
    # on the host CPU, which is the e2e inference bottleneck once the
    # device path is pipelined
    from wseg_tpu.utils.fastpng import write_indexed_png
    write_indexed_png(path, np.asarray(mask, np.uint8), get_palette())


def _mask2rgb(mask: np.ndarray) -> np.ndarray:
    cmap = np.asarray(get_palette(), np.float32).reshape(-1, 3) / 255.0
    return cmap[mask.astype(np.int32) % 256]


def threshold_and_argmax(scores: np.ndarray, prospect_thresh: float
                         ) -> np.ndarray:
    """Zero foreground scores below the threshold, then argmax
    (reference inference_tools.py:85-88)."""
    s = scores.copy()
    fg = s[..., 1:]
    fg[fg < prospect_thresh] = 0.0
    s[..., 1:] = fg
    return np.argmax(s, axis=-1)


class ResultWriter:
    def __init__(self, test_cfg, out_path: str, prospect_thresh: float = 0.5,
                 verbose: bool = True, heatmap: bool = False,
                 scoremap: bool = False, use_crf: bool = False,
                 crf_fn=None):
        self.cfg = test_cfg
        self.root = out_path
        self.prospect_thresh = prospect_thresh
        self.verbose = verbose
        self.heatmap = heatmap
        self.scoremap = scoremap
        self.use_crf = use_crf
        self.crf_fn = crf_fn
        for sub in ["no_crf", "crf", "vis"] + (
                ["heatmap"] if heatmap else []) + (
                ["scoremap"] if scoremap else []):
            os.makedirs(os.path.join(out_path, sub), exist_ok=True)

    def _overlay(self, mask: np.ndarray, image01: np.ndarray,
                 alpha: float = 0.3) -> np.ndarray:
        return alpha * image01 + (1 - alpha) * _mask2rgb(mask)

    def save_pred(self, img_name: str, image01: np.ndarray,
                  pred: np.ndarray, pred_crf: Optional[np.ndarray] = None,
                  gt_mask: Optional[np.ndarray] = None):
        """Save precomputed label maps (the device-postprocess path: the
        threshold/argmax/CRF math already ran on device)."""
        name = os.path.basename(img_name)
        for ext in (".jpg", ".png"):
            if name.endswith(ext):
                name = name[: -len(ext)]
        _save_indexed_png(os.path.join(self.root, "no_crf", name + ".png"),
                          pred)
        if pred_crf is not None:
            _save_indexed_png(os.path.join(self.root, "crf", name + ".png"),
                              pred_crf)
        if self.verbose and gt_mask is not None:
            panels = [pred] + ([pred_crf] if pred_crf is not None else []) \
                + [gt_mask]
            strip = np.concatenate(panels, axis=1).astype(np.uint8)
            imgs = np.concatenate([image01] * len(panels), axis=1)
            overlay = self._overlay(strip, imgs)
            out = np.round(255.0 * overlay).astype(np.uint8)
            Image.fromarray(out).save(
                os.path.join(self.root, "vis", name + ".png"))

    def save(self, img_name: str, image01: np.ndarray,
             merged_mask: np.ndarray, gt_mask: Optional[np.ndarray] = None):
        """Args: image01 (H,W,3) in [0,1]; merged_mask (H,W,C) scores."""
        name = os.path.basename(img_name)
        for ext in (".jpg", ".png"):
            if name.endswith(ext):
                name = name[: -len(ext)]

        pred_crf = None
        if self.use_crf and self.crf_fn is not None:
            img255 = np.round(255.0 * image01).astype(np.uint8)
            probs_crf = self.crf_fn(img255, merged_mask)
            pred_crf = threshold_and_argmax(probs_crf,
                                            self.prospect_thresh)

        if self.heatmap or self.scoremap:
            score_map = np.max(merged_mask[..., 1:], axis=-1)

        pred = threshold_and_argmax(merged_mask, self.prospect_thresh)

        _save_indexed_png(os.path.join(self.root, "no_crf", name + ".png"),
                          pred)
        if pred_crf is not None:
            _save_indexed_png(os.path.join(self.root, "crf", name + ".png"),
                              pred_crf)

        if self.verbose and gt_mask is not None:
            panels = [pred] + ([pred_crf] if pred_crf is not None else []) \
                + [gt_mask]
            strip = np.concatenate(panels, axis=1).astype(np.uint8)
            imgs = np.concatenate([image01] * len(panels), axis=1)
            overlay = self._overlay(strip, imgs)
            out = np.round(255.0 * overlay).astype(np.uint8)
            Image.fromarray(out).save(
                os.path.join(self.root, "vis", name + ".png"))

        if self.heatmap:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.cm as cm
            hm = cm.hot(score_map)[..., :3]
            hm = 0.3 * image01 + 0.7 * hm
            Image.fromarray(np.round(255 * hm).astype(np.uint8)).save(
                os.path.join(self.root, "heatmap", name + ".png"))

        if self.scoremap:
            sm = score_map.copy()
            bgpix = pred == 0
            sm[bgpix] = 1 - sm[bgpix]
            np.save(os.path.join(self.root, "scoremap", name + ".npy"), sm)


class PAMRWriter:
    """Per-iteration PAMR visualiser: for each image, writes the GT
    overlay and one overlay per refinement iteration
    (reference utils/inference_tools.py:303-346)."""

    def __init__(self, out_path: str):
        self.root = out_path
        os.makedirs(out_path, exist_ok=True)

    def _overlay(self, mask_idx: np.ndarray, image01: np.ndarray,
                 alpha: float = 0.5) -> np.ndarray:
        return alpha * image01 + (1 - alpha) * _mask2rgb(mask_idx)

    def save_image(self, img_name: str, image01: np.ndarray,
                   per_iter_masks, gt_mask: Optional[np.ndarray] = None):
        """per_iter_masks: sequence of (H, W, C) float mask snapshots."""
        name = os.path.basename(img_name).split(".")[0]
        if gt_mask is not None:
            out = np.round(255 * self._overlay(
                gt_mask.astype(np.uint8), image01)).astype(np.uint8)
            Image.fromarray(out).save(
                os.path.join(self.root, name + "_gt.png"))
        for it, m in enumerate(per_iter_masks):
            idx = np.argmax(m, axis=-1).astype(np.uint8)
            ambiguous = m.sum(-1) == 0
            idx[ambiguous] = 255
            out = np.round(255 * self._overlay(idx, image01)).astype(
                np.uint8)
            Image.fromarray(out).save(
                os.path.join(self.root, name + "_{:02d}.png".format(it)))
