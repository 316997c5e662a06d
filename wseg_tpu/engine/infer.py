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

from wseg_tpu.data.multiscale import (
    CropViews,
    MultiscaleViews,
    merge_crops,
    merge_multiscale,
)
from wseg_tpu.engine.train_loop import make_infer_fn


class InferenceEngine:
    def __init__(self, model, variables, test_cfg):
        self.model = model
        self.variables = variables
        self.cfg = test_cfg
        self.infer = make_infer_fn(model)  # jit caches per shape
        method = str(test_cfg.METHOD)
        if method == "multiscale":
            self.views = MultiscaleViews(
                test_cfg.SCALES, bool(test_cfg.FLIP), test_cfg.PAD_SIZE,
                bool(getattr(test_cfg, "PAD_PER_SCALE", False)),
                int(getattr(test_cfg, "PAD_ALIGN", 128)))
        elif method in ("multicrop", "crop"):
            self.views = CropViews(test_cfg.CROP_SIZE,
                                   test_cfg.CROP_GRID_SIZE,
                                   test_cfg.PAD_SIZE,
                                   bool(test_cfg.FLIP))
        else:
            raise NotImplementedError(f"Method {method} is unknown")
        self.method = method

    def _forward_views(self, views: List[np.ndarray]):
        """Group same-shape views into batches; returns per-view
        (cls, mask) in original order."""
        buckets: Dict[Tuple[int, int], List[int]] = {}
        for i, v in enumerate(views):
            buckets.setdefault(v.shape[:2], []).append(i)
        cls_out = [None] * len(views)
        mask_out = [None] * len(views)
        for shape, idxs in buckets.items():
            batch = np.stack([views[i] for i in idxs])
            cls, masks = self.infer(self.variables, batch)
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
            views, pads, flips = self.views.build(image)
            cls_views, mask_views = self._forward_views(views)
            labels = self.predict_labels(cls_views, gt_labels)
            merged = merge_multiscale(mask_views, pads, flips, labels,
                                      (h, w), float(self.cfg.BG_POW))
        else:
            views, coords, flips = self.views.build(image)
            cls_views, mask_views = self._forward_views(views)
            labels = self.predict_labels(cls_views, gt_labels)
            merged = merge_crops(mask_views, coords, flips, labels, (h, w))
        return merged, labels
