"""Batched multi-scale inference server.

Production serving path: callers submit PIL images and receive futures;
a background worker groups up to ``max_batch`` images, stacks all their
scale/flip views per static bucket shape, runs one program per bucket
(cross-image batching measured +30% throughput on v5e vs per-image
dispatch), merges on device, and resolves the futures with (H, W, C)
mask scores + predicted labels.

The device work for a whole group is dispatched before any fetch, so
host<->device transfers overlap with compute.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

import jax

from wseg_tpu.data.multiscale import MultiscaleViews, merge_multiscale
from wseg_tpu.engine.train_loop import make_infer_fn


class MultiScaleServer:
    def __init__(self, model, variables, test_cfg, max_batch: int = 4,
                 max_wait_ms: float = 5.0, postprocess=None):
        self.model = model
        self.variables = variables
        self.cfg = test_cfg
        self.uint8 = bool(getattr(test_cfg, "UINT8_TRANSFER", False))
        self.infer = make_infer_fn(model, device_norm=self.uint8)
        self.views = MultiscaleViews(
            test_cfg.SCALES, bool(test_cfg.FLIP), test_cfg.PAD_SIZE,
            bool(getattr(test_cfg, "PAD_PER_SCALE", True)),
            int(getattr(test_cfg, "PAD_ALIGN", 128)),
            transfer="uint8" if self.uint8 else "float32")
        # optional device writer-math hook (engine.infer.
        # make_device_postprocess); futures then resolve to
        # (postprocess_result, labels) instead of (merged, labels)
        self.postprocess = postprocess
        if postprocess is not None:
            assert self.uint8, \
                "device postprocess needs TEST.UINT8_TRANSFER (its CRF " \
                "reads the raw uint8 scale-1.0 view)"
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------- API
    def warmup(self, image_sizes: List[Tuple[int, int]]):
        """Synchronously compile the bucket programs for the given
        (width, height) image sizes ON THE CALLER'S THREAD.  XLA compiles
        triggered inside the worker thread have been observed to abort on
        some backends; warming up front also keeps first-request latency
        predictable."""
        vpi = self.views.num_views // len(self.views.scales)
        cap = vpi * self.max_batch
        seen = set()
        dt = np.uint8 if self.uint8 else np.float32
        for (w, h) in image_sizes:
            for (ph, pw) in self.views.view_shapes(w, h):
                if (ph, pw) in seen:
                    continue
                seen.add((ph, pw))
                dummy = np.zeros((cap, ph, pw, 3), dt)
                cls, masks = self._infer(dummy, np.zeros((cap, 4)))
                np.asarray(jax.device_get(cls))

    def _infer(self, batch, pads_rows):
        if self.uint8:
            return self.infer(self.variables, batch,
                              np.asarray(pads_rows, np.int32))
        return self.infer(self.variables, batch)

    def submit(self, image: Image.Image,
               gt_labels: Optional[np.ndarray] = None) -> Future:
        """Returns a Future resolving to (merged (H,W,C), labels)."""
        fut: Future = Future()
        self._q.put((image, gt_labels, fut))
        return fut

    def close(self):
        self._stop.set()
        self._q.put(None)
        self._worker.join(timeout=10)

    # ---------------------------------------------------------- worker
    def _collect_group(self):
        item = self._q.get()
        if item is None:
            return []
        group = [item]
        import time
        deadline = time.time() + self.max_wait
        while len(group) < self.max_batch:
            timeout = deadline - time.time()
            if timeout <= 0:
                break
            try:
                nxt = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)
                break
            group.append(nxt)
        return group

    def _run(self):
        while not self._stop.is_set():
            group = self._collect_group()
            if not group:
                if self._stop.is_set() or self._q.empty():
                    if self._stop.is_set():
                        return
                continue
            try:
                self._process(group)
            except Exception as e:  # pragma: no cover
                for _, _, fut in group:
                    if not fut.done():
                        fut.set_exception(e)

    def _process(self, group):
        per_image = []  # (views, pads, flips, size_hw)
        for image, _, _ in group:
            w, h = image.size
            views, pads, flips = self.views.build(image)
            per_image.append((views, pads, flips, (h, w)))

        # bucket across ALL images of the group
        buckets: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}
        for gi, (views, _, _, _) in enumerate(per_image):
            for vi, v in enumerate(views):
                buckets.setdefault(v.shape[:2], []).append((gi, vi))

        # dispatch every bucket program before fetching anything; pad each
        # bucket batch up to views-per-image * max_batch so ONE static
        # shape per bucket is ever compiled, regardless of group size
        vpi = self.views.num_views // len(self.views.scales)
        cap = vpi * self.max_batch
        pending = []
        for shape, idxs in buckets.items():
            arrs = [per_image[gi][0][vi] for gi, vi in idxs]
            wins = [per_image[gi][1][vi] for gi, vi in idxs]
            n_real = len(arrs)
            pad_n = (-n_real) % cap
            if n_real < cap:
                pad_n = cap - n_real
            if pad_n:
                arrs = arrs + [np.zeros_like(arrs[0])] * pad_n
                wins = wins + [(0, 0, 0, 0)] * pad_n
            batch = np.stack(arrs)
            pending.append((idxs, self._infer(batch, wins)))

        if bool(getattr(self.cfg, "DEVICE_MERGE", False)):
            self._finish_device_merge(group, per_image, pending)
            return

        cls_out = [[None] * len(pi[0]) for pi in per_image]
        mask_out = [[None] * len(pi[0]) for pi in per_image]
        for idxs, (cls, masks) in pending:
            cls = np.asarray(jax.device_get(cls), np.float32)
            masks = np.asarray(jax.device_get(masks), np.float32)
            for k, (gi, vi) in enumerate(idxs):
                cls_out[gi][vi] = cls[k]
                mask_out[gi][vi] = masks[k]

        for gi, (image, gt_labels, fut) in enumerate(group):
            _, pads, flips, size_hw = per_image[gi]
            labels = self._labels(cls_out[gi], gt_labels)
            merged = merge_multiscale(mask_out[gi], pads, flips, labels,
                                      size_hw, float(self.cfg.BG_POW))
            fut.set_result((merged, labels))

    def _labels(self, cls_views, gt_labels):
        if bool(self.cfg.USE_GT_LABELS) and gt_labels is not None:
            return gt_labels.astype(np.float32)
        sig = 1.0 / (1.0 + np.exp(-np.stack(cls_views)))
        return (sig.max(axis=0) >
                float(self.cfg.FP_CUT_SCORE)).astype(np.float32)

    def _finish_device_merge(self, group, per_image, pending):
        """Merge every image's views on device and fetch only the merged
        maps (~1/num_views of the host-merge transfer volume).  Each
        image's per-bucket views are contiguous, image-major slices of the
        bucket batch, so the merge runs on static-shaped device slices."""
        import jax.numpy as jnp

        from wseg_tpu.engine.infer import (
            _device_merge_bucket,
            finalize_device_merge,
        )

        n = len(group)
        cls_out = [[None] * len(pi[0]) for pi in per_image]
        sums = [None] * n
        merge_hw = []
        for image, _, _ in group:
            w, h = image.size
            merge_hw.append(tuple(self.views.view_shapes(w, h)[0]))

        for idxs, (cls, masks) in pending:
            cls_np = np.asarray(jax.device_get(cls), np.float32)
            for k, (gi, vi) in enumerate(idxs):
                cls_out[gi][vi] = cls_np[k]
            # contiguous per-image runs within the bucket
            k = 0
            while k < len(idxs):
                gi = idxs[k][0]
                k1 = k
                while k1 < len(idxs) and idxs[k1][0] == gi:
                    k1 += 1
                vis = [vi for _, vi in idxs[k:k1]]
                _, pads, flips, _ = per_image[gi]
                src = jnp.asarray([pads[vi] for vi in vis], jnp.float32)
                fl = jnp.asarray([flips[vi] for vi in vis])
                dst = jnp.asarray(pads[0], jnp.float32)
                m = _device_merge_bucket(masks[k:k1], src, dst, fl,
                                         merge_hw[gi])
                sums[gi] = m if sums[gi] is None else sums[gi] + m
                k = k1

        for gi, (image, gt_labels, fut) in enumerate(group):
            views, pads, flips, size_hw = per_image[gi]
            labels = self._labels(cls_out[gi], gt_labels)
            if self.postprocess is not None:
                # device writer-math: only uint8 label maps are fetched
                res = self.postprocess(sums[gi], labels, pads[0],
                                       views[0], size_hw,
                                       self.views.num_views)
                fut.set_result((res, labels))
                continue
            merged = finalize_device_merge(
                sums[gi], pads[0], size_hw, labels,
                self.views.num_views, float(self.cfg.BG_POW))
            fut.set_result((merged, labels))
