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
from collections import deque
from concurrent.futures import Future
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

import jax

from wseg_tpu.data.multiscale import (
    MultiscaleViews,
    _round_up,
    merge_multiscale,
)
from wseg_tpu.engine.train_loop import make_infer_fn


class MultiScaleServer:
    def __init__(self, model, variables, test_cfg, max_batch: int = 4,
                 max_wait_ms: float = 5.0, postprocess=None, mesh=None):
        self.model = model
        self.variables = variables
        self.cfg = test_cfg
        # data-parallel inference (reference infer_val.py:99 wraps the
        # infer model in nn.DataParallel): params replicate over the
        # mesh, every slot/view-batched program's leading axis shards
        # over ``data`` and XLA splits the convs per device.  Groups are
        # always padded to max_batch, so shapes divide evenly.
        self.mesh = mesh
        if mesh is not None:
            n_data = int(mesh.shape["data"])
            if max_batch % n_data != 0:
                # derive a shardable slot count rather than erroring:
                # round UP to the next multiple of the data axis (>= one
                # slot per device) so every slot batch splits evenly
                new_mb = max(n_data, -(-max_batch // n_data) * n_data)
                import warnings
                warnings.warn(
                    f"max_batch {max_batch} rounded to {new_mb} to "
                    f"shard evenly over the {n_data}-way mesh data "
                    f"axis")
                max_batch = new_mb
            from wseg_tpu.parallel.mesh import replicate
            self.variables = replicate(mesh, variables)
        self.uint8 = bool(getattr(test_cfg, "UINT8_TRANSFER", False))
        self.infer = make_infer_fn(model, device_norm=self.uint8)
        self.views = MultiscaleViews(
            test_cfg.SCALES, bool(test_cfg.FLIP), test_cfg.PAD_SIZE,
            bool(getattr(test_cfg, "PAD_PER_SCALE", True)),
            int(getattr(test_cfg, "PAD_ALIGN", 128)),
            transfer="uint8" if self.uint8 else "float32")
        # device-side view generation: upload ONE uint8 original per
        # image; cubic resize / flip / pad run on device
        # (ops/view_gen.py).  Needs scale 1.0 first (merge canvas) and a
        # static original canvas sized so every scaled view fits the
        # buckets; oversized images fall back to the host path.
        self.device_views = (
            self.uint8
            and bool(getattr(test_cfg, "DEVICE_VIEWS", False))
            and len(self.views.scales) > 0
            and float(self.views.scales[0]) == 1.0)
        if self.device_views:
            from wseg_tpu.engine.infer import make_infer_merge_fn
            self.infer_mv = make_infer_merge_fn(model)
            ph, pw = (int(p) for p in test_cfg.PAD_SIZE)
            ms = max(float(s) for s in self.views.scales)
            self.canvas_hw = (_round_up(int(ph / ms), 64),
                              _round_up(int(pw / ms), 64))
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
        # postprocess cls rows per slot (chunk slicing in
        # _dispatch_postprocess); MultiCropServer overrides with its
        # grid view count
        self._cls_vpi = 2 if self.views.flip else 1
        self._q: "queue.Queue" = queue.Queue()
        self._stash = deque()  # different-signature arrivals, oldest first
        self._stop = threading.Event()
        # single finisher thread: fetches + finalisation of group N
        # overlap the device dispatches of group N+1 (FIFO, so result
        # order is preserved)
        from concurrent.futures import ThreadPoolExecutor
        self._finisher = ThreadPoolExecutor(1)
        # exact-CRF stage (TEST.CRF_MODE=exact): host lattice builds +
        # per-image program dispatches run here, overlapped with the
        # worker's next group
        self._crf_pool = None
        if getattr(postprocess, "exact", None) is not None:
            # two threads: one image's host lattice build overlaps
            # another's table upload / device wait (both release the
            # GIL); more threads just contend on the 1-core host
            self._crf_pool = ThreadPoolExecutor(2)
            # bound the in-flight exact jobs: every pending job pins its
            # chunk's (S, Hc, Wc, C) merged stack in HBM, and the host
            # lattice builds are slower than the forward pipeline
            self._crf_slots = threading.BoundedSemaphore(4)
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
        host_sizes = list(image_sizes)
        if self.device_views:
            import jax.numpy as jnp

            from wseg_tpu.ops.view_gen import build_views_u8
            ch, cw = self.canvas_hw
            # warm with PRODUCTION shardings: the input sharding is
            # part of the compiled-program key, so an unsharded warmup
            # would not pre-compile the mesh path
            canv = self._put(jnp.zeros((self.max_batch, ch, cw, 3),
                                       jnp.uint8))
            wins = self._put(jnp.zeros((self.max_batch, 4), jnp.int32))
            seen = set()
            pp_seen = set()
            # oversized images fall back to the host path (warmed below)
            host_sizes = [(w, h) for (w, h) in image_sizes
                          if not (h <= ch and w <= cw)]
            for (w, h) in image_sizes:
                if (w, h) in host_sizes:
                    continue
                shapes = self.views.view_shapes(w, h)
                for si, (ph, pw) in enumerate(shapes):
                    key = (ph, pw, tuple(shapes[0]))
                    if key in seen:
                        continue
                    seen.add(key)
                    cls, _ = self.infer_mv(
                        self.variables, canv, wins, wins, wins,
                        out_hw=(ph, pw), flip_pair=self.views.flip,
                        merge_hw=tuple(shapes[0]))
                    np.asarray(jax.device_get(cls))
                    if si == 0 and self.postprocess is not None:
                        build_views_u8(canv, wins, wins, out_hw=(ph, pw),
                                       flip_pair=False)
                # the slot-batched postprocess program _resolve uses
                # (one per merge-canvas shape): a cold compile there
                # would otherwise land on the finisher thread
                mh, mw = shapes[0]
                if self.postprocess is not None and \
                        (mh, mw) not in pp_seen:
                    pp_seen.add((mh, mw))
                    nc = int(cls.shape[-1]) + 1
                    # warm at the CHUNKED slot count when the canvas is
                    # large (_pp_slot_cap) — the production dispatch
                    # uses the same shape
                    cs = self._mesh_round(min(
                        self.max_batch, self._pp_slot_cap(mh, mw, nc)))
                    zero_sums = self._put(jnp.zeros(
                        (cs, mh, mw, nc), jnp.float32))
                    zero_wn = np.tile(
                        np.asarray([0, 0, mh, mw], np.int32), (cs, 1))
                    zero_u8 = self._put(jnp.zeros(
                        (cs, mh, mw, 3), jnp.uint8))
                    if bool(self.cfg.USE_GT_LABELS):
                        dev = self.postprocess.dispatch_group(
                            zero_sums,
                            np.zeros((cs, nc - 1), np.float32),
                            zero_wn, zero_u8, self.views.num_views)
                        jax.tree.map(np.asarray, jax.device_get(dev))
                    else:
                        # production path computes labels on device
                        # from the per-scale cls logits — warm THAT
                        # program
                        vpi_d = 2 if self.views.flip else 1
                        zero_cls = [self._put(jnp.zeros(
                            (cs * vpi_d, nc - 1), cls.dtype))
                            for _ in shapes]
                        dev = self.postprocess.dispatch_group_cls(
                            zero_sums, zero_cls, zero_wn, zero_u8,
                            self.views.num_views,
                            float(self.cfg.FP_CUT_SCORE))
                        jax.tree.map(np.asarray, jax.device_get(dev[0]))
                    if getattr(self.postprocess, "exact", None) \
                            is not None:
                        self.postprocess.exact.warmup((mh, mw), nc)
        seen = set()
        pp_host_seen = set()
        dt = np.uint8 if self.uint8 else np.float32
        for (w, h) in host_sizes:
            for (ph, pw) in self.views.view_shapes(w, h):
                if (ph, pw) in seen:
                    continue
                seen.add((ph, pw))
                dummy = np.zeros((cap, ph, pw, 3), dt)
                cls, masks = self._infer(dummy, np.zeros((cap, 4)))
                np.asarray(jax.device_get(cls))
            # the host-view path also ends in the slot-batched
            # postprocess (_resolve) when one is configured — warm its
            # program too (a cold compile would land on the finisher
            # thread)
            mh, mw = self.views.view_shapes(w, h)[0]
            if self.postprocess is not None and \
                    bool(getattr(self.cfg, "DEVICE_MERGE", False)) and \
                    (mh, mw) not in pp_host_seen:
                import jax.numpy as jnp
                pp_host_seen.add((mh, mw))
                nc = int(cls.shape[-1]) + 1
                cs = self._mesh_round(min(
                    self.max_batch, self._pp_slot_cap(mh, mw, nc)))
                dev = self.postprocess.dispatch_group(
                    self._put(jnp.zeros((cs, mh, mw, nc), jnp.float32)),
                    np.zeros((cs, nc - 1), np.float32),
                    np.tile(np.asarray([0, 0, mh, mw], np.int32),
                            (cs, 1)),
                    self._put(jnp.zeros((cs, mh, mw, 3), jnp.uint8)),
                    self.views.num_views)
                jax.tree.map(np.asarray, jax.device_get(dev))
                if getattr(self.postprocess, "exact", None) is not None:
                    self.postprocess.exact.warmup((mh, mw), nc)

    def _put(self, x):
        """Shard a batched array's leading axis over the mesh ``data``
        axis (no-op without a mesh or when the axis doesn't divide)."""
        from wseg_tpu.parallel.mesh import shard_leading_if_divisible
        return shard_leading_if_divisible(self.mesh, x)

    def _infer(self, batch, pads_rows):
        if self.uint8:
            return self.infer(self.variables, self._put(batch),
                              np.asarray(pads_rows, np.int32))
        return self.infer(self.variables, self._put(batch))

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
        self._finisher.shutdown(wait=True)
        if self._crf_pool is not None:
            self._crf_pool.shutdown(wait=True)
        # Fail anything the worker never got to (still stashed/queued
        # at shutdown) so callers blocked on Future.result() without a
        # timeout unblock deterministically instead of hanging.
        orphans = list(self._stash)
        self._stash.clear()
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                orphans.append(item)
        for _, _, fut in orphans:
            if not fut.done():
                fut.set_exception(
                    RuntimeError("MultiScaleServer closed before this "
                                 "image was processed"))

    # ---------------------------------------------------------- worker
    def _group_sig(self, image):
        """Batching signature: images with the same signature share
        every compiled program of a group (canvas, buckets, merge
        shape).  A 500x375 and a 375x500 VOC image have different
        signatures — batching them together fragments the slot batch
        into two half-empty programs."""
        if not hasattr(self.views, "view_shapes"):
            return None
        w, h = image.size
        return tuple(self.views.view_shapes(w, h))

    def _collect_group(self):
        """Collect up to ``max_batch`` SAME-SIGNATURE images within the
        wait window.  Different-signature arrivals are stashed (arrival
        order preserved) and served first on the next call, so the
        oldest unprocessed image always defines the next group's
        signature — no starvation, bounded reordering."""
        import time

        def pop(timeout=None):
            if self._stash:
                return self._stash.popleft()
            if timeout is None:
                return self._q.get()
            return self._q.get(timeout=timeout)

        item = pop()
        if item is None:
            return []
        group = [item]
        sig0 = self._group_sig(item[0])
        misfits = []
        deadline = time.time() + self.max_wait
        while len(group) < self.max_batch:
            timeout = deadline - time.time()
            if timeout <= 0:
                break
            try:
                nxt = pop(timeout=timeout)
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)
                break
            if self._group_sig(nxt[0]) == sig0:
                group.append(nxt)
            else:
                misfits.append(nxt)
        if misfits:
            # misfits were popped before anything still stashed/queued
            misfits.extend(self._stash)
            self._stash = deque(misfits)
        return group

    def _run(self):
        while not self._stop.is_set():
            group = self._collect_group()
            if not group:
                # only the close() sentinel yields an empty group
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
        if self.device_views:
            # split rather than demote: one oversized image must not
            # push the whole group onto the (possibly cold) host path
            ch, cw = self.canvas_hw
            fits = [g[0].size[1] <= ch and g[0].size[0] <= cw
                    for g in group]
            fit = [g for g, ok in zip(group, fits) if ok]
            over = [g for g, ok in zip(group, fits) if not ok]
            if fit:
                self._process_device(fit)
            if not over:
                return
            group = over
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

    def _process_device(self, group):
        """Device-view path: ONE uint8 original upload per image;
        resize / flip / pad (ops/view_gen.py), forward, merge and writer
        math all run on device.  ~num_views less host->device traffic
        and no host PIL resizes — both bind e2e throughput on
        remote-attached chips.

        WSEG_DEBUG_SERVING=1 prints per-group phase times (host canvas
        build / upload / dispatch on the worker; fetch / finalise on
        the finisher)."""
        import os
        import time as _time

        import jax.numpy as jnp

        from wseg_tpu.ops.view_gen import build_views_u8

        dbg = bool(os.environ.get("WSEG_DEBUG_SERVING"))
        t0 = _time.perf_counter()

        cap = self.max_batch
        n = len(group)
        ch, cw = self.canvas_hw
        canv = np.zeros((cap, ch, cw, 3), np.uint8)
        owin = np.zeros((cap, 4), np.int32)
        per_image = []
        for gi, (image, _, _) in enumerate(group):
            c, ow, pads, flips = self.views.build_device(
                image, self.canvas_hw)
            canv[gi] = c
            owin[gi] = ow
            w, h = image.size
            per_image.append((None, pads, flips, (h, w)))
        t1 = _time.perf_counter()
        orig_dev = self._put(jnp.asarray(canv))
        owin_dev = self._put(jnp.asarray(owin))
        t2 = _time.perf_counter()

        vpi = 2 if self.views.flip else 1
        # partition by the full view-shape signature: same signature =>
        # same merge canvas and the same fused bucket programs
        sig: Dict[tuple, List[int]] = {}
        for gi in range(n):
            _, _, _, (h, w) = per_image[gi]
            sig.setdefault(tuple(self.views.view_shapes(w, h)),
                           []).append(gi)

        # sums and the scale-1.0 pixels stay SLOT-BATCHED (cap, ...) all
        # the way into the postprocess dispatch: the earlier per-image
        # slice + re-stack pattern cost ~18 extra device dispatches per
        # group, and each dispatch enqueue pays a link round trip on
        # remote-attached chips (tools/bench_postprocess.py header)
        sig_batches = []  # (gis, merge_hw, total, u8|None, cls_list)
        for shapes, gis in sig.items():
            dstwin = np.zeros((cap, 4), np.int32)
            for gi in gis:
                dstwin[gi] = per_image[gi][1][0]
            dst_dev = self._put(jnp.asarray(dstwin))
            total = None
            u8 = None
            cls_list = []
            for si, shp in enumerate(shapes):
                vwin = np.zeros((cap, 4), np.int32)
                for gi in gis:
                    vwin[gi] = per_image[gi][1][si * vpi]
                vw_dev = self._put(jnp.asarray(vwin))
                cls, part = self.infer_mv(
                    self.variables, orig_dev, owin_dev, vw_dev, dst_dev,
                    out_hw=tuple(shp), flip_pair=self.views.flip,
                    merge_hw=tuple(shapes[0]))
                total = part if total is None else total + part
                cls_list.append(cls)
                if si == 0 and self.postprocess is not None:
                    # raw scale-1.0 pixels for the postprocess CRF,
                    # kept on device
                    u8 = build_views_u8(orig_dev, owin_dev, vw_dev,
                                        out_hw=tuple(shp),
                                        flip_pair=False)
            sig_batches.append((gis, tuple(shapes[0]), total, u8,
                                cls_list))
        t3 = _time.perf_counter()

        # everything device-side is dispatched before any fetch; with GT
        # labels the postprocess dispatch happens HERE on the worker too
        # (the finisher is still fetching the previous group when the
        # device finishes this one's forwards — dispatching from there
        # left a measured ~200 ms device idle gap per few groups).
        # Fetches + finalisation run on the finisher thread so the
        # worker can start the next group immediately.
        use_gt = (bool(self.cfg.USE_GT_LABELS)
                  and all(g[1] is not None for g in group))
        if use_gt and self.postprocess is not None:
            labels_all = [g[1].astype(np.float32) for g in group]
            pending = self._dispatch_postprocess(per_image, sig_batches,
                                                 labels_all, group)
            t4 = _time.perf_counter()
            if dbg:
                print(f"[serving] n={n} build {1e3*(t1-t0):.0f} upload "
                      f"{1e3*(t2-t1):.0f} dispatch {1e3*(t3-t2):.0f} pp "
                      f"{1e3*(t4-t3):.0f} ms", flush=True)

            def finish():
                tf0 = _time.perf_counter()
                self._finalize_postprocess(group, per_image, pending,
                                           labels_all)
                if dbg:
                    print(f"[serving] n={n} finish "
                          f"{1e3*(_time.perf_counter()-tf0):.0f} ms",
                          flush=True)

            self._submit_finish(group, finish)
            return
        if self.postprocess is not None and \
                not bool(self.cfg.USE_GT_LABELS):
            # predicted labels compute ON DEVICE inside the postprocess
            # program (sigmoid-max-threshold over the per-view cls,
            # reference infer_val.py:115-125) — the worker dispatches
            # immediately; labels come back with the preds fetch
            pending = self._dispatch_postprocess(per_image,
                                                 sig_batches,
                                                 group=group)
            t4 = _time.perf_counter()
            if dbg:
                print(f"[serving] n={n} build {1e3*(t1-t0):.0f} upload "
                      f"{1e3*(t2-t1):.0f} dispatch {1e3*(t3-t2):.0f} pp "
                      f"{1e3*(t4-t3):.0f} ms (device labels)",
                      flush=True)

            def finish():
                tf0 = _time.perf_counter()
                self._finalize_postprocess(group, per_image, pending)
                if dbg:
                    print(f"[serving] n={n} finish "
                          f"{1e3*(_time.perf_counter()-tf0):.0f} ms",
                          flush=True)

            self._submit_finish(group, finish)
            return
        if dbg:
            print(f"[serving] n={n} build {1e3*(t1-t0):.0f} upload "
                  f"{1e3*(t2-t1):.0f} dispatch {1e3*(t3-t2):.0f} ms",
                  flush=True)

        def finish():
            tf0 = _time.perf_counter()
            if use_gt:
                labels_all = [g[1].astype(np.float32) for g in group]
            else:
                cls_calls = [(c, gis, si)
                             for gis, _, _, _, cl in sig_batches
                             for si, c in enumerate(cl)]
                cls_np = jax.device_get([c for c, _, _ in cls_calls])
                per_view_cls = [[None] * len(per_image[gi][1])
                                for gi in range(n)]
                for (c_dev, gis, si), c_arr in zip(cls_calls, cls_np):
                    for gi in gis:
                        for f in range(vpi):
                            per_view_cls[gi][si * vpi + f] = \
                                np.asarray(c_arr[gi * vpi + f],
                                           np.float32)
                labels_all = [
                    self._labels(per_view_cls[gi], group[gi][1])
                    for gi in range(n)]
            self._resolve_batched(group, per_image, sig_batches,
                                  labels_all)
            if dbg:
                print(f"[serving] n={n} finish "
                      f"{1e3*(_time.perf_counter()-tf0):.0f} ms",
                      flush=True)

        self._submit_finish(group, finish)

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
        bucket batch, so the merge runs on static-shaped device slices.

        Ordering matters on high-RTT links: ALL device work (merges,
        writer math) is dispatched before the first fetch, and the cls
        logits are not fetched at all when GT labels are supplied."""
        import jax.numpy as jnp

        from wseg_tpu.engine.infer import (
            _device_merge_bucket,
            finalize_device_merge,
        )

        n = len(group)
        cls_dev = [[None] * len(pi[1]) for pi in per_image]
        sums = [None] * n
        merge_hw = []
        for image, _, _ in group:
            w, h = image.size
            merge_hw.append(tuple(self.views.view_shapes(w, h)[0]))

        # phase 1: dispatch every merge; keep cls as device handles
        for idxs, (cls, masks) in pending:
            for k, (gi, vi) in enumerate(idxs):
                cls_dev[gi][vi] = cls[k]
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

        # phase 2+3 (fetches + finalisation) overlap the next group's
        # dispatches via the finisher thread
        def finish():
            use_gt = bool(self.cfg.USE_GT_LABELS)
            if use_gt and all(g[1] is not None for g in group):
                labels_all = [g[1].astype(np.float32) for g in group]
            else:
                cls_np = jax.device_get(cls_dev)
                labels_all = [self._labels(cls_np[gi], group[gi][1])
                              for gi in range(n)]
            self._resolve(group, per_image, sums, labels_all)

        self._submit_finish(group, finish)

    def _submit_finish(self, group, finish):
        """Run ``finish`` on the finisher thread; a failure there must
        still resolve the group's futures."""
        def guarded():
            try:
                finish()
            except Exception as e:  # pragma: no cover
                for _, _, fut in group:
                    if not fut.done():
                        fut.set_exception(e)
        self._finisher.submit(guarded)

    def _resolve(self, group, per_image, sums, labels_all):
        """Writer math + future resolution for device-merged sums.

        Images sharing the merge-canvas shape are slot-batched (padded
        to max_batch for a static program): one postprocess dispatch +
        one fetch per subgroup instead of per image."""
        import jax.numpy as jnp

        from wseg_tpu.engine.infer import finalize_device_merge

        n = len(group)
        if self.postprocess is not None:
            subgroups: Dict[Tuple[int, ...], List[int]] = {}
            for gi in range(n):
                subgroups.setdefault(tuple(sums[gi].shape), []).append(gi)
            pending_pp = []
            for shp, gis in subgroups.items():
                # pad to the HBM-budgeted chunk size, not max_batch (a
                # 16-slot program at the reference 1024^2 merge canvas
                # exceeds HBM; _pp_slot_cap)
                cs = self._mesh_round(min(
                    self.max_batch, self._pp_slot_cap(*shp)))
                for i in range(0, len(gis), cs):
                    chunk = gis[i:i + cs]
                    rows = chunk + [chunk[0]] * (cs - len(chunk))
                    sm = self._put(jnp.stack([sums[gi] for gi in rows]))
                    lb = np.stack([labels_all[gi] for gi in rows])
                    wn = np.stack([per_image[gi][1][0] for gi in rows])
                    im = self._put(jnp.stack([per_image[gi][0][0]
                                              for gi in rows]))
                    dev = self.postprocess.dispatch_group(
                        sm, lb, wn, im, self.views.num_views)
                    exact = getattr(self.postprocess, "crf_mode",
                                    "fast") == "exact"
                    rows = {gi: k for k, gi in enumerate(chunk)}
                    ex = None
                    if exact:
                        dev, merged = dev
                        ex = self._exact_jobs(group, per_image, chunk,
                                              rows, merged)
                    # don't pay fetch bytes for the padding rows
                    pending_pp.append((chunk, dev[:len(chunk)], ex))
            for gis, dev, ex in pending_pp:
                preds = np.asarray(jax.device_get(dev))
                for k, gi in enumerate(gis):
                    _, pads, _, size_hw = per_image[gi]
                    crf_np = None
                    if ex is not None:
                        crf_np = np.asarray(jax.device_get(
                            ex[gi].result()))
                    res = self.postprocess.finalize(
                        preds[k], pads[0], size_hw, crf_np)
                    group[gi][2].set_result((res, labels_all[gi]))
            return

        for gi, (image, gt_labels, fut) in enumerate(group):
            _, pads, _, size_hw = per_image[gi]
            merged = finalize_device_merge(
                sums[gi], pads[0], size_hw, labels_all[gi],
                self.views.num_views, float(self.cfg.BG_POW))
            fut.set_result((merged, labels_all[gi]))

    def _resolve_batched(self, group, per_image, sig_batches,
                         labels_all):
        """Writer math + future resolution for the device-views path:
        sums/pixels arrive SLOT-BATCHED per view-shape signature, so each
        signature costs exactly one postprocess dispatch and one fetch —
        no per-image slice/stack dispatches (each enqueue pays a link
        round trip on remote-attached chips).  Rows outside ``gis`` are
        padding (zero canvas / zero labels); their outputs are ignored.
        """
        import jax.numpy as jnp

        from wseg_tpu.engine.infer import finalize_device_merge

        if self.postprocess is None:
            for gis, _, total, _, _ in sig_batches:
                for gi in gis:
                    _, pads, _, size_hw = per_image[gi]
                    merged = finalize_device_merge(
                        total[gi], pads[0], size_hw, labels_all[gi],
                        self.views.num_views, float(self.cfg.BG_POW))
                    group[gi][2].set_result((merged, labels_all[gi]))
            return

        pending = self._dispatch_postprocess(per_image, sig_batches,
                                             labels_all, group)
        self._finalize_postprocess(group, per_image, pending, labels_all)

    @staticmethod
    def _chunk_starts(cap: int, cs: int, gis):
        """Static-shape chunk partition: start offsets covering [0, cap)
        with stride cs (last chunk re-covers earlier rows), plus each
        chunk's owned subset of ``gis`` (first chunk containing a row
        owns it)."""
        starts = sorted({min(s, cap - cs) for s in range(0, cap, cs)})
        out = []
        owned = set()
        for st in starts:
            sub = [gi for gi in gis
                   if st <= gi < st + cs and gi not in owned]
            owned.update(sub)
            if sub:
                out.append((st, sub))
        return out

    def _mesh_round(self, cs: int) -> int:
        """Round a chunk size DOWN to a multiple of the mesh data axis
        (>= one per device) so chunked postprocess dispatches keep the
        warmed sharded program shape; identity without a mesh."""
        if self.mesh is None:
            return cs
        nd = int(self.mesh.shape["data"])
        if nd > cs:
            # the mesh data axis exceeds the HBM-budgeted slot cap: the
            # dispatch cannot be both sharded-even AND within budget.
            # Round UP to one slot per device (sharding halves the
            # per-device canvas anyway) but say so — a silent 2x over
            # budget is how 20 GB programs land on 16 GB chips.
            import warnings
            warnings.warn(
                "postprocess chunk rounded UP to %d slots (mesh data "
                "axis) past the HBM-budgeted cap of %d; if sharding "
                "does not split the CRF working set evenly this "
                "program may exceed the per-chip HBM budget" % (nd, cs))
            return nd
        return max(nd, cs - cs % nd)

    @staticmethod
    def _pp_slot_cap(mh: int, mw: int, nc: int) -> int:
        """Max postprocess slots per dispatch for this merge canvas.

        The device CRF's working set is ~15x the slot's f32 canvas (a
        16-slot group at a 1024^2 canvas compiled to 20.2 GB on a
        15.75 GB chip); budget 10 GB.  Never binds at per-scale-bucket
        canvases (384x512 -> ~40 slots) — only the reference global
        PAD_SIZE mode (1024^2 merge canvas) gets chunked."""
        per_slot = mh * mw * nc * 4 * 15
        return max(1, int(10e9 // per_slot))

    def _exact_jobs(self, group, per_image, gis, rows, merged_dev):
        """Per-image exact-CRF stage (TEST.CRF_MODE=exact): host
        lattice build from the ORIGINAL pixels + one device program per
        image, on the dedicated crf thread so builds overlap device
        work.  Returns {gi: Future -> (n_crf, Hc, Wc) uint8 device}."""
        ex = self.postprocess.exact
        canvas_hw = (int(merged_dev.shape[1]), int(merged_dev.shape[2]))
        futs = {}
        for gi in gis:
            image = group[gi][0]
            window = per_image[gi][1][0]

            def job(image=image, window=window, row=rows[gi]):
                try:
                    img_np = np.asarray(image.convert("RGB"), np.uint8)
                    tables = ex.build(img_np, canvas_hw, window)
                    return ex.dispatch(tables, merged_dev, row)
                finally:
                    self._crf_slots.release()

            self._crf_slots.acquire()  # backpressure on the worker
            futs[gi] = self._crf_pool.submit(job)
        return futs

    def _dispatch_postprocess(self, per_image, sig_batches,
                              labels_all=None, group=None):
        """Postprocess dispatches per view-shape signature — ONE when
        the canvas allows, HBM-budget-sized chunks otherwise (static
        chunk shape: the last chunk re-covers earlier rows).

        ``labels_all`` given: GT labels ride as a host array (program =
        ``dispatch_group`` -> preds).  ``labels_all`` None: predicted
        labels compute INSIDE the program from the per-scale cls logits
        (program = ``dispatch_group_cls`` -> (preds, labels)).  One
        shared implementation of the chunk/row/gather logic serves
        both.  Returns [(gis, row-map, device result, exact-futs)]
        WITHOUT fetching; ``exact-futs`` is None unless the postprocess
        runs in exact-CRF mode (then the device result carries the
        merged maps and the futures resolve to per-image CRF preds)."""
        import jax.numpy as jnp

        exact = getattr(self.postprocess, "crf_mode", "fast") == "exact"
        vpi = self._cls_vpi
        fp_cut = float(self.cfg.FP_CUT_SCORE)
        pending = []
        for gis, _, total, u8, cls_list in sig_batches:
            cap, mh, mw, nc = total.shape
            wn = np.zeros((cap, 4), np.int32)
            for gi in gis:
                wn[gi] = per_image[gi][1][0]
            if labels_all is not None:
                lb = np.zeros((cap, nc - 1), np.float32)
                for gi in gis:
                    lb[gi] = labels_all[gi]

            def dispatch(st, n_rows):
                sl = slice(st, st + n_rows)
                whole = n_rows == cap
                tot = total if whole else self._put(total[sl])
                im = u8 if whole else self._put(u8[sl])
                if labels_all is not None:
                    return self.postprocess.dispatch_group(
                        tot, lb[sl], wn[sl], im, self.views.num_views)
                # slice cls rows only when actually chunking — each
                # device slice is an extra dispatch, and enqueues cost
                # a link round trip on remote-attached chips
                cls = cls_list if whole else [
                    self._put(c[st * vpi:(st + n_rows) * vpi])
                    for c in cls_list]
                return self.postprocess.dispatch_group_cls(
                    tot, cls, wn[sl], im, self.views.num_views, fp_cut)

            cs = self._mesh_round(
                min(cap, self._pp_slot_cap(mh, mw, nc)))
            if cs >= cap:
                dev = dispatch(0, cap)
                if len(gis) * 2 <= cap:
                    # sparse signature: gather the live rows on device
                    # rather than paying fetch bytes for the padding
                    idx = jnp.asarray(gis)
                    dev = jax.tree.map(lambda a: a[idx], dev)
                    rows = {gi: k for k, gi in enumerate(gis)}
                else:
                    rows = {gi: gi for gi in gis}
                ex = self._exact_jobs(group, per_image, gis, rows,
                                      dev[-1]) if exact else None
                pending.append((gis, rows, dev, ex))
                continue
            for st, sub in self._chunk_starts(cap, cs, gis):
                rows = {gi: gi - st for gi in sub}
                dev = dispatch(st, cs)
                ex = self._exact_jobs(group, per_image, sub, rows,
                                      dev[-1]) if exact else None
                pending.append((sub, rows, dev, ex))
        return pending

    def _finalize_postprocess(self, group, per_image, pending,
                              labels_all=None):
        """Fetch + resolve.  With device-computed labels the result is
        a (preds, labels) pair fetched together.  In exact-CRF mode the
        device result also carries the merged maps (dropped here) and
        per-image CRF preds arrive via the exact futures."""
        for gis, rows, dev, ex in pending:
            if ex is not None:
                dev = dev[:-1]  # merged maps feed the exact stage only
                if labels_all is not None:
                    dev = dev[0]
            if labels_all is None:
                preds, labels = jax.device_get(dev)
                preds = np.asarray(preds)
                labels = np.asarray(labels, np.float32)
            else:
                preds = np.asarray(jax.device_get(dev))
            for gi in gis:
                _, pads, _, size_hw = per_image[gi]
                crf_np = None
                if ex is not None:
                    crf_np = np.asarray(jax.device_get(
                        ex[gi].result()))
                res = self.postprocess.finalize(
                    preds[rows[gi]], pads[0], size_hw, crf_np)
                lab = (labels_all[gi] if labels_all is not None
                       else labels[rows[gi]])
                group[gi][2].set_result((res, lab))
