#!/usr/bin/env python
"""Decompose the e2e infer_val benchmark into segments (VERDICT r3 task 1).

Runs the bench.py e2e flow in four modes to attribute the gap between
the forward device bound (~13.3 img/s, docs/traces/roofline.json) and
the measured e2e throughput:

  full        — forward+merge, device postprocess (CRF), PNG writes
  no_png      — same but futures only (writes skipped)
  no_crf      — crf_threshs=() so postprocess is threshold/argmax only
  no_crf_png  — neither CRF nor writes

Differences give the CRF segment cost and the PNG/host segment cost.
Usage: python tools/bench_e2e_segments.py [n_images]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def setup():
    import jax

    from wseg_tpu.config import cfg, reset_cfg
    from wseg_tpu.engine.train_loop import init_test_variables
    from wseg_tpu.models import get_model

    reset_cfg()
    cfg.NET.MODEL = "CAM_CASA_WGAP_tf"
    cfg.NET.BACKBONE = "resnet38"
    # WSEG_BENCH_DTYPE=int8 measures the quantized serving mode
    cfg.NET.DTYPE = os.environ.get("WSEG_BENCH_DTYPE", "bfloat16")
    cfg.TEST.SCALES = [1.0, 0.5, 1.5, 2.0]
    cfg.TEST.FLIP = True
    cfg.TEST.PAD_PER_SCALE = True
    cfg.TEST.PAD_ALIGN = 64
    # WSEG_BENCH_GT=0: predicted labels (device-computed inside the
    # postprocess program) instead of GT labels
    cfg.TEST.USE_GT_LABELS = os.environ.get("WSEG_BENCH_GT", "1") != "0"
    cfg.TEST.DEVICE_MERGE = True
    cfg.TEST.UINT8_TRANSFER = True
    cfg.TEST.DEVICE_VIEWS = True
    cfg.TEST.BG_POW = 3

    model = get_model(cfg.NET, num_classes=21)
    variables = init_test_variables(model, jax.random.PRNGKey(0),
                                    (1, 128, 128, 3))
    return model, variables


def run_mode(model, variables, *, crf: bool, png: bool,
             n_images: int) -> float:
    from wseg_tpu.config import cfg
    from wseg_tpu.engine.infer import make_device_postprocess
    from wseg_tpu.engine.serving import MultiScaleServer
    from wseg_tpu.engine.writers import ResultWriter

    out_dir = tempfile.mkdtemp(prefix="wseg_seg_")
    rng = np.random.RandomState(0)
    # WSEG_BENCH_GEOM=mixed interleaves landscape/portrait (VOC is
    # roughly half 500x375 and half 375x500) — exercises size-aware
    # batching; default is the uniform bench geometry
    if os.environ.get("WSEG_BENCH_GEOM", "") == "mixed":
        hws = [(384, 512), (512, 384)]
    else:
        hws = [(384, 512)]
    images = [Image.fromarray(
        (rng.rand(*hws[i % len(hws)], 3) * 255).astype(np.uint8))
        for i in range(n_images)]
    gt = np.zeros(20, np.float32)
    gt[[3, 8]] = 1.0

    threshs = (0.0, 0.1)
    pp = make_device_postprocess(
        threshs, threshs if crf else (), crf_iters=10, bg_pow=3.0,
        crf_dtype=str(cfg.TEST.CRF_DTYPE),
        crf_stride=int(cfg.TEST.CRF_STRIDE),
        crf_tap_div=float(cfg.TEST.CRF_TAP_DIV),
        crf_full_stride=int(cfg.TEST.CRF_FULL_STRIDE),
        crf_refine_iters=int(cfg.TEST.CRF_REFINE_ITERS))
    mb = int(os.environ.get("WSEG_BENCH_MB", "8"))
    server = MultiScaleServer(model, variables, cfg.TEST, max_batch=mb,
                              postprocess=pp)
    server.warmup([(w, h) for h, w in hws])
    writers = {t: ResultWriter(cfg.TEST, f"{out_dir}/t{t}",
                               prospect_thresh=t, verbose=False)
               for t in threshs}
    pool = ThreadPoolExecutor(8)

    def run(imgs):
        futs = [server.submit(im, gt) for im in imgs]
        writes = deque()
        for i, (im, f) in enumerate(zip(imgs, futs)):
            res, labels = f.result()
            if png:
                for t, wr in writers.items():
                    writes.append(pool.submit(
                        wr.save_pred, f"bench_{i}.jpg", None,
                        res[t]["pred"], res[t].get("pred_crf")))
        while writes:
            writes.popleft().result()

    run(images[:2])
    t0 = time.perf_counter()
    run(images)
    dt = time.perf_counter() - t0

    server.close()
    pool.shutdown()
    shutil.rmtree(out_dir, ignore_errors=True)
    return n_images / dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    only = os.environ.get("WSEG_BENCH_MODES", "").split(",")
    only = [m for m in only if m]
    model, variables = setup()
    out = {}
    for name, crf, png in [("no_crf_png", False, False),
                           ("no_png", True, False),
                           ("no_crf", False, True),
                           ("full", True, True)]:
        if only and name not in only:
            continue
        ips = run_mode(model, variables, crf=crf, png=png, n_images=n)
        out[name] = round(ips, 3)
        print(f"{name}: {ips:.3f} img/s "
              f"({1000.0 / ips:.1f} ms/img)", flush=True)
    ms = {k: 1000.0 / v for k, v in out.items()}
    summary = {
        "img_per_sec": out,
        "ms_per_img": {k: round(v, 1) for k, v in ms.items()},
    }
    if "no_png" in ms and "no_crf_png" in ms:
        summary["crf_ms_per_img"] = round(ms["no_png"] - ms["no_crf_png"],
                                          1)
    if "full" in ms and "no_png" in ms:
        summary["png_ms_per_img"] = round(ms["full"] - ms["no_png"], 1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
    import os
    os._exit(0)
