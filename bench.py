#!/usr/bin/env python
"""Headline benchmark: multi-scale flip inference throughput (img/sec/chip).

Measures the BASELINE.json primary metric — WRN38 flagship, scales
[1, 0.5, 1.5, 2.0] + flip (8 views/image), reference pad 1024^2 semantics
with the TPU per-scale pad buckets — steady-state images/sec on one chip.

vs_baseline compares against the PyTorch reference on 2x Titan X.  The
reference publishes no throughput number (SURVEY.md §6), so the baseline
constant below is a FLOPs-derived estimate documented here: WRN38 stride-8
forward at 1024^2 is ~2.2 TFLOP/view; 8 views => ~18 TFLOP/image.  Two
Titan X (Maxwell, ~6.1 TFLOPs fp32 each at ~40%% conv efficiency) give
~4.9 TFLOPs sustained => ~0.27 img/s.  Measured numbers for similar
DeepLab-scale models on that hardware support 0.2-0.4 img/s; we use
0.3 img/s.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REFERENCE_IMG_PER_SEC = 0.3  # 2x Titan X estimate, see module docstring

# Each segment runs in ITS OWN subprocess so no segment's state (grain
# worker pools, compile-cache ratchets, cfg mutations, fragmented HBM)
# can leak into another's timed window — VERDICT r4 task 2: the recorded
# number must be the number the segment measures in isolation.
# (name, env knob that skips it, required, timeout seconds)
SEGMENTS = (
    ("forward", None, True, 2400),
    ("int8_forward", "WSEG_BENCH_NO_INT8", False, 2400),
    ("e2e", None, False, 2400),
    ("e2e_mixed", None, False, 2400),
    ("e2e_int8", "WSEG_BENCH_NO_INT8", False, 2400),
    ("e2e_exact", "WSEG_BENCH_NO_EXACT", False, 3000),
    ("e2e_multicrop", "WSEG_BENCH_NO_MULTICROP", False, 2400),
    ("train", "WSEG_BENCH_NO_TRAIN", False, 2400),
    ("epoch", "WSEG_BENCH_NO_TRAIN", False, 2400),
)


def main():
    merged = {}
    for name, skip_env, required, tmo in SEGMENTS:
        if skip_env and os.environ.get(skip_env):
            continue
        out = None
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--segment", name],
                capture_output=True, text=True, timeout=tmo,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")][-1]
            merged.update(json.loads(line))
        except Exception as e:
            tail = out.stderr[-2000:] if out is not None and out.stderr \
                else ""
            sys.stderr.write(f"bench segment {name} failed: "
                             f"{type(e).__name__}: {e}\n{tail}\n")
            if required:
                raise
    result = {
        "metric": "multiscale_inference_images_per_sec_per_chip",
        "value": merged.pop("forward_images_per_sec"),
        "unit": "img/s",
        **merged,
    }
    result["vs_baseline"] = round(
        result["value"] / REFERENCE_IMG_PER_SEC, 2)
    if "e2e_infer_val_images_per_sec" in result:
        result["e2e_vs_baseline"] = round(
            result["e2e_infer_val_images_per_sec"]
            / REFERENCE_IMG_PER_SEC, 2)
    print(json.dumps(result), flush=True)


def _flagship(dtype="bfloat16"):
    import jax

    from wseg_tpu.config import cfg, reset_cfg
    from wseg_tpu.engine.train_loop import init_test_variables
    from wseg_tpu.models import get_model

    reset_cfg()
    cfg.NET.MODEL = "CAM_CASA_WGAP_tf"
    cfg.NET.BACKBONE = "resnet38"
    cfg.NET.DTYPE = dtype
    model = get_model(cfg.NET, num_classes=21)
    variables = init_test_variables(model, jax.random.PRNGKey(0),
                                    (1, 128, 128, 3))
    return model, variables


def _bucket_batches(imgs_per_batch: int = 8):
    """One batch per per-scale pad bucket for a typical 500x375 VOC
    image (scale -> padded size rounded up to TEST.PAD_ALIGN, the
    production default — 64 since r3; see tools/bench_buckets.py for
    the 128-vs-64 roofline); serving batches 8 images' views per bucket
    program (measured on v5e: 9.1 img/s at batch 1, 11.8 at 4, 12.5
    at 8).  Each batch is [view, flipped view] x imgs_per_batch."""
    import jax.numpy as jnp

    from wseg_tpu.config import cfg

    align = int(cfg.TEST.PAD_ALIGN)
    base_hw = (384, 512)
    scales = [1.0, 0.5, 1.5, 2.0]
    batches = []
    for s in scales:
        h = int(np.ceil(base_hw[0] * s / align) * align)
        w = int(np.ceil(base_hw[1] * s / align) * align)
        batches.append(jnp.asarray(
            np.random.rand(2 * imgs_per_batch, h, w, 3), jnp.float32))
    return batches, imgs_per_batch


def timed_forward(m, variables, batches, imgs_per_batch,
                  n_rounds: int = 3):
    """Steady-state img/s of one model over all pad buckets.

    A tiny checksum per program forces completion at the final
    fetch (block_until_ready is unreliable on relayed backends)
    while the masks stay on device; all dispatches are pipelined
    and ONE scalar fetch pays the host<->device round trip."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fwd(v, x):
        out = m.apply(v, x, train=False)
        chk = out.cls.astype(jnp.float32).sum() + \
            out.masks.astype(jnp.float32).sum()
        return out.cls, out.masks, chk

    @jax.jit
    def combine(total, a, b, c, d):
        return total + a + b + c + d

    # warmup / compile (first conv program on a fresh process can
    # take ~1 min on remote-compile backends)
    for b in batches:
        _, _, chk = fwd(variables, b)
        float(chk)
    n_images = n_rounds * imgs_per_batch
    # best-of-2 passes (transient relay congestion can slow one window
    # ~10x; see bench_e2e)
    dt = float("inf")
    for _ in range(2):
        total = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(n_rounds):
            chks = [fwd(variables, b)[2] for b in batches]
            total = combine(total, *chks)
        final = float(total)  # depends on every dispatched program
        dt = min(dt, time.perf_counter() - t0)
        assert np.isfinite(final)
    return n_images / dt


def _calibrated_int8():
    """The opt-in int8 static serving mode (NET.DTYPE: int8 +
    NET.QUANT_ACT: static — w8a8 backbone convs on calibrated
    per-channel activation grids, bf16 head; same checkpoint; fidelity
    bounds in tests/test_quant.py + docs/ROOFLINE.md).  Calibrates
    in-process on one batch per bucket."""
    import functools as _ft

    import jax

    from wseg_tpu.config import cfg
    from wseg_tpu.engine.train_loop import init_test_variables
    from wseg_tpu.models import get_model

    model, variables = _flagship()
    batches, ipb = _bucket_batches()
    cfg.NET.DTYPE = "int8"
    cfg.NET.QUANT_ACT = "static"
    ms = get_model(cfg.NET, num_classes=21)
    v0 = init_test_variables(ms, jax.random.PRNGKey(0),
                             (1, 128, 128, 3))
    stats = v0["quant_stats"]

    @_ft.partial(jax.jit, donate_argnums=(1,))
    def calib(v, st, x):
        _, mut = ms.apply(dict(v, quant_stats=st), x, train=False,
                          mutable=["quant_stats"])
        return mut["quant_stats"]

    for b in batches:
        stats = calib(variables, stats, b)
    return ms, dict(variables, quant_stats=stats), batches, ipb


def run_segment(name: str) -> dict:
    from wseg_tpu.config import cfg

    if name == "forward":
        model, variables = _flagship()
        batches, ipb = _bucket_batches()
        return {"forward_images_per_sec":
                round(timed_forward(model, variables, batches, ipb), 3)}

    if name == "int8_forward":
        from wseg_tpu.models import get_model
        model, variables = _flagship()
        batches, ipb = _bucket_batches()
        cfg.NET.DTYPE = "int8"
        dyn = timed_forward(get_model(cfg.NET, num_classes=21),
                            variables, batches, ipb)
        # drop the dynamic-mode arrays before the static build: the
        # segment otherwise holds two param sets + two batch sets on
        # a 16 GB chip while timing the second model
        del model, variables, batches
        ms, vs, batches, ipb = _calibrated_int8()
        return {
            "int8_forward_images_per_sec": round(dyn, 3),
            "int8_static_forward_images_per_sec":
                round(timed_forward(ms, vs, batches, ipb), 3),
        }

    if name == "e2e":
        model, variables = _flagship()
        return {"e2e_infer_val_images_per_sec":
                round(bench_e2e(model, variables), 3)}

    if name == "e2e_mixed":
        # mixed landscape/portrait stream — the real VOC val geometry
        # distribution (reference pascal_voc_ms.py resizes arbitrary
        # H x W); exercises the size-aware batching stash
        model, variables = _flagship()
        return {"e2e_mixed_geometry_images_per_sec":
                round(bench_e2e(model, variables, mixed=True), 3)}

    if name == "e2e_int8":
        # the full serving pipeline on the calibrated int8-static model
        # (VERDICT r4 task 4: int8 e2e recorded in the artifact)
        ms, vs, _, _ = _calibrated_int8()
        return {"e2e_int8_images_per_sec":
                round(bench_e2e(ms, vs), 3)}

    if name == "e2e_exact":
        # parity-grade mode: EXACT permutohedral CRF per image on
        # device (TEST.CRF_MODE=exact, 0.0000% argmax deviation)
        model, variables = _flagship()
        cfg.TEST.CRF_MODE = "exact"
        return {"e2e_exact_crf_images_per_sec":
                round(bench_e2e(model, variables, n_images=32,
                                smooth=True), 3)}

    if name == "e2e_multicrop":
        model, variables = _flagship()
        return {"e2e_multicrop_images_per_sec":
                round(bench_e2e_multicrop(model, variables), 3)}

    if name == "train":
        from bench_train import measure_seam_step, measure_train_step
        out = {}
        for bs in (8, 16):
            step_ms, ips = measure_train_step(bs)
            out[f"train_step_ms_bs{bs}"] = round(step_ms, 1)
            out[f"train_imgs_per_sec_bs{bs}"] = round(ips, 3)
        try:  # SEAM trainer cost — optional metric
            step_ms, ips = measure_seam_step(8)
            out["seam_step_ms_bs8"] = round(step_ms, 1)
            out["seam_imgs_per_sec_bs8"] = round(ips, 3)
        except Exception as e:
            print(f"seam bench skipped: {type(e).__name__}: {e}",
                  flush=True)
        return out

    if name == "epoch":
        # sustained live loop: real on-disk input pipeline; the split
        # attributes ms/step to load/put/dispatch so the recorded
        # number is diagnosable (VERDICT r4 task 6)
        from bench_train import measure_train_epoch
        ips, split = measure_train_epoch(8)
        return {"train_epoch_imgs_per_sec_bs8": round(ips, 3),
                "train_epoch_split": split}

    raise SystemExit(f"unknown bench segment: {name}")


def bench_e2e(model, variables, n_images: int = 96,
              mixed: bool = False, smooth: bool = True) -> float:
    """images/sec through the complete infer_val path (reference
    infer_val.py:112-143 + utils/inference_tools.py:61-126): multi-scale
    batched forward -> device merge -> CRF -> thresholded PNG writes.

    96 images (6 groups of 16) so pipeline fill/drain amortises the way
    it does in a real 1449-image val run; segment attribution lives in
    tools/bench_e2e_segments.py.  ``mixed`` interleaves landscape and
    portrait images (VOC val is roughly half of each), exercising the
    size-aware batching stash."""
    import shutil
    import tempfile
    import time as _time

    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    from wseg_tpu.config import cfg
    from wseg_tpu.engine.infer import make_device_postprocess
    from wseg_tpu.engine.serving import MultiScaleServer
    from wseg_tpu.engine.writers import ResultWriter

    cfg.TEST.SCALES = [1.0, 0.5, 1.5, 2.0]
    cfg.TEST.FLIP = True
    cfg.TEST.PAD_PER_SCALE = True
    cfg.TEST.PAD_ALIGN = 64
    cfg.TEST.USE_GT_LABELS = True
    cfg.TEST.DEVICE_MERGE = True
    cfg.TEST.UINT8_TRANSFER = True
    cfg.TEST.DEVICE_VIEWS = True
    cfg.TEST.BG_POW = 3

    out_dir = tempfile.mkdtemp(prefix="wseg_bench_")
    rng = np.random.RandomState(0)
    # same 512x384 geometry as the headline bench -> same pad buckets;
    # mixed mode interleaves the transposed (portrait) geometry
    hws = [(384, 512), (512, 384)] if mixed else [(384, 512)]

    def make(i):
        h, w = hws[i % len(hws)]
        if smooth:
            # photo-like low-frequency content (the default): white
            # noise is unrepresentative in two content-dependent stages
            # — the exact-CRF lattice size blows past any real
            # photograph, and the CRF'd label maps become max-entropy
            # for the RLE-deflate PNG encoder (measured 2.2 vs 0.23
            # ms/encode and 193 vs 4 KB/file at 384x512; real VOC preds
            # are smooth regions)
            import cv2
            return Image.fromarray((cv2.resize(
                rng.rand(h // 24, w // 24, 3), (w, h)) * 255).astype(
                np.uint8))
        return Image.fromarray(
            (rng.rand(h, w, 3) * 255).astype(np.uint8))

    images = [make(i) for i in range(n_images)]
    gt = np.zeros(20, np.float32)
    gt[[3, 8]] = 1.0

    threshs = (0.0, 0.1)
    pp = make_device_postprocess(
        threshs, threshs, crf_iters=10, bg_pow=3.0,
        crf_dtype=str(cfg.TEST.CRF_DTYPE),
        crf_stride=int(cfg.TEST.CRF_STRIDE),
        crf_tap_div=float(cfg.TEST.CRF_TAP_DIV),
        crf_full_stride=int(cfg.TEST.CRF_FULL_STRIDE),
        crf_refine_iters=int(cfg.TEST.CRF_REFINE_ITERS),
        crf_mode=str(getattr(cfg.TEST, "CRF_MODE", "fast")))
    server = MultiScaleServer(model, variables, cfg.TEST, max_batch=16,
                              postprocess=pp)
    server.warmup([(w, h) for h, w in hws])
    writers = {t: ResultWriter(cfg.TEST, f"{out_dir}/t{t}",
                               prospect_thresh=t, verbose=False)
               for t in threshs}
    pool = ThreadPoolExecutor(8)

    def write_all(res, i):
        # one pool task per image (4 PNG files): verbose=False writers
        # never touch the float image, so None is passed for it
        for t, wr in writers.items():
            wr.save_pred(f"bench_{i}.jpg", None, res[t]["pred"],
                         res[t].get("pred_crf"))

    def run(imgs):
        futs = [server.submit(im, gt) for im in imgs]
        writes = deque()
        for i, (im, f) in enumerate(zip(imgs, futs)):
            res, labels = f.result()
            writes.append(pool.submit(write_all, res, i))
        while writes:
            writes.popleft().result()

    run(images[:2])  # warmup: merge-program compiles + CRF code paths
    # best-of-2 passes: the relay is single-tenant but not isolated —
    # a lingering previous process or link hiccup can slow ONE window
    # ~10x (observed r5: int8-static 2.1 vs 20.5 img/s); steady-state
    # throughput is the capability being recorded
    dt = float("inf")
    for _ in range(2):
        t0 = _time.perf_counter()
        run(images)
        dt = min(dt, _time.perf_counter() - t0)

    server.close()
    pool.shutdown()
    shutil.rmtree(out_dir, ignore_errors=True)
    return n_images / dt


def bench_e2e_multicrop(model, variables, n_images: int = 48) -> float:
    """e2e infer_val throughput for TEST.METHOD=multicrop (reference
    datasets/pascal_voc_ms.py:180-243 + utils/inference_tools.py:257-301):
    ONE fused program per group — device normalise, grid crops, forward
    over the crop batch, scatter merge with constant counts — then the
    shared device postprocess (threshold/argmax/CRF) and PNG writes.

    Covering geometry: PAD 640^2, CROP 448^2, 2x2 grid + flip = 8 views
    per image with stride 320 < 448 (full canvas coverage; the
    reference's default 1024^2/448/2x2 leaves uncovered bands its own
    merge asserts against)."""
    from wseg_tpu.config import cfg

    saved = {k: cfg.TEST[k] for k in
             ("METHOD", "PAD_SIZE", "CROP_SIZE", "CROP_GRID_SIZE",
              "FLIP", "USE_GT_LABELS", "UINT8_TRANSFER")}
    cfg.TEST.METHOD = "multicrop"
    cfg.TEST.PAD_SIZE = [640, 640]
    cfg.TEST.CROP_SIZE = [448, 448]
    cfg.TEST.CROP_GRID_SIZE = [2, 2]
    cfg.TEST.FLIP = True
    cfg.TEST.USE_GT_LABELS = True
    cfg.TEST.UINT8_TRANSFER = True

    try:
        return _bench_e2e_multicrop_body(model, variables, n_images)
    finally:
        for k, v in saved.items():
            cfg.TEST[k] = v


def _bench_e2e_multicrop_body(model, variables, n_images: int) -> float:
    import shutil
    import tempfile
    import time as _time

    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    from wseg_tpu.config import cfg
    from wseg_tpu.engine.infer import make_device_postprocess
    from wseg_tpu.engine.serving_crop import MultiCropServer
    from wseg_tpu.engine.writers import ResultWriter

    out_dir = tempfile.mkdtemp(prefix="wseg_bench_mc_")
    rng = np.random.RandomState(0)
    # photo-like low-frequency content (see bench_e2e make())
    import cv2
    images = [Image.fromarray((cv2.resize(
        rng.rand(16, 21, 3), (512, 384)) * 255).astype(np.uint8))
        for _ in range(n_images)]
    gt = np.zeros(20, np.float32)
    gt[[3, 8]] = 1.0

    threshs = (0.0, 0.1)
    # no BG_POW in the multicrop merge (MergeCrops semantics)
    pp = make_device_postprocess(
        threshs, threshs, crf_iters=10, bg_pow=1.0,
        crf_dtype=str(cfg.TEST.CRF_DTYPE),
        crf_stride=int(cfg.TEST.CRF_STRIDE),
        crf_tap_div=float(cfg.TEST.CRF_TAP_DIV),
        crf_full_stride=int(cfg.TEST.CRF_FULL_STRIDE),
        crf_refine_iters=int(cfg.TEST.CRF_REFINE_ITERS))
    server = MultiCropServer(model, variables, cfg.TEST, max_batch=8,
                             postprocess=pp)
    server.warmup()
    writers = {t: ResultWriter(cfg.TEST, f"{out_dir}/t{t}",
                               prospect_thresh=t, verbose=False)
               for t in threshs}
    pool = ThreadPoolExecutor(8)

    def write_all(res, i):
        for t, wr in writers.items():
            wr.save_pred(f"bench_{i}.jpg", None, res[t]["pred"],
                         res[t].get("pred_crf"))

    def run(imgs):
        futs = [server.submit(im, gt) for im in imgs]
        writes = deque()
        for i, f in enumerate(futs):
            res, _ = f.result()
            writes.append(pool.submit(write_all, res, i))
        while writes:
            writes.popleft().result()

    run(images[:2])
    dt = float("inf")  # best-of-2 (see bench_e2e)
    for _ in range(2):
        t0 = _time.perf_counter()
        run(images)
        dt = min(dt, _time.perf_counter() - t0)

    server.close()
    pool.shutdown()
    shutil.rmtree(out_dir, ignore_errors=True)
    return n_images / dt


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--segment":
        print(json.dumps(run_segment(sys.argv[2])), flush=True)
    else:
        main()
    # the relayed TPU backend leaves non-daemon service threads running;
    # exit explicitly so the bench invocation terminates
    os._exit(0)
