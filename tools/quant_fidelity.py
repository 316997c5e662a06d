#!/usr/bin/env python
"""int8 serving-mode fidelity at production geometry (docs/ROOFLINE.md).

Runs the COMPLETE serving path (device views -> fused forward/merge ->
coarse-to-fine CRF -> label maps) twice on the same images and
parameters — NET.DTYPE bfloat16 vs int8 — and reports per-image
agreement of the final label maps (pred and pred_crf per threshold).

tests/test_quant.py bounds the same comparison at toy sizes on CPU;
this tool measures it where the int8 mode actually runs.  Use a real
checkpoint via --resume-style env WSEG_QUANT_SNAPSHOT (msgpack) for
trained-weight numbers; random init (default) is the WORST case for
dynamic activation scales.

Usage: python tools/quant_fidelity.py [n_images]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run_mode(dtype: str, variables, images, gt):
    import jax

    from wseg_tpu.config import cfg
    from wseg_tpu.engine.infer import make_device_postprocess
    from wseg_tpu.engine.serving import MultiScaleServer
    from wseg_tpu.models import get_model

    cfg.NET.DTYPE = dtype
    if dtype == "int8":
        # WSEG_QUANT_ACT=static + WSEG_QUANT_STATS=<msgpack> measure
        # the calibrated per-channel grid (tools/quant_calibrate.py)
        # instead of the default dynamic scales (infer_val.py:70-86
        # loads the same collection for production serving).
        act = os.environ.get("WSEG_QUANT_ACT", "dynamic")
        cfg.NET.QUANT_ACT = act
        if act == "static":
            import flax.serialization
            import jax.random
            from wseg_tpu.engine.train_loop import init_test_variables
            stats_path = os.environ["WSEG_QUANT_STATS"]
            tmpl_model = get_model(cfg.NET, num_classes=21)
            tmpl = init_test_variables(
                tmpl_model, jax.random.PRNGKey(0), (1, 64, 64, 3))
            with open(stats_path, "rb") as f:
                qs = flax.serialization.from_bytes(
                    tmpl["quant_stats"], f.read())
            variables = dict(variables, quant_stats=qs)
            print("loaded static calibration", stats_path, flush=True)
    model = get_model(cfg.NET, num_classes=21)
    pp = make_device_postprocess(
        (0.0, 0.1), (0.0, 0.1), crf_iters=10, bg_pow=3.0,
        crf_dtype=str(cfg.TEST.CRF_DTYPE),
        crf_stride=int(cfg.TEST.CRF_STRIDE),
        crf_tap_div=float(cfg.TEST.CRF_TAP_DIV),
        crf_full_stride=int(cfg.TEST.CRF_FULL_STRIDE),
        crf_refine_iters=int(cfg.TEST.CRF_REFINE_ITERS))
    server = MultiScaleServer(model, variables, cfg.TEST, max_batch=8,
                              postprocess=pp)
    server.warmup([images[0].size])
    try:
        futs = [server.submit(im, gt) for im in images]
        return [f.result(timeout=3600)[0] for f in futs]
    finally:
        server.close()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    import jax

    from wseg_tpu.config import cfg, reset_cfg
    from wseg_tpu.engine.train_loop import init_test_variables
    from wseg_tpu.models import get_model

    reset_cfg()
    cfg.NET.MODEL = "CAM_CASA_WGAP_tf"
    cfg.NET.BACKBONE = "resnet38"
    cfg.NET.DTYPE = "bfloat16"
    cfg.TEST.SCALES = [1.0, 0.5, 1.5, 2.0]
    cfg.TEST.FLIP = True
    cfg.TEST.USE_GT_LABELS = True

    model = get_model(cfg.NET, num_classes=21)
    variables = init_test_variables(model, jax.random.PRNGKey(0),
                                    (1, 128, 128, 3))
    snap = os.environ.get("WSEG_QUANT_SNAPSHOT")
    if snap:
        import flax
        with open(snap, "rb") as f:
            params = flax.serialization.from_bytes(
                variables["params"], f.read())
        variables = dict(variables, params=params)
        print("loaded", snap, flush=True)

    rng = np.random.RandomState(0)
    images = [Image.fromarray(
        (rng.rand(384, 512, 3) * 255).astype(np.uint8))
        for _ in range(n)]
    gt = np.zeros(20, np.float32)
    gt[[3, 8]] = 1.0

    res16 = run_mode("bfloat16", variables, images, gt)
    res8 = run_mode("int8", variables, images, gt)

    out = {}
    for key in ("pred", "pred_crf"):
        ag = [float((a[t][key] == b[t][key]).mean())
              for a, b in zip(res16, res8) for t in (0.0, 0.1)
              if key in a[t]]
        out[f"{key}_agreement_mean"] = round(float(np.mean(ag)), 4)
        out[f"{key}_agreement_min"] = round(float(np.min(ag)), 4)
    out["n_images"] = n
    out["weights"] = "snapshot" if snap else "random-init (worst case)"
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
