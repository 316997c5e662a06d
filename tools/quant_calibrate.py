#!/usr/bin/env python
"""int8 static-activation calibration pass (NET.QUANT_ACT: static).

Runs N images' multiscale views through the int8 model with the
``quant_stats`` collection mutable: every QuantConv max-accumulates the
per-input-channel |x| it sees (models/backbones/common.py).  The
resulting collection is saved as a msgpack; serving loads it via
NET.QUANT_STATS and quantizes activations on fixed per-channel grids —
finer than any per-tensor scale for outlier channels, and with zero
runtime |x| reductions.

Mirrors the role of a standard post-training-quantization calibration
set; the reference has no quantized path (torch fp32 end to end,
/root/reference/infer_val.py) — this exists to harden the TPU-only
int8 serving mode (docs/ROOFLINE.md).

Usage:
  python tools/quant_calibrate.py --out stats.msgpack \
      [--images DIR] [--n 32] [--snapshot params.msgpack] \
      [--cfg configs/voc_resnet38.yaml]

Without --images, synthetic 500x375 noise images are used (fine for
program coverage; use real VOC images for production scales).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--images", default="",
                    help="directory of calibration images (else noise)")
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--snapshot", default="",
                    help="params msgpack (else random init)")
    ap.add_argument("--cfg", default="")
    args = ap.parse_args()

    import flax.serialization
    import jax

    from wseg_tpu.config import cfg, cfg_from_file
    from wseg_tpu.data.multiscale import MultiscaleViews
    from wseg_tpu.engine.train_loop import init_test_variables
    from wseg_tpu.models import get_model

    if args.cfg:
        cfg_from_file(args.cfg)
    cfg.NET.DTYPE = "int8"
    cfg.NET.QUANT_ACT = "static"
    model = get_model(cfg.NET, num_classes=int(cfg.TEST.NUM_CLASSES))
    variables = init_test_variables(model, jax.random.PRNGKey(0),
                                    (1, 128, 128, 3))
    if args.snapshot:
        with open(args.snapshot, "rb") as f:
            params = flax.serialization.from_bytes(
                variables["params"], f.read())
        variables = dict(variables, params=params)
        print("loaded", args.snapshot, flush=True)
    stats = variables.pop("quant_stats")

    @functools.partial(jax.jit, donate_argnums=(1,))
    def calib_step(variables, stats, x):
        _, mut = model.apply(dict(variables, quant_stats=stats), x,
                             train=False, mutable=["quant_stats"])
        return mut["quant_stats"]

    if args.images:
        names = sorted(os.listdir(args.images))[:args.n]
        images = [Image.open(os.path.join(args.images, n)).convert("RGB")
                  for n in names]
    else:
        rng = np.random.RandomState(0)
        images = [Image.fromarray(
            (rng.rand(375, 500, 3) * 255).astype(np.uint8))
            for _ in range(args.n)]

    views = MultiscaleViews(cfg.TEST.SCALES, bool(cfg.TEST.FLIP),
                            cfg.TEST.PAD_SIZE,
                            bool(cfg.TEST.PAD_PER_SCALE),
                            int(cfg.TEST.PAD_ALIGN))
    for i, im in enumerate(images):
        vs, _, _ = views.build(im)
        buckets = {}
        for v in vs:
            buckets.setdefault(v.shape[:2], []).append(v)
        for arrs in buckets.values():
            stats = calib_step(variables, stats, np.stack(arrs))
        if (i + 1) % 8 == 0:
            print(f"[{i + 1}/{len(images)}]", flush=True)

    stats = jax.device_get(stats)
    flat = jax.tree.leaves(stats)
    assert flat, "model has no QuantConv stats (is NET.DTYPE int8?)"
    n_zero = int(sum(int((np.asarray(a) == 0).sum()) for a in flat))
    if n_zero:
        # channels at exactly 0 over the whole calibration set are
        # (almost surely) dead ReLU channels; they quantize to 0 at
        # serving too, so this is informational
        print(f"NOTE: {n_zero} always-zero input channels "
              "(dead upstream units)", flush=True)
    with open(args.out, "wb") as f:
        f.write(flax.serialization.to_bytes(stats))
    print("wrote", args.out, len(flat), "conv stats", flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
