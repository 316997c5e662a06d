#!/usr/bin/env python
"""Learning self-check / training-loop diagnostic on synthetic data.

Builds a colour-coded synthetic VOC (each class = a fixed palette colour),
trains BaselineCAM (default resnet50, SkipInit from-scratch), runs single-scale inference, and reports the
classification F1 and present-class mIoU before vs after training.

Caveat measured in this environment: FROM-SCRATCH runs converge to the
all-negative multi-label basin (random 13-layer VGG features collapse
without normalisation), matching the reference's behaviour — its recipe
always starts from ImageNet weights (reference base_net.py:42-45,
configs/*.yaml PRE_WEIGHTS_PATH).  Point --pre-weights at a converted
checkpoint to see genuine learning; without it this script is a
plumbing diagnostic (losses finite and decreasing, gradients flowing,
infer/eval cycle intact), not an accuracy test.

Usage: python tools/selfcheck_learning.py [--epochs 8] [--n-train 24]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--n-train", type=int, default=24)
    p.add_argument("--n-val", type=int, default=8)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--opt", type=str, default="Adam")
    p.add_argument("--platform", type=str, default="")
    p.add_argument("--pre-weights", type=str, default="")
    p.add_argument("--model", type=str, default="bsl")
    p.add_argument("--backbone", type=str, default="resnet50")
    args = p.parse_args(argv)

    if args.platform:
        os.environ["WSEG_PLATFORM"] = args.platform

    import jax
    import jax.numpy as jnp

    from synthetic_voc import make_synthetic_voc

    from wseg_tpu.config import cfg, reset_cfg
    from wseg_tpu.data.pascal_voc import VOCSegmentation, labels_from_mask
    from wseg_tpu.data.loader import DataLoader
    from wseg_tpu.engine.infer import InferenceEngine
    from wseg_tpu.engine.train_loop import (
        create_train_state,
        init_variables,
        make_train_step,
    )
    from wseg_tpu.engine.writers import threshold_and_argmax
    from wseg_tpu.models import get_model
    from wseg_tpu.parallel import make_optimizer
    from wseg_tpu.utils.metrics import confusion_matrix, iou_from_confusion

    root = make_synthetic_voc(tempfile.mkdtemp() + "/voc",
                              n_train=args.n_train, n_val=args.n_val,
                              size=(96, 96))

    reset_cfg()
    cfg.DATASET.ROOT = root
    cfg.DATASET.CROP_SIZE = 64
    cfg.NET.MODEL = args.model
    cfg.NET.BACKBONE = args.backbone
    cfg.NET.DTYPE = "float32"
    cfg.NET.LR = args.lr
    cfg.NET.OPT = args.opt
    cfg.NET.BETA1 = 0.9
    cfg.TEST.METHOD = "multiscale"
    cfg.TEST.SCALES = [1.0]
    cfg.TEST.FLIP = False
    cfg.TEST.PAD_SIZE = [96, 96]
    cfg.TEST.USE_GT_LABELS = True
    cfg.TEST.BG_POW = 1

    model = get_model(cfg.NET, num_classes=21)
    rng = jax.random.PRNGKey(0)
    batch0 = {
        "image": jnp.zeros((4, 64, 64, 3), jnp.float32),
        "labels": jnp.ones((4, 20), jnp.float32),
    }
    variables = init_variables(model, rng, batch0)
    if args.pre_weights:
        from wseg_tpu.utils.torch_convert import load_pretrained_backbone
        variables = dict(variables, params=load_pretrained_backbone(
            variables["params"], args.pre_weights, args.backbone))
    else:
        # from-scratch: SkipInit the residual branches (see
        # stabilize_scratch_init) so frozen-identity BN doesn't explode
        from wseg_tpu.models.backbones.common import \
            stabilize_scratch_init
        variables = dict(variables, params=stabilize_scratch_init(
            variables["params"], args.backbone))
    tx, _ = make_optimizer(cfg.NET, args.backbone, variables["params"])
    state = create_train_state(model, tx, rng, batch0,
                               variables=variables)
    step = make_train_step(model, tx)

    ds = VOCSegmentation(cfg.DATASET, "train_augvoc", root=root)
    loader = DataLoader(ds, 4, num_workers=2)

    def run_eval(params):
        from PIL import Image
        eng = InferenceEngine(model, {"params": params}, cfg.TEST)
        M = np.zeros((21, 21))
        present = set()
        with open(os.path.join(root, "val_voc.txt")) as f:
            for line in f:
                ip, mp = line.split()
                img = Image.open(os.path.join(
                    root, ip.lstrip("/"))).convert("RGB")
                gt = np.asarray(Image.open(os.path.join(
                    root, mp.lstrip("/"))), np.int32)
                present.update(np.unique(gt).tolist())
                merged, _ = eng.run_image(img, labels_from_mask(gt))
                pred = threshold_and_argmax(merged, 0.3)
                M += confusion_matrix(gt, pred)
        stats = iou_from_confusion(M)
        idx = sorted(c for c in present if 0 < c < 21)
        return float(np.mean(stats["iou"][idx])) if idx else 0.0

    valds = VOCSegmentation(cfg.DATASET, "val_voc", root=root,
                            augment=False)
    valloader = DataLoader(valds, 4, shuffle=False, drop_last=False,
                           num_workers=2)
    from wseg_tpu.engine.train_loop import make_eval_step
    eval_step = make_eval_step(model)

    def cls_f1(state):
        tp = fp = fn = 0.0
        for batch in valloader:
            db = {"image": jnp.asarray(batch["image"]),
                  "labels": jnp.asarray(batch["labels"])}
            _, cls = eval_step(state, db)
            pred = (1 / (1 + np.exp(-np.asarray(cls)))) > 0.5
            gt = np.asarray(batch["labels"]) > 0.5
            tp += float(np.sum(pred & gt))
            fp += float(np.sum(pred & ~gt))
            fn += float(np.sum(~pred & gt))
        return 2 * tp / max(1e-6, 2 * tp + fp + fn)

    f1_before = cls_f1(state)
    miou_before = run_eval(jax.device_get(state.params))
    print(f"before: cls F1 {f1_before:.3f}  present-class mIoU "
          f"{miou_before:.2f}")

    for epoch in range(args.epochs):
        losses = []
        for batch in loader:
            db = {"image": jnp.asarray(batch["image"]),
                  "labels": jnp.asarray(batch["labels"])}
            state, metrics = step(state, db, rng, jnp.asarray(0.0))
            losses.append(float(metrics["loss_cls"]))
        print(f"epoch {epoch}: loss_cls {np.mean(losses):.4f}",
              flush=True)

    f1_after = cls_f1(state)
    miou_after = run_eval(jax.device_get(state.params))
    print(f"after:  cls F1 {f1_after:.3f}  present-class mIoU "
          f"{miou_after:.2f}")
    print("LEARNING OK" if f1_after > f1_before + 0.2
          else "WARNING: little improvement")


if __name__ == "__main__":
    main(sys.argv[1:])
