#!/usr/bin/env python
"""Single-image CAM demo (reference cam.py): load a checkpoint, run the
chosen CAM method on one image, write ``{method}_cam.jpg``."""

import argparse
import os
import sys

import numpy as np
from PIL import Image

from wseg_tpu.config import cfg, cfg_from_file, cfg_from_list
from wseg_tpu.opts import add_global_arguments, check_global_arguments


def get_args(argv):
    parser = argparse.ArgumentParser(description="Single-image CAM")
    add_global_arguments(parser)
    parser.add_argument("--image-path", type=str, required=True)
    parser.add_argument("--method", type=str, default="gradcam",
                        choices=["gradcam", "gradcam++", "scorecam",
                                 "xgradcam", "ablationcam", "eigencam",
                                 "eigengradcam", "layercam", "fullgrad"])
    parser.add_argument("--target-category", type=int, default=None)
    parser.add_argument("--eigen_smooth", action="store_true")
    args = parser.parse_args(argv)
    check_global_arguments(args)
    return args


def overlay_cam(image01: np.ndarray, cam: np.ndarray) -> np.ndarray:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.cm as cm
    heat = cm.jet(cam)[..., :3]
    out = 0.5 * image01 + 0.5 * heat
    return np.round(255 * out).astype(np.uint8)


def main(argv):
    args = get_args(argv)
    cfg_from_file(args.cfg_file)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs)

    import jax
    import jax.numpy as jnp

    from wseg_tpu.data.pascal_voc import MEAN, STD
    from wseg_tpu.gradcam import get_cam_method
    from wseg_tpu.models import get_model
    from wseg_tpu.utils.checkpoints import Checkpoint

    model = get_model(cfg.NET, num_classes=int(cfg.TEST.NUM_CLASSES))
    rng = jax.random.PRNGKey(0)
    from wseg_tpu.engine.train_loop import init_test_variables
    variables = init_test_variables(model, rng, (1, 128, 128, 3))
    from wseg_tpu.utils.checkpoints import load_model_variables
    checkpoint = Checkpoint(args.snapshot_dir, max_n=5)
    found, variables = load_model_variables(checkpoint, args.resume,
                                            dict(variables))
    if found:
        print("Loaded snapshot", args.resume)

    image = Image.open(args.image_path).convert("RGB")
    arr = np.asarray(image, np.float32) / 255.0
    x = ((arr - np.asarray(MEAN, np.float32)) /
         np.asarray(STD, np.float32))[None]

    target = args.target_category
    if target is None:
        out = model.apply(dict(variables), jnp.asarray(x), train=False)
        target = int(np.argmax(np.asarray(out.cls)[0]))
        print("Predicted target category:", target)

    cam = get_cam_method(args.method)(model, variables)
    m = cam(x, target_category=target, eigen_smooth=args.eigen_smooth)[0]

    out = overlay_cam(arr, m)
    out_path = f"{args.method}_cam.jpg"
    Image.fromarray(out).save(out_path)
    print("Wrote", out_path)

    # guided backprop + guided grad-cam (reference cam.py:100-128)
    from wseg_tpu.gradcam import GuidedBackprop
    gb = GuidedBackprop(model, variables)(x, target_category=target)[0]
    gb_vis = gb - gb.mean()
    gb_vis = np.clip(0.5 + 0.1 * gb_vis / (gb_vis.std() + 1e-8), 0, 1)
    Image.fromarray(np.round(255 * gb_vis).astype(np.uint8)).save(
        f"{args.method}_gb.jpg")
    cam_gb = np.clip(gb_vis * m[..., None], 0, 1)
    Image.fromarray(np.round(255 * cam_gb).astype(np.uint8)).save(
        f"{args.method}_cam_gb.jpg")
    print("Wrote", f"{args.method}_gb.jpg", f"{args.method}_cam_gb.jpg")


if __name__ == "__main__":
    main(sys.argv[1:])
