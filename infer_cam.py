#!/usr/bin/env python
"""Grad-CAM mask inference (reference infer_cam.py).

Per image, per GT label: run the chosen CAM method and place the map in
that label's channel; write masks with the single-scale writer machinery.
"""

import argparse
import os
import sys

import numpy as np
from PIL import Image

from wseg_tpu.config import cfg, cfg_from_file, cfg_from_list
from wseg_tpu.opts import add_global_arguments, check_global_arguments


def get_cam_arguments(argv):
    parser = argparse.ArgumentParser(description="CAM inference")
    add_global_arguments(parser)
    parser.add_argument("--method", type=str, default="gradcam",
                        choices=["gradcam", "gradcam++", "scorecam",
                                 "xgradcam", "ablationcam", "eigencam",
                                 "eigengradcam", "layercam", "fullgrad",
                                 "guidedbackprop"])
    parser.add_argument("--eigen_smooth", action="store_true")
    parser.add_argument("--aug_smooth", action="store_true")
    parser.add_argument("--pad-align", type=int, default=64,
                        help="Pad each image up to a multiple of this so "
                             "XLA compiles one program per size bucket "
                             "(0 = native sizes, compiles per image "
                             "shape)")
    args = parser.parse_args(argv)
    check_global_arguments(args)
    return args


def main(argv):
    args = get_cam_arguments(argv)
    cfg_from_file(args.cfg_file)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs)

    import jax
    import jax.numpy as jnp

    from wseg_tpu.data.pascal_voc import MEAN, STD, labels_from_mask, \
        read_filelist
    from wseg_tpu.engine.writers import ResultWriter
    from wseg_tpu.gradcam import aug_smooth, get_cam_method
    from wseg_tpu.models import get_model
    from wseg_tpu.utils.checkpoints import Checkpoint

    num_classes = int(cfg.TEST.NUM_CLASSES)
    model = get_model(cfg.NET, num_classes=num_classes)

    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 128, 128, 3), jnp.float32)
    from wseg_tpu.engine.train_loop import init_test_variables
    variables = init_test_variables(model, rng, sample.shape)
    from wseg_tpu.utils.checkpoints import load_model_variables
    checkpoint = Checkpoint(args.snapshot_dir, max_n=5)
    found, variables = load_model_variables(checkpoint, args.resume,
                                            dict(variables))
    if found:
        print("Loaded snapshot", args.resume)
    else:
        print("WARNING: snapshot not found, using random init")

    cam = get_cam_method(args.method)(model, variables)

    out_dir = args.mask_output_dir
    writer = ResultWriter(cfg.TEST, out_dir, prospect_thresh=0.0,
                          use_crf=False)

    entries = read_filelist(args.infer_list, cfg.TEST.DATA_ROOT)
    mean = np.asarray(MEAN, np.float32)
    std = np.asarray(STD, np.float32)
    for i, (img_path, mask_path) in enumerate(entries):
        image = Image.open(img_path).convert("RGB")
        gt_mask = np.asarray(Image.open(mask_path), np.int32) \
            if mask_path and os.path.isfile(mask_path) else None
        labels = (labels_from_mask(gt_mask, num_class=num_classes)
                  if gt_mask is not None
                  else np.ones(num_classes - 1, np.float32))

        arr = (np.asarray(image, np.float32) / 255.0 - mean) / std
        h, w = arr.shape[:2]
        align = int(getattr(args, "pad_align", 0))
        if align > 0:
            ph = -h % align
            pw = -w % align
            arr_in = np.pad(arr, ((0, ph), (0, pw), (0, 0)))
        else:
            arr_in = arr
        x = arr_in[None]
        masks_pred = np.zeros((h, w, num_classes), np.float32)
        for label in np.nonzero(labels)[0]:
            if args.aug_smooth:
                m = aug_smooth(cam, x, target_category=int(label),
                               eigen_smooth=args.eigen_smooth)
            else:
                m = cam(x, target_category=int(label),
                        eigen_smooth=args.eigen_smooth)
            m = np.asarray(m)
            if m.ndim == 4:  # guidedbackprop returns (B, H, W, 3)
                g = np.abs(m).max(-1)
                rng = g.max() - g.min()
                m = (g - g.min()) / (rng if rng > 0 else 1.0)
            masks_pred[..., int(label) + 1] = m[0, :h, :w]

        image01 = np.asarray(image, np.float32) / 255.0
        writer.save(img_path, image01, masks_pred, gt_mask)
        if i % 50 == 0:
            print(f"[{i}/{len(entries)}]", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
