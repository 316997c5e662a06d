#!/usr/bin/env python
"""SBD .mat -> indexed .png ground-truth conversion
(reference tools/convert_sbd.py:28-53).

Usage: python tools/convert_sbd.py --sbd-root <dir with cls/*.mat> \
    --out <output dir>
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import scipy.io
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from wseg_tpu.data.pascal_voc import get_palette  # noqa: E402


def convert(mat_path: str, out_path: str):
    mat = scipy.io.loadmat(mat_path)
    seg = mat["GTcls"][0]["Segmentation"][0].astype(np.uint8)
    im = Image.fromarray(seg, mode="P")
    im.putpalette(get_palette())
    im.save(out_path)


def main(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--sbd-root", required=True,
                   help="directory containing SBD cls/*.mat files")
    p.add_argument("--out", required=True, help="output directory")
    args = p.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    files = sorted(f for f in os.listdir(args.sbd_root)
                   if f.endswith(".mat"))
    for i, f in enumerate(files):
        convert(os.path.join(args.sbd_root, f),
                os.path.join(args.out, f[:-4] + ".png"))
        if i % 500 == 0:
            print(f"[{i}/{len(files)}]", flush=True)
    print(f"Converted {len(files)} masks to {args.out}")


if __name__ == "__main__":
    main(sys.argv[1:])
