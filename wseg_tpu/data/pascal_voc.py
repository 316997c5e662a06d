"""Pascal VOC (+SBD) dataset: filelists, labels-from-masks, palette.

Replaces reference datasets/pascal_voc.py.  Decode and augmentation run on
host in numpy/PIL; normalisation happens on device.  Returns NHWC float32.
"""

from __future__ import annotations

import os
import warnings
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image

from wseg_tpu.data import transforms as tf

CLASSES = [
    "background", "aeroplane", "bicycle", "bird", "boat", "bottle",
    "bus", "car", "cat", "chair", "cow", "diningtable", "dog", "horse",
    "motorbike", "person", "potted-plant", "sheep", "sofa", "train",
    "tv/monitor", "ambiguous",
]
CLASS_IDX = {name: (255 if name == "ambiguous" else i)
             for i, name in enumerate(CLASSES)}
NUM_CLASS = 21
AMBIGUOUS = 255

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


def voc_colormap(n: int = 256) -> np.ndarray:
    """VOC bit-twiddle colormap (reference datasets/utils.py:4-34)."""
    def bitget(v, i):
        return (v >> i) & 1

    cmap = np.zeros((n, 3), dtype=np.uint8)
    for i in range(n):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= bitget(c, 0) << (7 - j)
            g |= bitget(c, 1) << (7 - j)
            b |= bitget(c, 2) << (7 - j)
            c >>= 3
        cmap[i] = (r, g, b)
    return cmap


def get_palette() -> List[int]:
    """Flat 768-entry palette for PIL 'P' images."""
    return voc_colormap().reshape(-1).tolist()


def colorize(mask: np.ndarray) -> np.ndarray:
    """Index mask (H, W) -> RGB uint8 (H, W, 3) via the VOC palette
    (reference utils/pallete.py:13-27 get_mask_pallete and
    datasets/utils.py:37-67 Colorize).  Index 21 is mapped to 255
    (ambiguous), matching the reference's boundary recovery."""
    m = np.asarray(mask).astype(np.int32).copy()
    m[m == NUM_CLASS] = AMBIGUOUS
    return voc_colormap()[m % 256]


def get_mask_palette_image(mask: np.ndarray) -> Image.Image:
    """Index mask -> PIL 'P' image with the VOC palette attached (the
    form eval_seg/VOC tooling expects on disk)."""
    m = np.asarray(mask).astype(np.uint8)
    im = Image.fromarray(m, mode="P")
    im.putpalette(get_palette())
    return im


def labels_from_mask(mask: np.ndarray, num_class: int = NUM_CLASS
                     ) -> np.ndarray:
    """Multi-hot (C-1,) image labels from a GT index mask, ignoring
    background and ambiguous (reference datasets/pascal_voc.py:180-199)."""
    unique = np.unique(mask)
    unique = unique[(unique != 0) & (unique != AMBIGUOUS)
                    & (unique < num_class)]
    labels = np.zeros(num_class - 1, np.float32)
    labels[unique - 1] = 1.0
    return labels


def read_filelist(path: str, root: str = "") -> List[Tuple[str, str]]:
    """Parse '<image> <mask>' lines; paths joined onto ``root``."""
    entries = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = line.split(" ")
            img = os.path.join(root, parts[0].lstrip("/"))
            msk = os.path.join(root, parts[1].lstrip("/")) \
                if len(parts) > 1 else ""
            entries.append((img, msk))
    return entries


# Official split sizes the reference hard-asserts
# (reference datasets/pascal_voc.py:155-157): SBD-augmented train and
# the VOC2012 val list.
# 'train' IS the SBD-augmented 10582-image list in the reference (its
# train split file is train_augvoc; datasets/pascal_voc.py:155-157
# asserts 10582 for split=='train'); the plain VOC2012 train list goes
# by 'train_voc' (1464).
OFFICIAL_SPLIT_SIZES = {"train": 10582, "val": 1449, "train_voc": 1464}


def _env_flag(name: str) -> bool:
    return os.environ.get(name, "").strip().lower() in (
        "1", "true", "yes", "on")


def check_split_integrity(split: str, n: int, strict: bool = False):
    """Guard against a truncated/corrupt official split list.

    The reference asserts unconditionally; here synthetic/subset lists
    are legitimate (tests, smoke runs, tools/journey_tpu.sh), so a
    mismatch warns by default and only raises with ``strict`` (set
    ``WSEG_STRICT_SPLITS=1`` for reference-exact behaviour on real VOC).
    """
    # list-file stems map onto the split names (reference
    # datasets/pascal_voc.py:114-124: train -> train_augvoc.txt,
    # val -> val_voc.txt)
    split = {"train_augvoc": "train", "val_voc": "val"}.get(split, split)
    expect = OFFICIAL_SPLIT_SIZES.get(split)
    if expect is None or n == expect:
        return
    msg = ("split '%s' has %d entries; the official VOC list has %d "
           "(reference datasets/pascal_voc.py:155-157)" %
           (split, n, expect))
    if strict or _env_flag("WSEG_STRICT_SPLITS"):
        raise AssertionError(msg)
    warnings.warn(msg)


class VOCSegmentation:
    """Training/validation dataset with joint augmentation.

    __getitem__ -> (image HWC — uint8 with ``transfer="uint8"`` (the
    default; train/eval steps normalise on device, 4x less upload) or
    float32 ImageNet-normalised with ``transfer="float32"`` —
    labels (C-1,), name, mask HW int32).
    """

    def __init__(self, data_cfg, split: str, root: str = "",
                 augment: bool = True, seed: int = 0,
                 scoremap_path: str = "", transfer: str = "uint8",
                 device_jitter: bool = False):
        self.cfg = data_cfg
        self.root = root or data_cfg.ROOT
        self.split = split
        self.entries = read_filelist(
            os.path.join(self.root, split + ".txt"), self.root)
        check_split_integrity(split, len(self.entries))
        self.augment = augment
        # optional externally-produced per-image scoremap stream,
        # joint-augmented with image/mask (reference
        # datasets/pascal_voc.py:132-150,175-179)
        self.scoremap_path = scoremap_path
        crop = int(data_cfg.CROP_SIZE)
        tail = tf.MaskToUint8() if transfer == "uint8" \
            else tf.MaskNormalise(MEAN, STD)
        # device_jitter: the loader only SAMPLES the colour-jitter
        # params (ops/jitter.py applies them on device in the train
        # step) — the PIL HSV round-trips are the biggest host cost of
        # the input pipeline.  Requires the uint8 transfer path.
        self.device_jitter = bool(device_jitter and augment
                                  and transfer == "uint8"
                                  and not scoremap_path)
        if augment:
            jit = [] if self.device_jitter \
                else [tf.MaskColourJitter(p=1.0)]
            self.transform = tf.Compose([
                tf.MaskRandResizedCrop(crop, float(data_cfg.SCALE_FROM),
                                       float(data_cfg.SCALE_TO)),
                tf.MaskHFlip(),
                *jit,
                tail,
            ])
        else:
            self.transform = tf.Compose([
                tf.MaskCenterCrop(crop),
                tail,
            ])
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, index: int):
        img_path, mask_path = self.entries[index]
        image = Image.open(img_path).convert("RGB")
        mask = Image.open(mask_path)
        if not self.scoremap_path:
            image, mask = self.transform(image, mask, self.rng)
            mask_np = np.asarray(mask, np.int32)
            labels = labels_from_mask(mask_np)
            if self.device_jitter:
                # sampled AFTER the pipeline: same rng stream position
                # as the in-pipeline MaskColourJitter (the tail
                # transform draws nothing)
                from wseg_tpu.ops.jitter import sample_colour_jitter
                return (image, labels, os.path.basename(img_path),
                        mask_np, sample_colour_jitter(self.rng, p=1.0))
            return image, labels, os.path.basename(img_path), mask_np
        stem = os.path.splitext(os.path.basename(img_path))[0]
        sm_file = os.path.join(self.scoremap_path, stem + ".npy")
        if os.path.exists(sm_file):
            score_np = np.load(sm_file).astype(np.float32)
        else:
            score_np = np.zeros(
                (mask.size[1], mask.size[0]), np.float32)
        score = Image.fromarray(score_np, mode="F")
        image, mask, score = self.transform(image, mask, self.rng, score)
        mask_np = np.asarray(mask, np.int32)
        labels = labels_from_mask(mask_np)
        return (image, labels, os.path.basename(img_path), mask_np,
                np.asarray(score, np.float32))

    def denorm(self, image: np.ndarray) -> np.ndarray:
        return image * np.asarray(STD, np.float32) + np.asarray(
            MEAN, np.float32)
