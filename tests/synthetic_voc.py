"""Fabricate a tiny VOC-style dataset on disk for end-to-end tests."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from wseg_tpu.data.pascal_voc import get_palette


def make_synthetic_voc(root: str, n_train: int = 4, n_val: int = 2,
                       size=(80, 60), seed: int = 0):
    """Creates JPEGImages/, SegmentationClass/, and filelists under root.

    Each image contains 1-2 coloured rectangles whose GT masks carry the
    matching class index, so image-level labels are derivable and simple
    models can latch onto colour.
    """
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "JPEGImages"), exist_ok=True)
    os.makedirs(os.path.join(root, "SegmentationClass"), exist_ok=True)
    palette = get_palette()

    def one(idx):
        w, h = size
        img = np.full((h, w, 3), 255, np.uint8)
        mask = np.zeros((h, w), np.uint8)
        for _ in range(rng.randint(1, 3)):
            cls = rng.randint(1, 21)
            x0, y0 = rng.randint(0, w // 2), rng.randint(0, h // 2)
            x1 = x0 + rng.randint(w // 4, w // 2)
            y1 = y0 + rng.randint(h // 4, h // 2)
            colour = np.asarray(palette[3 * cls: 3 * cls + 3], np.uint8)
            img[y0:y1, x0:x1] = colour
            mask[y0:y1, x0:x1] = cls
        name = f"im{idx:04d}"
        Image.fromarray(img).save(
            os.path.join(root, "JPEGImages", name + ".jpg"))
        m = Image.fromarray(mask, mode="P")
        m.putpalette(palette)
        m.save(os.path.join(root, "SegmentationClass", name + ".png"))
        return (f"JPEGImages/{name}.jpg", f"SegmentationClass/{name}.png")

    entries = [one(i) for i in range(n_train + n_val)]
    with open(os.path.join(root, "train_augvoc.txt"), "w") as f:
        for img, msk in entries[:n_train]:
            f.write(f"/{img} /{msk}\n")
    with open(os.path.join(root, "val_voc.txt"), "w") as f:
        for img, msk in entries[n_train:]:
            f.write(f"/{img} /{msk}\n")
    return root
