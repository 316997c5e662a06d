"""CLI end-to-end: infer_cam.py, cam.py, train_SEAM.py on synthetic data."""

import importlib.util
import os
import sys
import textwrap

import numpy as np
import pytest

from tests.synthetic_voc import make_synthetic_voc


def _write_cfg(tmp_path, root):
    y = textwrap.dedent(f"""\
        DATASET:
          CROP_SIZE: 48
          ROOT: "{root}"
          FILENAME: "train_augvoc"
        TRAIN:
          BATCH_SIZE: 2
          NUM_EPOCHS: 0
          PRETRAIN: 0
        NET:
          BACKBONE: "vgg16"
          MODEL: "ae"
          LR: 0.0005
          DTYPE: "float32"
          PAMR_KERNEL: [1, 2]
          PAMR_ITER: 2
        TEST:
          METHOD: "multiscale"
          DATA_ROOT: "{root}"
          FLIP: True
          BATCH_SIZE: 4
          PAD_SIZE: [96, 96]
          SCALES: [1, 0.5]
          USE_GT_LABELS: True
        """)
    p = tmp_path / "cfg.yaml"
    p.write_text(y)
    return str(p)


def _load_cli(name):
    path = os.path.join(os.path.dirname(__file__), "..", name)
    spec = importlib.util.spec_from_file_location(
        name[:-3] + "_cli_extra", path)
    m = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = m
    spec.loader.exec_module(m)
    return m


def test_infer_cam_cli(tmp_path):
    root = make_synthetic_voc(str(tmp_path / "data"), n_train=2, n_val=2)
    cfg_file = _write_cfg(tmp_path, root)
    cli = _load_cli("infer_cam.py")
    out = str(tmp_path / "cam_masks")
    cli.main(["--dataset", "pascal_voc", "--cfg", cfg_file,
              "--exp", "e", "--run", "r",
              "--snapshot-dir", str(tmp_path / "snap"),
              "--logdir", str(tmp_path / "logs"),
              "--infer-list", os.path.join(root, "val_voc.txt"),
              "--mask-output-dir", out,
              "--method", "gradcam"])
    files = os.listdir(os.path.join(out, "no_crf"))
    assert len(files) == 2


def test_cam_cli(tmp_path):
    root = make_synthetic_voc(str(tmp_path / "data"), n_train=1, n_val=1)
    cfg_file = _write_cfg(tmp_path, root)
    cli = _load_cli("cam.py")
    img = os.path.join(root, "JPEGImages", "im0000.jpg")
    cwd = os.getcwd()
    os.chdir(str(tmp_path))
    try:
        cli.main(["--dataset", "pascal_voc", "--cfg", cfg_file,
                  "--exp", "e", "--run", "r",
                  "--snapshot-dir", str(tmp_path / "snap"),
                  "--logdir", str(tmp_path / "logs"),
                  "--image-path", img, "--method", "gradcam",
                  "--target-category", "3"])
    finally:
        os.chdir(cwd)
    assert (tmp_path / "gradcam_cam.jpg").is_file()
    assert (tmp_path / "gradcam_gb.jpg").is_file()
    assert (tmp_path / "gradcam_cam_gb.jpg").is_file()


def test_train_seam_cli(tmp_path):
    root = make_synthetic_voc(str(tmp_path / "data"), n_train=4, n_val=2)
    cfg_file = _write_cfg(tmp_path, root)
    cli = _load_cli("train_SEAM.py")
    cli.main(["--dataset", "pascal_voc", "--cfg", cfg_file,
              "--exp", "seam", "--run", "r",
              "--snapshot-dir", str(tmp_path / "snap"),
              "--logdir", str(tmp_path / "logs"),
              "--workers", "2"])
    # validated + trained one epoch without error
    assert os.path.isdir(str(tmp_path / "snap"))
