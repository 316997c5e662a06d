"""End-to-end slice: synthetic VOC -> train epoch -> multi-scale inference
-> PNG masks -> eval_seg mIoU (BASELINE.json config #1's shape)."""

import importlib.util
import os
import sys
import textwrap

import numpy as np
import pytest

from wseg_tpu.config import cfg, cfg_from_file
from tests.synthetic_voc import make_synthetic_voc


def _write_cfg(tmp_path, root, model="bsl", backbone="vgg16"):
    y = textwrap.dedent(f"""\
        DATASET:
          CROP_SIZE: 48
          ROOT: "{root}"
          FILENAME: "train_augvoc"
        TRAIN:
          BATCH_SIZE: 2
          NUM_EPOCHS: 0
          PRETRAIN: 5
        NET:
          BACKBONE: "{backbone}"
          MODEL: "{model}"
          LR: 0.0005
          DTYPE: "float32"
          PAMR_KERNEL: [1, 2]
          PAMR_ITER: 2
        TEST:
          METHOD: "multiscale"
          DATA_ROOT: "{root}"
          FLIP: True
          BATCH_SIZE: 4
          PAD_SIZE: [128, 128]
          SCALES: [1, 0.5]
          USE_GT_LABELS: True
          BG_POW: 3
        """)
    p = tmp_path / "cfg.yaml"
    p.write_text(y)
    return str(p)


def _load_cli(name):
    path = os.path.join(os.path.dirname(__file__), "..", name)
    spec = importlib.util.spec_from_file_location(name[:-3] + "_cli", path)
    m = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = m
    spec.loader.exec_module(m)
    return m


def test_train_infer_eval_cycle(tmp_path):
    root = make_synthetic_voc(str(tmp_path / "data"), n_train=4, n_val=2)
    cfg_file = _write_cfg(tmp_path, root)

    # --- train one epoch through the CLI driver
    train_cli = _load_cli("train.py")
    argv = ["--dataset", "pascal_voc", "--cfg", cfg_file,
            "--exp", "e2e", "--run", "r0",
            "--snapshot-dir", str(tmp_path / "snap"),
            "--logdir", str(tmp_path / "logs"),
            "--workers", "2"]
    train_cli.main(argv)  # NUM_EPOCHS 0 -> one epoch (range inclusive)

    # a checkpoint exists?  (epoch 0 < PRETRAIN so checkpoint_best is not
    # called; just assert the trainer ran and logged)
    assert os.path.isdir(str(tmp_path / "snap"))

    # --- multi-scale inference over the val filelist
    from wseg_tpu.config import reset_cfg
    reset_cfg()
    infer_cli = _load_cli("infer_val.py")
    infer_cli.TEST_ID = [2]  # single writer, thresh 0.3, no CRF
    out_dir = str(tmp_path / "masks")
    argv = ["--dataset", "pascal_voc", "--cfg", cfg_file,
            "--exp", "e2e", "--run", "r0",
            "--snapshot-dir", str(tmp_path / "snap"),
            "--logdir", str(tmp_path / "logs"),
            "--infer-list", os.path.join(root, "val_voc.txt"),
            "--mask-output-dir", out_dir]
    infer_cli.main(argv)

    pred_dir = out_dir + "_3/no_crf"
    preds = sorted(os.listdir(pred_dir))
    assert len(preds) == 2, preds
    from PIL import Image
    im0 = np.asarray(Image.open(os.path.join(pred_dir, preds[0])))
    assert im0.ndim == 2  # indexed PNG

    # --- eval_seg over the produced masks
    from wseg_tpu.config import reset_cfg
    reset_cfg()
    eval_cli = _load_cli("eval_seg.py")
    args = eval_cli.parser.parse_args(
        ["--data", root,
         "--filelist", os.path.join(root, "val_voc.txt"),
         "--masks", pred_dir,
         "--log-scores", str(tmp_path / "scores.log")])
    M = eval_cli.evaluate_all(args)
    stats = eval_cli.summarise_stats(M)
    assert M.sum() > 0
    assert 0.0 <= stats["miou"] <= 100.0
    assert os.path.isfile(str(tmp_path / "scores.log"))


def test_infer_val_with_crf(tmp_path):
    """The CRF writer path of infer_val (writer id 0: thresh 0.0 + CRF):
    drives the native C++ permutohedral CRF (numpy fallback) through the
    CLI and checks both no_crf/ and crf/ outputs appear."""
    root = make_synthetic_voc(str(tmp_path / "data"), n_train=1, n_val=2)
    cfg_file = _write_cfg(tmp_path, root)

    from wseg_tpu.config import reset_cfg
    reset_cfg()
    infer_cli = _load_cli("infer_val.py")
    infer_cli.TEST_ID = [0]  # thresh 0.0, CRF enabled
    out_dir = str(tmp_path / "masks")
    infer_cli.main(["--dataset", "pascal_voc", "--cfg", cfg_file,
                    "--exp", "e2e", "--run", "r0",
                    "--snapshot-dir", str(tmp_path / "snap"),
                    "--logdir", str(tmp_path / "logs"),
                    "--infer-list", os.path.join(root, "val_voc.txt"),
                    "--mask-output-dir", out_dir])
    base = out_dir + "_0"  # suffix = str(0.0).split(".")[-1]
    assert len(os.listdir(os.path.join(base, "no_crf"))) == 2
    crf_files = sorted(os.listdir(os.path.join(base, "crf")))
    assert len(crf_files) == 2
    from PIL import Image
    im = np.asarray(Image.open(os.path.join(base, "crf", crf_files[0])))
    assert im.ndim == 2 and im.shape == (60, 80)
