import textwrap

import pytest

from wseg_tpu.config import cfg, cfg_from_file, cfg_from_list


def test_defaults_match_reference_schema():
    assert cfg.TRAIN.BATCH_SIZE == 20
    assert cfg.NET.PAMR_KERNEL == [1, 2, 4, 8, 12, 24]
    assert cfg.NET.PAMR_ITER == 10
    assert cfg.NET.SG_PSI == 0.3
    assert cfg.TEST.BG_POW == 3
    assert cfg.MASKS.CRF.ALPHA_HIGH == 32


def test_yaml_merge_reference_config(tmp_path):
    y = textwrap.dedent("""\
        NUM_GPUS: 1
        DATASET:
          CROP_SIZE: 384
          ROOT: "../1sw/data"
          FILENAME: "train_augvoc"
        TRAIN:
          BATCH_SIZE: 8
          NUM_EPOCHS: 25
        NET:
          BACKBONE: "resnet38"
          MODEL: "CAM_CASA_WGAP_tf"
          LR: 0.001
          WEIGHT_DECAY: 0.0005
        TEST:
          METHOD: "multiscale"
          FLIP: True
          BATCH_SIZE: 8
          PAD_SIZE: [1024, 1024]
          SCALES: [1, 0.5, 1.5, 2.0]
          USE_GT_LABELS: True
        """)
    f = tmp_path / "c.yaml"
    f.write_text(y)
    cfg_from_file(str(f))
    assert cfg.DATASET.CROP_SIZE == 384
    assert cfg.NET.MODEL == "CAM_CASA_WGAP_tf"
    assert cfg.TEST.SCALES == [1, 0.5, 1.5, 2.0]
    assert cfg.TEST.FLIP is True
    assert cfg.NET.WEIGHT_DECAY == 0.0005


def test_unknown_key_rejected(tmp_path):
    f = tmp_path / "bad.yaml"
    f.write_text("BOGUS_KEY: 1\n")
    with pytest.raises(KeyError):
        cfg_from_file(str(f))


def test_set_list_semantics():
    cfg_from_list(["TEST.BG_POW", "1", "NET.LR", "0.01",
                   "TEST.SCALES", "[1.0]"])
    assert cfg.TEST.BG_POW == 1
    assert cfg.NET.LR == 0.01
    assert cfg.TEST.SCALES == [1.0]


def test_set_unknown_key_asserts():
    with pytest.raises(AssertionError):
        cfg_from_list(["TEST.NOPE", "1"])


def test_immutability():
    cfg.immutable(True)
    with pytest.raises(AttributeError):
        cfg.NET.LR = 5.0
    cfg.immutable(False)
    cfg.NET.LR = 5.0
    assert cfg.NET.LR == 5.0
