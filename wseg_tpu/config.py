"""Layered configuration system with the reference YAML schema.

Keeps CLI parity with the reference (core/config.py + utils/collections.py):
code defaults <- YAML file <- ``--set KEY VALUE ...`` overrides, with strict
unknown-key rejection and literal_eval type coercion, so the reference's
shipped ``configs/*.yaml`` run unchanged.

Implementation is new: a small immutable-aware AttrDict plus a recursive
merge.  The schema below mirrors reference core/config.py:24-110.
"""

from __future__ import annotations

import copy
from ast import literal_eval

import yaml


class AttrDict(dict):
    """dict with attribute access and a recursive immutability latch."""

    _IMMUTABLE = "__immutable__"

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.__dict__[AttrDict._IMMUTABLE] = False
        # promote nested dicts
        for k, v in list(self.items()):
            if isinstance(v, dict) and not isinstance(v, AttrDict):
                self[k] = AttrDict(v)

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        if self.is_immutable():
            raise AttributeError(
                "Attempted to set '{}' on an immutable config".format(name)
            )
        self[name] = value

    def __setitem__(self, name, value):
        # __dict__ may not hold the latch yet: dict-subclass unpickling
        # repopulates items via __setitem__ before __init__ runs (grain
        # worker processes cloudpickle the dataset, which carries cfg)
        if self.is_immutable():
            raise AttributeError(
                "Attempted to set '{}' on an immutable config".format(name)
            )
        super().__setitem__(name, value)

    def __reduce__(self):
        return (AttrDict, (dict(self),))

    def immutable(self, flag: bool) -> None:
        """Recursively (un)freeze this config tree."""
        self.__dict__[AttrDict._IMMUTABLE] = flag
        for v in self.values():
            if isinstance(v, AttrDict):
                v.immutable(flag)

    def is_immutable(self) -> bool:
        return self.__dict__.get(AttrDict._IMMUTABLE, False)

    def clone(self) -> "AttrDict":
        out = AttrDict()
        for k, v in self.items():
            if isinstance(v, AttrDict):
                dict.__setitem__(out, k, v.clone())
            else:
                dict.__setitem__(out, k, copy.deepcopy(v))
        return out


def _default_cfg() -> AttrDict:
    """Defaults matching reference core/config.py:24-110 key-for-key."""
    c = AttrDict()
    c.NUM_GPUS = 1  # kept for YAML-compat; on TPU this is the #devices hint

    c.TRAIN = AttrDict()
    c.TRAIN.BATCH_SIZE = 20
    c.TRAIN.NUM_EPOCHS = 15
    c.TRAIN.NUM_WORKERS = 4
    c.TRAIN.MASK_LOSS = 0.0
    c.TRAIN.PRETRAIN = 5

    c.TEST = AttrDict()
    c.TEST.METHOD = "multiscale"  # multiscale | multicrop
    c.TEST.DATA_ROOT = "/data/your_directory"
    c.TEST.SCALES = [1, 0.5, 1.5, 2.0]
    c.TEST.FLIP = False
    c.TEST.PAD_SIZE = [1024, 1024]
    c.TEST.CROP_SIZE = [448, 448]
    c.TEST.CROP_GRID_SIZE = [2, 2]
    c.TEST.BATCH_SIZE = 4
    c.TEST.BG_POW = 3
    c.TEST.NUM_CLASSES = 21
    c.TEST.USE_GT_LABELS = False
    c.TEST.FP_CUT_SCORE = 0.1
    # TPU extension: pad each scale view to its own bucket instead of one
    # global PAD_SIZE (reference pads every view to 1024^2 regardless of
    # scale, wasting up to 4x FLOPs on small scales).  Semantics of the
    # merged mask are unchanged: padding is cut before merging either
    # way.  Default ON since r3 (like the other device fast paths): the
    # global-1024^2 mode also makes the merge canvas 1024^2, which at
    # BATCH_SIZE 16 pushed the slot-batched device postprocess past HBM.
    # Set False for reference-identical padding.
    c.TEST.PAD_PER_SCALE = True
    # TPU extension: merge scale/flip views on device and fetch only the
    # merged map (the reference merges on host, fetching every view).
    # Default ON: the host path fetches 8 full-resolution tensors per
    # image over a ~30ms-RTT link; set False for bit-exact reference
    # merge semantics (validated to agree in tests/test_infer_engine.py).
    c.TEST.DEVICE_MERGE = True
    # TPU extension: round per-view pad sizes up to a multiple of this
    # (keeps XLA program count bounded and shapes MXU/VPU friendly).
    # 64 measured better than 128 on v5e (tools/bench_buckets.py r3:
    # the 0.5x bucket of a 512x384 image drops 256^2 -> 192x256, 43.5
    # -> 24.6 ms/16 views; whole-geometry forward 12.12 -> 12.87
    # img/s) — stride-8 features stay MXU-tileable at multiples of 64.
    c.TEST.PAD_ALIGN = 64
    # TPU extension: ship uint8 views and normalise + zero-pad on device
    # (byte-exact: PIL resize outputs uint8; 4x less host->device
    # traffic, which dominates on remote-attached chips).
    c.TEST.UINT8_TRANSFER = True
    # TPU extension: generate the scale/flip views on device too — ONE
    # uint8 original upload per image, cubic resize/flip/pad as MXU
    # matmuls (ops/view_gen.py).  ~num_views less upload volume and no
    # host PIL resizes.  Views match PIL within ~2/255 per pixel
    # (tests/test_view_gen.py); set False for the byte-exact host path.
    c.TEST.DEVICE_VIEWS = True
    # TPU extension: device-CRF numerics.  CRF_DTYPE sets the
    # message-passing precision ("bfloat16" halves the HBM traffic of
    # the ~80-tap bilateral loop; "float32" for byte-exact parity runs).
    # CRF_STRIDE > 1 evaluates the bilateral message on an (H/s, W/s)
    # grid and upsamples (the sxy=80 kernel is ~40-px sampled, so s=2
    # is far inside its smoothness; ~4x cheaper bilateral).  Fidelity
    # bounds vs the exact permutohedral CRF: tools/crf_fidelity.py and
    # docs/PARITY.md.
    # CRF_MODE "exact": the serving fast path runs the EXACT
    # permutohedral mean field per image on device (ops/crf_mm.py,
    # 0.0000% measured argmax deviation vs native/densecrf — the
    # reference's pydensecrf semantics, utils/dcrf.py:6-21) instead of
    # the in-program sparse-tap approximation below.  Costs ~90 ms/img
    # device + ~180 ms/img host lattice build (overlapped); "fast" is
    # the throughput knob (0.7-1.1% argmax deviation, docs/PARITY.md).
    c.TEST.CRF_MODE = "fast"
    c.TEST.CRF_DTYPE = "bfloat16"
    c.TEST.CRF_STRIDE = 2
    # CRF_FULL_STRIDE s > 1 runs the WHOLE mean field at (H/s, W/s)
    # (one box downsample in, one bilinear upsample of the final Q out;
    # both spatial sigmas divided by s — the reference crf_inference's
    # ``scale_factor`` semantics, utils/dcrf.py:6-12).  Unlike
    # CRF_STRIDE it also shrinks the fine-Gaussian / softmax / unary
    # per-iteration traffic, the dominant device-CRF cost once the
    # bilateral is strided.  1 = off; fidelity: tools/crf_fidelity.py.
    c.TEST.CRF_FULL_STRIDE = 2
    # with CRF_FULL_STRIDE > 1: run the LAST r iterations at full
    # resolution seeded from the upsampled coarse Q (coarse-to-fine
    # mean field) — restores the boundary detail the coarse grid loses
    # at r/t of the full-res per-iteration cost.  The r3 default
    # (FULL_STRIDE 2 + 1 refine iteration) is BOTH 3.4x faster than the
    # previous stride-2-bilateral default (5.2 vs 17.6 ms/img device
    # time at the 384x512 canvas) and closer to the exact permutohedral
    # CRF (argmax deviation 0.95% vs 0.97%, mIoU-vs-GT 0.9818 vs 0.9809
    # on production-size scenes; native exact = 0.9922,
    # tools/crf_fidelity.py).
    c.TEST.CRF_REFINE_ITERS = 1
    # bilateral tap-grid density (step = sxy / div).  2.0 with stride 2
    # is ~4x cheaper than the r2 default and slightly MORE faithful to
    # the exact lattice; 4.0 at stride 2 costs about the r2 default and
    # tracks the exact permutohedral closest (~1.2%% argmax deviation).
    c.TEST.CRF_TAP_DIV = 2.0

    c.DATASET = AttrDict()
    c.DATASET.CROP_SIZE = 321
    c.DATASET.SCALE_FROM = 0.9
    c.DATASET.SCALE_TO = 1.0
    c.DATASET.PATH = "data/images"
    c.DATASET.ROOT = ""
    c.DATASET.NAME = ""
    c.DATASET.FILENAME = ""
    # TPU extension: loader samples colour-jitter params, train step
    # applies them on device (ops/jitter.py) — removes the dominant
    # PIL cost from the host input path.  False = byte-exact host
    # jitter (reference torchvision semantics).
    c.DATASET.DEVICE_JITTER = True

    c.NET = AttrDict()
    c.NET.MODEL = "vgg16"
    c.NET.BACKBONE = "resnet50"
    c.NET.PRE_WEIGHTS_PATH = ""
    c.NET.OPT = "SGD"
    c.NET.LR = 0.001
    # TPU extension: optax global grad-norm clip; 0 = off (reference has
    # no clipping — leave off for update-for-update parity)
    c.NET.GRAD_CLIP = 0.0
    c.NET.BETA1 = 0.5
    c.NET.MOMENTUM = 0.9
    c.NET.WEIGHT_DECAY = 1e-5
    c.NET.LOSS = "SoftMargin"
    c.NET.MASK_LOSS_BCE = 1.0
    c.NET.BG_SCORE = 0.1
    c.NET.FOCAL_P = 3
    c.NET.FOCAL_LAMBDA = 0.01
    c.NET.PAMR_KERNEL = [1, 2, 4, 8, 12, 24]
    c.NET.PAMR_ITER = 10
    c.NET.SG_PSI = 0.3
    # TPU extensions
    # compute dtype: "float32", "bfloat16" (default), or "int8" —
    # inference-only w8a8 dynamic quantization of the backbone convs
    # (per-channel weight scales, per-tensor activation scales, int8
    # MXU path: 17.7 vs 13.0 img/s multi-scale forward on v5e); the
    # head stays bfloat16 and bf16 checkpoints load unchanged.
    # Fidelity: tests/test_quant.py, docs/ROOFLINE.md.
    c.NET.DTYPE = "bfloat16"
    # int8 activation scales: "dynamic" (per-image, inside the program)
    # or "static" (per-input-channel from a calibration pass —
    # tools/quant_calibrate.py writes NET.QUANT_STATS, a msgpack of the
    # ``quant_stats`` collection; finer grids for outlier channels AND
    # no runtime |x| reductions).  Only read when NET.DTYPE is int8.
    c.NET.QUANT_ACT = "dynamic"
    c.NET.QUANT_STATS = ""
    c.NET.PAMR_IMPL = "auto"  # auto | lax | pallas

    c.MASKS = AttrDict()
    c.MASKS.CRF = AttrDict()
    c.MASKS.CRF.ALPHA_LOW = 4
    c.MASKS.CRF.ALPHA_HIGH = 32

    c.CUDA = False  # inert on TPU; kept for YAML-compat
    c.DEBUG = False
    c.PYTORCH_VERSION_LESS_THAN_040 = False
    return c


cfg = _default_cfg()


def reset_cfg() -> None:
    """Restore code defaults in-place (used by tests)."""
    cfg.immutable(False)
    fresh = _default_cfg()
    for k in list(cfg.keys()):
        dict.__delitem__(cfg, k)
    for k, v in fresh.items():
        dict.__setitem__(cfg, k, v)


def assert_and_infer_cfg(make_immutable: bool = True) -> None:
    if make_immutable:
        cfg.immutable(True)


def _decode_value(v):
    if isinstance(v, dict):
        return AttrDict(v)
    if not isinstance(v, str):
        return v
    try:
        return literal_eval(v)
    except (ValueError, SyntaxError):
        return v


def _coerce(value_new, value_old, full_key):
    if type(value_new) is type(value_old):
        return value_new
    if isinstance(value_old, str):
        return str(value_new)
    if isinstance(value_new, tuple) and isinstance(value_old, list):
        return list(value_new)
    if isinstance(value_new, list) and isinstance(value_old, tuple):
        return tuple(value_new)
    # int -> float promotion is benign and common in YAML ("LR: 1")
    if isinstance(value_old, float) and isinstance(value_new, int):
        return float(value_new)
    if isinstance(value_old, (bool,)) and isinstance(value_new, int):
        return bool(value_new)
    raise ValueError(
        "Type mismatch ({} vs. {}) for config key: {}".format(
            type(value_old), type(value_new), full_key
        )
    )


def _merge_into(a: AttrDict, b: AttrDict, stack=None) -> None:
    for k, v_raw in a.items():
        full_key = ".".join((stack or []) + [k])
        if k not in b:
            raise KeyError("Non-existent config key: {}".format(full_key))
        v = _decode_value(copy.deepcopy(v_raw))
        if isinstance(v, AttrDict):
            _merge_into(v, b[k], (stack or []) + [k])
        else:
            b[k] = _coerce(v, b[k], full_key)


def merge_cfg_from_file(cfg_filename: str) -> None:
    with open(cfg_filename, "r") as f:
        yaml_cfg = AttrDict(yaml.safe_load(f))
    _merge_into(yaml_cfg, cfg)


def merge_cfg_from_list(cfg_list) -> None:
    """Merge ``--set K V K V ...`` pairs into the global config."""
    assert len(cfg_list) % 2 == 0, "--set expects KEY VALUE pairs"
    for full_key, v in zip(cfg_list[0::2], cfg_list[1::2]):
        d = cfg
        key_list = full_key.split(".")
        for subkey in key_list[:-1]:
            assert subkey in d, "Non-existent key: {}".format(full_key)
            d = d[subkey]
        subkey = key_list[-1]
        assert subkey in d, "Non-existent key: {}".format(full_key)
        d[subkey] = _coerce(_decode_value(v), d[subkey], full_key)


cfg_from_file = merge_cfg_from_file
cfg_from_list = merge_cfg_from_list
