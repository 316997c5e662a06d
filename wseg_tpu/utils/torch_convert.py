"""PyTorch .pth -> Flax params conversion for the pretrained backbones.

The reference initialises every backbone from released torch checkpoints
(reference base_net.py:42-45, configs/*.yaml PRE_WEIGHTS_PATH); conversion
is required both for training parity and for loading the published WRN38
snapshot.  torch (CPU) is used only here, at load time.

Layout conversions: conv kernels (O, I, kh, kw) -> (kh, kw, I, O);
BatchNorm (weight, bias, running_mean, running_var) ->
FrozenBatchNorm (scale, bias, mean, var); Linear (O, I) -> (I, O).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import flax.traverse_util as trav


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        k = k.replace("module.", "")
        out[k] = v.detach().cpu().numpy()
    return out


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


_BN_LEAF = {"weight": "scale", "bias": "bias", "running_mean": "mean",
            "running_var": "var"}


def _torch_name_to_flax_path(name: str, backbone: str):
    """Map one torch param name to a flax path under 'backbone'. Returns
    None for names we don't place (num_batches_tracked, heads, fc)."""
    parts = name.split(".")
    if parts[-1] == "num_batches_tracked":
        return None, None
    leaf = parts[-1]
    mods = parts[:-1]

    if backbone in ("resnet50", "resnet101"):
        # torchvision: layer{i}.{j}.conv1.weight / bn1.* /
        # downsample.0.weight (conv), downsample.1.* (bn)
        if mods and mods[0] in ("fc",):
            return None, None
        if mods and mods[0].startswith("layer"):
            layer, block = mods[0], mods[1]
            rest = mods[2:]
            flax_mod = [f"{layer}_{block}"]
            if rest and rest[0] == "downsample":
                flax_mod.append("downsample_conv" if rest[1] == "0"
                                else "downsample_bn")
                is_bn = rest[1] == "1"
            else:
                flax_mod.extend(rest)
                is_bn = rest and rest[0].startswith("bn")
        else:
            flax_mod = mods
            is_bn = mods and mods[0].startswith("bn")
    else:
        # resnet38 (mxnet-converted) and vgg16 use flat names matching our
        # module names directly (conv1a, b2.bn_branch2a, conv5_3, fc6...)
        flax_mod = mods
        is_bn = bool(mods) and mods[-1].startswith("bn")

    if is_bn:
        mapped = _BN_LEAF.get(leaf)
        if mapped is None:
            return None, None
        return tuple(["backbone"] + flax_mod), mapped
    if leaf == "weight":
        return tuple(["backbone"] + flax_mod), "kernel"
    if leaf == "bias":
        return tuple(["backbone"] + flax_mod), "bias"
    return None, None


# --------------------------------------------------------------- heads
# torch module prefix -> (flax path under params, kind)
# kinds: conv | conv_bias | bn_full (affine + running stats) |
#        bn_affine (affine only; frozen-stat AffineNorm) |
#        bn_stats (running stats only; affine-free live BN) |
#        linear (Dense; transpose) | dense1x1 (1x1 conv -> Dense)
_AE_HEAD_MAP = [
    ("aspp.aspp1.atrous_conv", ("decoder", "aspp", "aspp1_conv"), "conv"),
    ("aspp.aspp2.atrous_conv", ("decoder", "aspp", "aspp2_conv"), "conv"),
    ("aspp.aspp3.atrous_conv", ("decoder", "aspp", "aspp3_conv"), "conv"),
    ("aspp.aspp4.atrous_conv", ("decoder", "aspp", "aspp4_conv"), "conv"),
    ("aspp.aspp1.bn", ("decoder", "aspp", "aspp1_bn"), "bn_affine"),
    ("aspp.aspp2.bn", ("decoder", "aspp", "aspp2_bn"), "bn_affine"),
    ("aspp.aspp3.bn", ("decoder", "aspp", "aspp3_bn"), "bn_affine"),
    ("aspp.aspp4.bn", ("decoder", "aspp", "aspp4_bn"), "bn_affine"),
    ("aspp.global_avg_pool.1", ("decoder", "aspp", "gap_conv"), "conv"),
    ("aspp.global_avg_pool.2", ("decoder", "aspp", "gap_bn"),
     "bn_affine"),
    ("aspp.conv1", ("decoder", "aspp", "conv1"), "conv"),
    ("aspp.bn1", ("decoder", "aspp", "bn1"), "bn_affine"),
    ("fc8_skip.0", ("decoder", "fc8_skip_conv"), "conv"),
    ("fc8_skip.1", ("decoder", "fc8_skip_bn"), "bn_full"),
    ("fc8_x.0", ("decoder", "fc8_x_conv"), "conv"),
    ("fc8_x.1", ("decoder", "fc8_x_bn"), "bn_full"),
    ("shallow_mask.fc_deep.0",
     ("decoder", "shallow_mask", "fc_deep_conv"), "conv"),
    ("shallow_mask.fc_deep.1",
     ("decoder", "shallow_mask", "fc_deep_bn"), "bn_full"),
    ("shallow_mask.fc_skip.0",
     ("decoder", "shallow_mask", "fc_skip_conv"), "conv"),
    ("shallow_mask.fc_skip.1",
     ("decoder", "shallow_mask", "fc_skip_bn"), "bn_stats"),
    ("shallow_mask.fc_cls.0",
     ("decoder", "shallow_mask", "fc_cls_conv"), "conv"),
    ("shallow_mask.fc_cls.1",
     ("decoder", "shallow_mask", "fc_cls_bn"), "bn_full"),
    ("last_conv.0", ("decoder", "last_conv1"), "conv"),
    ("last_conv.1", ("decoder", "last_bn1"), "bn_full"),
    ("last_conv.4", ("decoder", "last_conv2"), "conv"),
    ("last_conv.5", ("decoder", "last_bn2"), "bn_full"),
    ("last_conv.8", ("decoder", "last_conv3"), "conv_bias"),
]

def get_head_map(model_name: str):
    """torch-prefix -> flax-path map for one model's head, derived from
    its HeadSpec (so the converter covers all 26 reference variants).

    Reference attribute names are uniform across the variant files
    (fc7/fc8/selfattn/caatention/attention/...; e.g.
    models/CAM_CASA_WGAP_tf.py:253-269); tf_v3 renames its GroupAttention
    to ``fc8`` and adds a 1x1 ``fc8_2`` (models/CAM_CASA_WGAP_tf_v3.py:
    211-227), which we map onto our ``selfattn``/``fc8`` modules.
    """
    if model_name == "ae":
        return list(_AE_HEAD_MAP)
    from wseg_tpu.models.stage_net import MODEL_SPECS

    spec = MODEL_SPECS[model_name]
    m = []

    if spec.multilevel == "sum":
        # CAM_MF per-level heads (reference models/CAM_MF.py:38-41)
        for i, lv in ((6, "conv6"), (5, "conv5"), (4, "conv4"),
                      (3, "conv3")):
            m.append((f"fc8_{i}", (f"fc8_{lv}",), "conv"))
        return m

    if spec.fc7:
        m.append(("fc7", ("fc7",), "conv"))

    sa_t = "fc8" if spec.attn_before_fc7 else "selfattn"
    if spec.self_attn == "global":
        m += [(f"{sa_t}.q", ("selfattn", "q"), "linear"),
              (f"{sa_t}.kv", ("selfattn", "kv"), "linear"),
              (f"{sa_t}.proj", ("selfattn", "proj"), "linear")]
        if spec.sr_ratio > 1:
            m += [(f"{sa_t}.sr", ("selfattn", "sr"), "conv_bias"),
                  (f"{sa_t}.norm", ("selfattn", "norm"), "ln")]
    elif spec.self_attn:
        if spec.cross_query:
            m += [(f"{sa_t}.qk", ("selfattn", "qk"), "linear"),
                  (f"{sa_t}.v", ("selfattn", "v"), "linear"),
                  ("fc6", ("fc6",), "conv")]
        else:
            m.append((f"{sa_t}.qkv", ("selfattn", "qkv"), "linear"))
        m.append((f"{sa_t}.proj", ("selfattn", "proj"), "linear"))
        if spec.talking:
            m += [(f"{sa_t}.pre_softmax_proj",
                   ("selfattn", "pre_softmax_proj"), "param_t"),
                  (f"{sa_t}.post_softmax_proj",
                   ("selfattn", "post_softmax_proj"), "param_t")]

    m.append(("fc8_2" if spec.attn_before_fc7 else "fc8", ("fc8",), "conv"))

    if spec.multi_window_norm:
        m += [("attn_conv", ("attn_conv",), "conv"),
              ("norm", ("norm",), "ln")]
    if spec.refine == "pcm":
        m += [("f8_3", ("f8_3",), "conv"),
              ("f8_4", ("f8_4",), "conv"),
              ("f9", ("f9",), "conv")]
    if spec.channel_attn:
        m += [("caatention.fc1", ("caatention", "fc1"), "dense1x1"),
              ("caatention.fc2", ("caatention", "fc2"), "dense1x1")]
    if spec.spatial_attn:
        m.append(("attention.conv1", ("attention", "conv1"), "conv"))
    return m


def _place(flat_params, flat_stats, sd, torch_prefix, flax_path, kind,
           problems=None):
    placed = 0

    def put(tree, leaf, value, full_key=None):
        nonlocal placed
        key = full_key or tuple(flax_path) + (leaf,)
        if key in tree and tree[key].shape == value.shape:
            tree[key] = np.asarray(value, np.float32)
            placed += 1
        else:
            msg = (f"no slot for {torch_prefix} -> {key} {value.shape}")
            if problems is not None:
                problems.append(msg)
            print(f"  convert: {msg}")

    w = sd.get(torch_prefix + ".weight")
    b = sd.get(torch_prefix + ".bias")
    rm = sd.get(torch_prefix + ".running_mean")
    rv = sd.get(torch_prefix + ".running_var")

    if w is None and b is None and rm is None and rv is None:
        # the mapped module is entirely absent from the checkpoint —
        # a variant mismatch that strict mode must surface (silently
        # skipping leaves the mapped head params at random init)
        msg = f"checkpoint has no tensors for {torch_prefix}"
        if problems is not None:
            problems.append(msg)
        print(f"  convert: {msg}")

    if kind in ("conv", "conv_bias"):
        if w is not None:
            put(flat_params, "kernel", _conv_kernel(w))
        if kind == "conv_bias" and b is not None:
            put(flat_params, "bias", b)
    elif kind == "linear":
        if w is not None:
            put(flat_params, "kernel", w.T)
        if b is not None:
            put(flat_params, "bias", b)
    elif kind == "dense1x1":
        if w is not None:  # (O, I, 1, 1) -> (I, O)
            put(flat_params, "kernel", w[:, :, 0, 0].T)
        if b is not None:
            put(flat_params, "bias", b)
    elif kind in ("bn_affine", "ln"):
        if w is not None:
            put(flat_params, "scale", w)
        if b is not None:
            put(flat_params, "bias", b)
    elif kind == "param_t":
        # bare (out, in) matrix used as x @ W (talking-heads mixers,
        # reference models/CAM_CASA_WGAP_tf_v7.py:111-112)
        if w is not None:
            put(flat_params, None, w.T, full_key=tuple(flax_path))
    elif kind == "bn_full":
        if w is not None:
            put(flat_params, "scale", w)
        if b is not None:
            put(flat_params, "bias", b)
        if rm is not None:
            put(flat_stats, "mean", rm)
        if rv is not None:
            put(flat_stats, "var", rv)
    elif kind == "bn_stats":
        if rm is not None:
            put(flat_stats, "mean", rm)
        if rv is not None:
            put(flat_stats, "var", rv)
    return placed


def load_reference_checkpoint(variables, pth_path: str, model_name: str,
                              backbone: str, strict: bool = False):
    """Convert a full reference model checkpoint (backbone + head).

    Covers every registry variant (the head map is derived from the
    model's HeadSpec).  Returns an updated ``variables`` dict with both
    'params' and 'batch_stats' collections populated.  ``strict`` raises
    if any mapped head tensor has no matching slot.
    """
    sd = _load_state_dict(pth_path)
    params = dict(variables["params"])
    new_params = load_pretrained_backbone(params, pth_path, backbone,
                                          state_dict=sd)

    flat_params = dict(trav.flatten_dict(new_params))
    stats = variables.get("batch_stats", {})
    flat_stats = dict(trav.flatten_dict(stats)) if stats else {}

    head_map = get_head_map(model_name)
    placed = 0
    problems = []
    for torch_prefix, flax_path, kind in head_map:
        placed += _place(flat_params, flat_stats, sd, torch_prefix,
                         flax_path, kind, problems)
    print(f"Converted {placed} head tensors for model '{model_name}'")
    if strict and problems:
        raise ValueError(f"conversion left {len(problems)} unplaced head "
                         f"tensors: {problems}")

    out = dict(variables)
    out["params"] = trav.unflatten_dict(flat_params)
    if flat_stats:
        out["batch_stats"] = trav.unflatten_dict(flat_stats)
    return out


def load_pretrained_backbone(params, pth_path: str, backbone: str,
                             state_dict=None):
    """Copy matching tensors from a torch checkpoint into ``params``.

    Non-matching keys are skipped (the reference loads with strict=False,
    base_net.py:42-45).  Returns the updated params pytree.
    ``state_dict`` reuses an already-deserialised checkpoint (the
    released WRN38 .pth is ~527 MB — loading it twice doubles peak host
    memory).
    """
    sd = state_dict if state_dict is not None else \
        _load_state_dict(pth_path)
    flat = dict(trav.flatten_dict(params))
    loaded, skipped = 0, []
    for name, w in sd.items():
        mod_path, leaf = _torch_name_to_flax_path(name, backbone)
        if mod_path is None:
            skipped.append(name)
            continue
        key = mod_path + (leaf,)
        if key not in flat:
            skipped.append(name)
            continue
        if leaf == "kernel" and w.ndim == 4:
            w = _conv_kernel(w)
        elif leaf == "kernel" and w.ndim == 2:
            w = w.T
        if flat[key].shape != w.shape:
            skipped.append(f"{name} (shape {w.shape} vs "
                           f"{flat[key].shape})")
            continue
        flat[key] = np.asarray(w, np.float32)
        loaded += 1
    print(f"Loaded {loaded} tensors from {pth_path}; "
          f"skipped {len(skipped)}")
    return trav.unflatten_dict(flat)
