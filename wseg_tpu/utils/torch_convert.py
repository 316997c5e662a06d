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
        is_bn = any(m.startswith("bn") for m in mods[-1:]) or \
            (len(mods) >= 1 and mods[-1].startswith("bn"))

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


def load_pretrained_backbone(params, pth_path: str, backbone: str):
    """Copy matching tensors from a torch checkpoint into ``params``.

    Non-matching keys are skipped (the reference loads with strict=False,
    base_net.py:42-45).  Returns the updated params pytree.
    """
    sd = _load_state_dict(pth_path)
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
