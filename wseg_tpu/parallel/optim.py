"""4-group optimizer with the reference's per-group LR multipliers.

Reference semantics (models/backbones/base_net.py:114-153): parameters are
split into {pretrained weight, pretrained bias, scratch weight, scratch
bias} groups at LR multipliers (1, 2, 10, 20) — ResNet50/101 use
(1, 1, 10, 10) (resnets.py:190-191) — with weight decay only on weight
groups and frozen layers excluded.  Expressed here as an
``optax.multi_transform`` over a label pytree.
"""

from __future__ import annotations

from typing import Any, Dict

import flax
import jax.numpy as jnp
import optax

from wseg_tpu.models.backbones.common import (
    FROZEN, NEW_B, NEW_W, PRE_B, PRE_W,
)

_STEM_PREFIXES = {
    "resnet38": ("conv1a", "b2", "b2_1", "b2_2"),
    # conv2..bn3 exist only with the deep_base 3-conv stem (they are
    # top-level stem modules there; bottleneck conv2/bn2 live one level
    # deeper and never match)
    "resnet50": ("conv1", "bn1", "conv2", "bn2", "conv3", "bn3"),
    "resnet101": ("conv1", "bn1", "conv2", "bn2", "conv3", "bn3"),
    "vgg16": ("conv1_1", "conv1_2"),
}


def lr_multipliers(backbone: str):
    if backbone in ("resnet50", "resnet101"):
        return (1.0, 1.0, 10.0, 10.0)
    return (1.0, 2.0, 10.0, 20.0)


def label_params(params, backbone: str) -> Dict:
    """Build the label pytree: frozen / pre_w / pre_b / new_w / new_b.

    Frozen = backbone stem modules + every FrozenBatchNorm (identified by
    its {scale, bias, mean, var} param set).
    """
    flat = flax.traverse_util.flatten_dict(params)
    # module path -> set of leaf names, to spot FrozenBatchNorm modules
    module_leaves: Dict[tuple, set] = {}
    for path in flat:
        module_leaves.setdefault(path[:-1], set()).add(path[-1])

    stems = _STEM_PREFIXES.get(backbone, ())
    labels = {}
    for path in flat:
        module, leaf = path[:-1], path[-1]
        in_backbone = path[0] == "backbone"
        is_frozen_bn = {"mean", "var"} <= module_leaves[module]
        is_stem = in_backbone and len(path) > 1 and path[1] in stems
        if is_frozen_bn or is_stem:
            labels[path] = FROZEN
        elif in_backbone:
            labels[path] = PRE_B if leaf == "bias" else PRE_W
        else:
            labels[path] = NEW_B if leaf == "bias" else NEW_W
    return flax.traverse_util.unflatten_dict(labels)


def _sgd_group(lr: float, momentum: float, weight_decay: float):
    tx = []
    if weight_decay > 0:
        tx.append(optax.add_decayed_weights(weight_decay))
    if momentum > 0:
        tx.append(optax.trace(decay=momentum, nesterov=False))
    tx.append(optax.scale(-lr))
    return optax.chain(*tx)


def _adam_group(lr: float, beta1: float, weight_decay: float):
    tx = []
    if weight_decay > 0:
        tx.append(optax.add_decayed_weights(weight_decay))
    tx.append(optax.scale_by_adam(b1=beta1))
    tx.append(optax.scale(-lr))
    return optax.chain(*tx)


def make_optimizer(net_cfg: Any, backbone: str, params) -> tuple:
    """Returns (optax transform, label pytree)."""
    base_lr = float(net_cfg.LR)
    wd = float(net_cfg.WEIGHT_DECAY)
    mom = float(net_cfg.MOMENTUM)
    beta1 = float(getattr(net_cfg, "BETA1", 0.9))
    w_old, b_old, w_new, b_new = lr_multipliers(backbone)
    opt_name = str(net_cfg.OPT)

    if opt_name == "SGD":
        groups = {
            FROZEN: optax.set_to_zero(),
            PRE_W: _sgd_group(base_lr * w_old, mom, wd),
            PRE_B: _sgd_group(base_lr * b_old, mom, 0.0),
            NEW_W: _sgd_group(base_lr * w_new, mom, wd),
            NEW_B: _sgd_group(base_lr * b_new, mom, 0.0),
        }
    elif opt_name == "Adam":
        groups = {
            FROZEN: optax.set_to_zero(),
            PRE_W: _adam_group(base_lr * w_old, beta1, wd),
            PRE_B: _adam_group(base_lr * b_old, beta1, 0.0),
            NEW_W: _adam_group(base_lr * w_new, beta1, wd),
            NEW_B: _adam_group(base_lr * b_new, beta1, 0.0),
        }
    else:
        raise NotImplementedError(f"Optimizer '{opt_name}'")

    labels = label_params(params, backbone)
    tx = optax.multi_transform(groups, labels)

    # TPU-native extension (reference has no clipping): optional global
    # grad-norm clip, default OFF so converted-checkpoint training
    # matches the reference update-for-update.  Useful for from-scratch
    # runs, where frozen-identity BN makes early gradients explode.
    clip = float(getattr(net_cfg, "GRAD_CLIP", 0.0) or 0.0)
    if clip > 0.0:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx, labels
