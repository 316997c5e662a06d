"""Import the reference torch models as numerical oracles.

The reference implementation at /root/reference is importable (pure
torch); these helpers build a reference model with RANDOM init, run its
forward in eval mode, and hand back numpy outputs so tests can assert that
our converted-weight Flax forward reproduces it numerically.  No reference
code is copied — the reference modules are imported from their own tree.

Determinism: the torch model is put in ``eval()`` so dropout is identity,
StochasticGate takes its deterministic branch, and BatchNorms use running
stats (reference base_net.py:93-109 keeps backbone BNs frozen in train
too).  The train-path outputs (pseudo_gt, loss_mask, ...) are still
computed whenever ``labels`` is passed (reference models/SoftMaxAE.py:185).
"""

from __future__ import annotations

import sys

import numpy as np

REFERENCE_ROOT = "/root/reference"
_patched = False


def _ensure_importable():
    """Put the reference tree on sys.path and make ``_init_weights(None)``
    a no-op (the reference unconditionally torch.load()s in some models,
    base_net.py:42-45; we random-init instead)."""
    global _patched
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    if not _patched:
        from models.backbones import base_net

        orig = base_net.BaseNet._init_weights

        def _init_weights(self, path):
            if path:
                orig(self, path)

        base_net.BaseNet._init_weights = _init_weights
        _patched = True


def make_net_cfg(model: str, backbone: str, **overrides):
    """A fresh cfg.NET AttrDict (shared schema) for both frameworks."""
    from wseg_tpu.config import _default_cfg

    net = _default_cfg().NET
    net.MODEL = model
    net.BACKBONE = backbone
    net.DTYPE = "float32"
    for k, v in overrides.items():
        setattr(net, k, v)
    return net


def build_reference_model(net_cfg, num_classes: int = 21, seed: int = 0):
    """Random-init reference torch model in eval mode."""
    _ensure_importable()
    import torch

    from models.stage_net import network_factory

    torch.manual_seed(seed)
    cls = network_factory(net_cfg)
    model = cls(net_cfg, pre_weights=None, num_classes=num_classes)
    model.eval()
    return model


def save_state_dict(model, path: str) -> str:
    import torch

    torch.save(model.state_dict(), str(path))
    return str(path)


def _np(t):
    return t.detach().cpu().numpy()


def _nhwc(t):
    return np.transpose(_np(t), (0, 2, 3, 1))


def run_reference(model, image_nhwc, raw_nhwc=None, labels=None):
    """Run the reference forward; returns a dict of numpy arrays (NHWC).

    ``labels is None`` -> test mode (cls, masks); otherwise the full
    7-tuple train-path contract (reference models/SoftMaxAE.py:261).
    """
    import torch

    x = torch.from_numpy(
        np.ascontiguousarray(np.transpose(image_nhwc, (0, 3, 1, 2))))
    with torch.no_grad():
        if labels is None:
            cls, masks = model(x)
            return {"cls": _np(cls), "masks": _nhwc(masks)}
        raw = torch.from_numpy(
            np.ascontiguousarray(np.transpose(raw_nhwc, (0, 3, 1, 2))))
        lab = torch.from_numpy(np.asarray(labels, np.float32))
        cls, cls_fg, masks, mask_logits, pseudo_gt, loss_mask, loss_at = \
            model(x, raw, lab)
        out = {
            "cls": _np(cls),
            "cls_fg": _np(cls_fg),
            "masks": _nhwc(masks["cam"]),
            "mask_logits": _nhwc(mask_logits),
        }
        if "dec" in masks:
            out["masks_dec"] = _nhwc(masks["dec"])
        if pseudo_gt is not None:
            out["pseudo_gt"] = _nhwc(pseudo_gt)
        if loss_mask is not None:
            out["loss_mask"] = _np(loss_mask)
        if loss_at is not None:
            out["loss_at"] = _np(loss_at)
        return out
