"""Checkpoint manager with the reference's suffix naming + keep-best ring.

Reference utils/checkpoints.py + base_trainer.py:78-95: snapshots named
``e{epoch:03d}Xs{score:4.3f}``, files ``{model|opt}_{name}_{suffix}``,
keep-best-N with mtime-based recovery of orphaned snapshots.  Storage is
msgpack via flax.serialization (self-contained; no torch pickle).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import flax.serialization


def make_suffix(epoch: int, score: float) -> str:
    return "e{:03d}Xs{:4.3f}".format(epoch, score)


def parse_suffix(suffix: str) -> Tuple[int, float]:
    """Recover (epoch, score) from a snapshot suffix
    (reference base_trainer.py:59-70)."""
    m = re.match(r"e(\d+)Xs([-0-9.]+)", suffix)
    if not m:
        return 0, -1e16
    return int(m.group(1)), float(m.group(2))


class Checkpoint:
    """Multi-model registry; each model saves params/opt trees per suffix."""

    EXT = ".msgpack"

    def __init__(self, path: str, max_n: int = 3):
        self.path = path
        self.max_n = max_n
        self.models: Dict[str, Any] = {}
        self.checkpoints = []
        os.makedirs(path, exist_ok=True)

    def add_model(self, name: str, template_state, opt_template=None):
        """Register a model by name with a target pytree used for
        deserialisation typing."""
        assert name not in self.models
        self.models[name] = {"model": template_state, "opt": opt_template}

    def limit(self) -> int:
        return self.max_n

    def _filename(self, d: str, name: str, suffix: str) -> str:
        return "{}_{}_{}{}".format(d, name, suffix, self.EXT)

    def _full(self, fn: str) -> str:
        return os.path.join(self.path, fn)

    def add_checkpoints(self):
        """Re-adopt snapshots found on disk, newest max_n by mtime
        (crash recovery; reference utils/checkpoints.py:23-55)."""
        names = {}
        for fn in os.listdir(self.path):
            if not fn.endswith(self.EXT):
                continue
            sfx = fn[: -len(self.EXT)].split("_")[-1]
            t = os.path.getmtime(self._full(fn))
            names[sfx] = max(names.get(sfx, 0), t)
        ordered = sorted(names.items(), key=lambda kv: kv[1])
        self.checkpoints = [sfx for sfx, _ in ordered[-self.max_n:]]

    def checkpoint(self, suffix: str, states: Dict[str, Any],
                   opts: Optional[Dict[str, Any]] = None):
        """Save states (pytrees) under ``suffix``; evict beyond max_n."""
        assert "_" not in suffix, "Underscores are not allowed"
        self.checkpoints.append(suffix)
        for name, tree in states.items():
            with open(self._full(self._filename("model", name, suffix)),
                      "wb") as f:
                f.write(flax.serialization.to_bytes(tree))
        for name, tree in (opts or {}).items():
            if tree is None:
                continue
            with open(self._full(self._filename("opt", name, suffix)),
                      "wb") as f:
                f.write(flax.serialization.to_bytes(tree))
        removed = []
        while len(self.checkpoints) > self.max_n:
            sfx = self.checkpoints.pop(0)
            removed.append(sfx)
            for name in states:
                for d in ("model", "opt"):
                    p = self._full(self._filename(d, name, sfx))
                    if os.path.isfile(p):
                        os.remove(p)
        return removed

    def load(self, suffix: Optional[str], templates: Dict[str, Any],
             opt_templates: Optional[Dict[str, Any]] = None):
        """Load pytrees for ``suffix``; returns (found, states, opts)."""
        if suffix is None:
            return False, {}, {}
        states, opts = {}, {}
        for name, tmpl in templates.items():
            p = self._full(self._filename("model", name, suffix))
            if not os.path.isfile(p):
                print("File not found:", p)
                return False, {}, {}
            with open(p, "rb") as f:
                states[name] = flax.serialization.from_bytes(tmpl, f.read())
            if opt_templates and name in opt_templates and \
                    opt_templates[name] is not None:
                po = self._full(self._filename("opt", name, suffix))
                if os.path.isfile(po):
                    with open(po, "rb") as f:
                        opts[name] = flax.serialization.from_bytes(
                            opt_templates[name], f.read())
        if suffix not in self.checkpoints:
            self.checkpoints.insert(0, suffix)
        return True, states, opts


def load_model_variables(checkpoint: "Checkpoint", suffix: Optional[str],
                         variables: Dict[str, Any]):
    """Load the "enc" params and, when present, the "enc_bn" batch
    statistics into a Flax ``variables`` dict.

    Models with live BatchNorm (the 'ae' decoder/GCI family) carry a
    ``batch_stats`` collection that the reference persists inside the
    torch state_dict; here it is a separate ``model_enc_bn_*`` file
    (written by the trainer only when the collection is non-empty).
    Older snapshots without the file load params-only with a notice —
    inference then runs on init statistics, which is wrong for those
    models, so train-era snapshots should be regenerated.

    Returns (found, variables).
    """
    found, states, _ = checkpoint.load(suffix,
                                       {"enc": variables["params"]})
    if not found:
        return False, variables
    variables = dict(variables, params=states["enc"])
    bs = variables.get("batch_stats")
    if bs:
        p_bn = checkpoint._full(
            checkpoint._filename("model", "enc_bn", suffix))
        if os.path.isfile(p_bn):
            with open(p_bn, "rb") as f:
                variables = dict(variables,
                                 batch_stats=flax.serialization.from_bytes(
                                     bs, f.read()))
        else:
            print("NOTE: snapshot has no enc_bn file; this model has "
                  "live BatchNorm and will run on init statistics")
    return True, variables
