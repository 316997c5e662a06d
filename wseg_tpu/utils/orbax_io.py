"""Orbax checkpoint backend (async-capable, multi-host safe).

The default checkpoint store (utils/checkpoints.py) is single-host
msgpack with the reference's file naming.  This backend keeps the same
suffix semantics (``eNNNXsS.SSS`` directories, keep-best-N) on top of
orbax.checkpoint, for multi-host meshes where every process must
participate in the save.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional


class OrbaxCheckpoint:
    def __init__(self, path: str, max_n: int = 3):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self.path = os.path.abspath(path)
        self.max_n = max_n
        self.checkpoints = []
        os.makedirs(self.path, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _dir(self, suffix: str) -> str:
        return os.path.join(self.path, suffix)

    def add_checkpoints(self):
        """Adopt on-disk snapshots (newest max_n by mtime)."""
        found = []
        for d in os.listdir(self.path):
            full = os.path.join(self.path, d)
            if os.path.isdir(full):
                found.append((d, os.path.getmtime(full)))
        found.sort(key=lambda kv: kv[1])
        self.checkpoints = [d for d, _ in found[-self.max_n:]]

    def checkpoint(self, suffix: str, states: Dict[str, Any],
                   opts: Optional[Dict[str, Any]] = None):
        assert "_" not in suffix, "Underscores are not allowed"
        payload = {"models": states}
        if opts:
            payload["opts"] = {k: v for k, v in opts.items()
                               if v is not None}
        target = self._dir(suffix)
        if os.path.exists(target):
            shutil.rmtree(target)
        self._ckptr.save(target, payload)
        self._ckptr.wait_until_finished()
        self.checkpoints.append(suffix)
        removed = []
        while len(self.checkpoints) > self.max_n:
            old = self.checkpoints.pop(0)
            removed.append(old)
            od = self._dir(old)
            if os.path.isdir(od):
                shutil.rmtree(od)
        return removed

    def load(self, suffix: Optional[str], templates: Dict[str, Any],
             opt_templates: Optional[Dict[str, Any]] = None):
        if suffix is None:
            return False, {}, {}
        target = self._dir(suffix)
        if not os.path.isdir(target):
            print("Checkpoint not found:", target)
            return False, {}, {}
        tmpl = {"models": templates}
        if opt_templates:
            tmpl["opts"] = {k: v for k, v in opt_templates.items()
                            if v is not None}
        restored = self._ckptr.restore(target, tmpl)
        states = restored["models"]
        opts = restored.get("opts", {})
        if suffix not in self.checkpoints:
            self.checkpoints.insert(0, suffix)
        return True, states, opts
