"""Device mesh + sharding helpers.

The reference's only parallelism is single-process nn.DataParallel over
GPUs (reference train.py:112-113).  The TPU-native equivalent: a
``jax.sharding.Mesh`` whose ``data`` axis shards the batch; parameters are
replicated and gradient averaging happens inside XLA as an ICI all-reduce
(no explicit collective code — SURVEY.md §2.10).

A second ``space`` axis is available for sharding large-image inference
over H (XLA inserts halo exchanges for the convolutions automatically);
mesh construction keeps it size-1 by default so the same code runs
single-chip.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_space: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_space
    dev = np.asarray(devices[: n_data * n_space]).reshape(n_data, n_space)
    return Mesh(dev, ("data", "space"))


def shard_batch(mesh: Mesh, tree):
    """Place a host batch with batch-axis sharded over ``data``."""
    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params/opt state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh):
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh):
    return NamedSharding(mesh, P())
