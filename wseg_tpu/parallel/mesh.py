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

Multi-slice: when the device set spans several TPU slices (each device
carries a ``slice_index``), the ``data`` axis is laid out slice-major so
its gradient all-reduce decomposes hierarchically — reduce-scatter over
ICI within each slice, then the (much smaller) cross-slice hop over DCN.
The ``space`` axis (convolution halo exchanges every layer) is always
kept within a slice.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _slice_major_order(devices):
    """Sort devices so same-slice devices are contiguous (DCN-aware).

    Devices without a slice index (CPU meshes, single-slice) sort as one
    group, preserving the original single-slice behaviour.
    """
    def key(d):
        s = getattr(d, "slice_index", None)
        return (s if s is not None else 0, d.id)
    return sorted(devices, key=key)


def _device_grid(devices, n_data: int, n_space: int):
    """(data, space) device array, slice-major along ``data``.

    Single-slice: plain reshape.  Multi-slice: the data axis iterates
    slices slowest — (data_dcn, data_ici, space) collapsed to (data,
    space) — so contiguous data shards share a slice and XLA's gradient
    all-reduce goes ICI-first with one DCN hop at the top.
    """
    devices = _slice_major_order(devices)[: n_data * n_space]
    counts = {}
    for d in devices:
        s = getattr(d, "slice_index", None)
        counts[s] = counts.get(s, 0) + 1
    n_slices = len(counts)
    if n_slices > 1:
        if len(set(counts.values())) != 1:
            raise ValueError(
                f"selected devices spread unevenly over slices "
                f"({counts}); pick n_data*n_space a multiple of the "
                f"slice size")
        if n_data % n_slices:
            raise ValueError(
                f"data axis ({n_data}) must divide evenly over "
                f"{n_slices} slices")
        # per_slice = (n_data/n_slices)*n_space, so each (data, :) row
        # sits inside one slice by construction — the space axis (conv
        # halo exchanges every layer) never crosses DCN.
        return np.asarray(devices, dtype=object).reshape(
            n_slices, n_data // n_slices, n_space).reshape(n_data, n_space)
    return np.asarray(devices, dtype=object).reshape(n_data, n_space)


def make_mesh(n_data: int | None = None, n_space: int = 1,
              devices=None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_space
    return Mesh(_device_grid(devices, n_data, n_space), ("data", "space"))


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


def shard_leading_if_divisible(mesh, x):
    """Shard one array's leading axis over ``data`` when it divides the
    axis size; otherwise return it untouched (single-device inference
    batches can be ragged — used by the serving/inference engines,
    where ``mesh`` may also be None)."""
    import numpy as np

    if mesh is None:
        return x
    n_data = int(mesh.shape["data"])
    if int(np.shape(x)[0]) % n_data:
        return x
    import jax.numpy as jnp
    spec = P("data", *([None] * (np.ndim(x) - 1)))
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))


def batch_sharding(mesh: Mesh):
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh):
    return NamedSharding(mesh, P())
