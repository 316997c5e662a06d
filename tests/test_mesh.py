"""Mesh construction: DCN-aware multi-slice layout + CPU-mesh behaviour.

The reference has no multi-node story at all (SURVEY.md §2.10: single
process nn.DataParallel, reference train.py:112-113); multi-slice is a
TPU-native extension, so these tests pin down the layout contract."""

import dataclasses

import jax
import numpy as np
import pytest

from wseg_tpu.parallel import make_mesh
from wseg_tpu.parallel.mesh import _device_grid, _slice_major_order


@dataclasses.dataclass(frozen=True)
class FakeDev:
    id: int
    slice_index: int


def _fleet(n_slices, per_slice, interleave=True):
    """Device list as a runtime might hand it out (slice-interleaved)."""
    devs = [FakeDev(id=s * per_slice + i, slice_index=s)
            for s in range(n_slices) for i in range(per_slice)]
    if interleave:
        devs = devs[::2] + devs[1::2]
    return devs


def test_slice_major_order_groups_slices():
    order = _slice_major_order(_fleet(2, 4))
    assert [d.slice_index for d in order] == [0] * 4 + [1] * 4
    assert [d.id for d in order] == list(range(8))


def test_multislice_data_axis_is_slice_major():
    grid = _device_grid(_fleet(2, 4), n_data=8, n_space=1)
    assert grid.shape == (8, 1)
    # first half of the data axis = slice 0, second half = slice 1
    assert [d.slice_index for d in grid[:, 0]] == [0] * 4 + [1] * 4


def test_multislice_space_axis_stays_within_slice():
    grid = _device_grid(_fleet(2, 4), n_data=4, n_space=2)
    assert grid.shape == (4, 2)
    for row in grid:
        assert len({d.slice_index for d in row}) == 1


def test_truncation_cannot_mix_slices():
    # 2 slices of 3; asking for 4 devices would leave slice 1 with a
    # partial group -> refuse rather than silently mix DCN into a row
    with pytest.raises(ValueError, match="unevenly"):
        _device_grid(_fleet(2, 3), n_data=4, n_space=1)


def test_data_axis_must_divide_slices():
    # 3 slices of 2, data axis 2 with space 3: even spread but the data
    # axis cannot be cut into 3 slice-major groups
    with pytest.raises(ValueError, match="data axis"):
        _device_grid(_fleet(3, 2), n_data=2, n_space=3)


def test_cpu_mesh_single_slice_path():
    # CPU devices carry no slice_index -> plain reshape, original order
    mesh = make_mesh(n_data=4, n_space=2, devices=jax.devices()[:8])
    assert mesh.shape == {"data": 4, "space": 2}
    assert list(np.asarray(mesh.devices).reshape(-1)) == jax.devices()[:8]


def test_2d_mesh_train_step_data_x_space():
    """The FULL train step must compile and run with the batch sharded
    over 'data' AND H sharded over 'space' (conv halo exchanges in both
    the forward and backward pass) — the spatial-parallel escape hatch
    for inputs too large for one chip's HBM."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from wseg_tpu.config import cfg
    from wseg_tpu.engine import create_train_state, make_train_step
    from wseg_tpu.engine.train_loop import init_variables
    from wseg_tpu.models import get_model
    from wseg_tpu.parallel import make_optimizer, replicate

    cfg.NET.MODEL = "bsl"
    cfg.NET.BACKBONE = "vgg16"
    cfg.NET.DTYPE = "float32"
    cfg.NET.PAMR_KERNEL = [1, 2]
    cfg.NET.PAMR_ITER = 2
    model = get_model(cfg.NET, num_classes=21)

    rng = jax.random.PRNGKey(0)
    batch = {
        "image": jnp.asarray(
            np.random.RandomState(0).rand(4, 64, 32, 3), np.float32),
        "labels": jnp.ones((4, 20), np.float32),
    }
    variables = init_variables(model, rng, batch)
    tx, _ = make_optimizer(cfg.NET, "vgg16", variables["params"])
    state = create_train_state(model, tx, rng, batch, variables=variables)
    step = make_train_step(model, tx)

    mesh = make_mesh(n_data=4, n_space=2, devices=jax.devices()[:8])
    with mesh:
        state = replicate(mesh, state)
        db = {
            "image": jax.device_put(
                batch["image"], NamedSharding(mesh, P("data", "space"))),
            "labels": jax.device_put(
                batch["labels"], NamedSharding(mesh, P("data"))),
        }
        state, metrics = step(state, db, rng, jnp.asarray(1.0))
        loss = float(metrics["loss"])
    assert np.isfinite(loss), loss


def test_shard_leading_if_divisible_fallback():
    """Divisible leading axes shard over 'data'; indivisible ones fall
    back to an unsharded put instead of raising (ragged validation
    tails, single-image inference batches)."""
    import jax.numpy as jnp

    from wseg_tpu.parallel.mesh import shard_leading_if_divisible

    mesh = make_mesh(n_data=8, devices=jax.devices()[:8])
    ok = shard_leading_if_divisible(mesh, np.zeros((16, 4), np.float32))
    assert len(ok.sharding.device_set) == 8
    ragged = shard_leading_if_divisible(
        mesh, np.zeros((9, 4), np.float32))
    assert np.shape(ragged) == (9, 4)  # no ValueError, data intact
    assert shard_leading_if_divisible(None, np.zeros(3)).shape == (3,)
