"""Train-step tests: loss decreases, LR groups labelled right, and the
step runs sharded over an 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import flax

from wseg_tpu.config import cfg
from wseg_tpu.engine import create_train_state, make_eval_step, \
    make_train_step
from wseg_tpu.models import get_model
from wseg_tpu.models.backbones.common import (
    FROZEN, NEW_B, NEW_W, PRE_B, PRE_W,
)
from wseg_tpu.parallel import make_mesh, make_optimizer, shard_batch, \
    replicate


def _setup(model_name="ae", backbone="resnet50", batch=2, hw=48):
    cfg.NET.MODEL = model_name
    cfg.NET.BACKBONE = backbone
    cfg.NET.DTYPE = "float32"
    cfg.NET.PAMR_KERNEL = [1, 2]
    cfg.NET.PAMR_ITER = 2
    model = get_model(cfg.NET, num_classes=21)
    rng = np.random.RandomState(0)
    batch_d = {
        "image": jnp.asarray(rng.randn(batch, hw, hw, 3), jnp.float32),
        "labels": jnp.asarray((rng.rand(batch, 20) > 0.7), jnp.float32),
    }
    return model, batch_d


def test_param_labels():
    model, batch = _setup()
    state_rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": state_rng, "dropout": state_rng, "sg": state_rng},
        batch["image"], batch["image"], batch["labels"], train=True)
    tx, labels = make_optimizer(cfg.NET, "resnet50", variables["params"])
    flat = flax.traverse_util.flatten_dict(labels)
    vals = set(flat.values())
    assert vals <= {FROZEN, PRE_W, PRE_B, NEW_W, NEW_B}
    # stem and frozen BN are frozen
    assert flat[("backbone", "conv1", "kernel")] == FROZEN
    assert flat[("backbone", "bn1", "scale")] == FROZEN
    assert flat[("backbone", "layer1_0", "bn1", "scale")] == FROZEN
    # backbone convs are pretrained-weight
    assert flat[("backbone", "layer1_0", "conv1", "kernel")] == PRE_W
    # decoder params are scratch
    assert flat[("decoder", "last_conv3", "kernel")] == NEW_W
    assert flat[("decoder", "last_conv3", "bias")] == NEW_B


def test_train_step_runs_and_updates():
    model, batch = _setup()
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng, "sg": rng},
        batch["image"], batch["image"], batch["labels"], train=True)
    tx, _ = make_optimizer(cfg.NET, "resnet50", variables["params"])
    state = create_train_state(model, tx, rng, batch)
    step = make_train_step(model, tx)

    # materialise before the step: donate_argnums deletes the old buffers
    p0 = np.asarray(state.params["decoder"]["last_conv3"]["kernel"])
    frozen0 = np.asarray(state.params["backbone"]["conv1"]["kernel"])
    state, metrics = step(state, batch, rng, jnp.asarray(0.0))
    assert np.isfinite(float(metrics["loss"]))
    # scratch layer moved, frozen stem did not
    assert not np.allclose(
        np.asarray(state.params["decoder"]["last_conv3"]["kernel"]),
        np.asarray(p0))
    np.testing.assert_array_equal(
        np.asarray(state.params["backbone"]["conv1"]["kernel"]),
        np.asarray(frozen0))


def test_loss_decreases_on_fixed_batch():
    # vgg16 backbone: at random init the frozen-BN resnets produce huge
    # activations (the reference always starts from pretrained weights),
    # which makes an optimisation smoke test meaningless there
    model, batch = _setup(model_name="bsl", backbone="vgg16", hw=32)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng, "sg": rng},
        batch["image"], batch["image"], batch["labels"], train=True)
    cfg.NET.LR = 1e-4
    tx, _ = make_optimizer(cfg.NET, "vgg16", variables["params"])
    state = create_train_state(model, tx, rng, batch)
    step = make_train_step(model, tx)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch, rng, jnp.asarray(0.0))
        losses.append(float(metrics["loss_cls"]))
    assert losses[-1] < losses[0], losses


def test_train_step_on_8_device_mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    model, batch = _setup(batch=8)
    mesh = make_mesh(n_data=8)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng, "sg": rng},
        batch["image"], batch["image"], batch["labels"], train=True)
    tx, _ = make_optimizer(cfg.NET, "resnet50", variables["params"])
    state = create_train_state(model, tx, rng, batch)
    step = make_train_step(model, tx)

    with mesh:
        state_r = replicate(mesh, state)
        batch_s = shard_batch(mesh, batch)
        state_r, metrics = step(state_r, batch_s, rng, jnp.asarray(1.0))
        assert np.isfinite(float(metrics["loss"]))
        # gradient all-reduce keeps params replicated: value on any shard
        # equals the single-device result's dtype/shape
        k = state_r.params["decoder"]["last_conv3"]["kernel"]
        assert k.shape[-1] == 20


def test_eval_step():
    model, batch = _setup()
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng, "sg": rng},
        batch["image"], batch["image"], batch["labels"], train=True)
    tx, _ = make_optimizer(cfg.NET, "resnet50", variables["params"])
    state = create_train_state(model, tx, rng, batch)
    eval_step = make_eval_step(model)
    metrics, cls = eval_step(state, batch)
    assert cls.shape == (2, 20)
    assert np.isfinite(float(metrics["loss"]))


def test_pretrain_gating_changes_loss():
    """mask_on=0 (pretrain) excludes the mask loss from the total."""
    model, batch = _setup(model_name="ae", backbone="vgg16", hw=48)
    rng = jax.random.PRNGKey(0)
    from wseg_tpu.engine.train_loop import init_variables
    variables = init_variables(model, rng, batch)
    tx, _ = make_optimizer(cfg.NET, "vgg16", variables["params"])
    state = create_train_state(model, tx, rng, batch, variables=variables)
    step = make_train_step(model, tx)

    s1, m_off = step(state, batch, rng, jnp.asarray(0.0))
    state2 = create_train_state(model, tx, rng, batch,
                                variables=init_variables(model, rng,
                                                         batch))
    s2, m_on = step(state2, batch, rng, jnp.asarray(1.0))
    # identical forward (same rng/step counter) so loss_cls matches but
    # the gated total differs by the mask loss
    np.testing.assert_allclose(float(m_off["loss_cls"]),
                               float(m_on["loss_cls"]), rtol=1e-5)
    assert abs(float(m_on["loss"]) - float(m_off["loss"])
               - float(m_on["loss_mask"])) < 1e-5


def test_scratch_init_stabilisation_keeps_training_finite():
    """From-scratch flagship training NaN'd within a few steps (frozen
    identity BN + random WRN38 -> |logits| ~4e2, grad l2 ~5e4);
    stabilize_scratch_init (SkipInit) must keep losses finite at the
    reference LR, and leave pretrained-style params untouched for other
    backbones."""
    from wseg_tpu.models.backbones.common import stabilize_scratch_init

    model, batch = _setup(model_name="CAM_CASA_WGAP_tf",
                          backbone="resnet38", hw=64)
    rng = jax.random.PRNGKey(0)
    from wseg_tpu.engine.train_loop import init_variables
    variables = init_variables(model, rng, batch)
    params = stabilize_scratch_init(variables["params"], "resnet38")
    # residual-branch-final kernels are zero, everything else untouched
    flat = flax.traverse_util.flatten_dict(params)
    zeroed = [k for k, v in flat.items()
              if k[-1] == "kernel" and float(jnp.abs(v).max()) == 0.0]
    assert any("conv_branch2b1" in k for k in zeroed)
    assert any("conv_branch2b2" in k for k in zeroed)
    # bot blocks keep their 2b1 (only the true last conv is zeroed)
    assert any(k[-2] == "conv_branch2b1" and float(jnp.abs(v).max()) > 0
               for k, v in flat.items() if k[-1] == "kernel")

    variables = dict(variables)
    variables["params"] = params
    tx, _ = make_optimizer(cfg.NET, "resnet38", params)
    state = create_train_state(model, tx, rng, batch,
                               variables=variables)
    step = make_train_step(model, tx)
    for i in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(i),
                              jnp.asarray(0.0))
        assert np.isfinite(float(metrics["loss"])), (i, metrics)
    assert float(metrics["loss_cls"]) < 20.0


def test_grad_clip_knob():
    """NET.GRAD_CLIP chains a global-norm clip in front of the
    4-group optimizer (off by default)."""
    model, batch = _setup(backbone="vgg16", hw=48)
    rng = jax.random.PRNGKey(0)
    from wseg_tpu.engine.train_loop import init_variables
    variables = init_variables(model, rng, batch)
    cfg.NET.GRAD_CLIP = 1.0
    try:
        tx, _ = make_optimizer(cfg.NET, "vgg16", variables["params"])
        state = create_train_state(model, tx, rng, batch,
                                   variables=variables)
        step = make_train_step(model, tx)
        state, metrics = step(state, batch, rng, jnp.asarray(0.0))
        assert np.isfinite(float(metrics["loss"]))
    finally:
        cfg.NET.GRAD_CLIP = 0.0


def test_trainer_device_batch_forwards_jitter():
    """DATASET.DEVICE_JITTER (the default) makes the loader emit (B, 9)
    jitter params that the train step applies ON DEVICE
    (train_loop.py _normalise_batch_image); the trainer's device-put
    must forward them — dropping the key silently disables colour
    augmentation for the whole run."""
    from types import SimpleNamespace

    from wseg_tpu.engine.trainer import DecTrainer

    batch = {"image": np.zeros((2, 8, 8, 3), np.uint8),
             "labels": np.zeros((2, 20), np.float32),
             "jitter": np.zeros((2, 9), np.float32),
             "score": np.zeros((2, 8, 8), np.float32)}
    db = DecTrainer._device_batch(SimpleNamespace(mesh=None), batch)
    # jitter forwarded; the unused scoremap stream is NOT transferred
    assert set(db) == {"image", "labels", "jitter"}
    db2 = DecTrainer._device_batch(
        SimpleNamespace(mesh=None),
        {k: batch[k] for k in ("image", "labels")})
    assert set(db2) == {"image", "labels"}
