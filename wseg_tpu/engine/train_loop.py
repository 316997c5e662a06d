"""Functional training/eval steps, pjit-sharded over the data mesh.

Replaces the reference's DecTrainer.step (train.py:115-171): one jitted
function computes the forward, all losses, gradients, and the optimizer
update; under a multi-device mesh the batch is sharded over ``data`` and
XLA all-reduces gradients over ICI automatically.

Loss composition (reference train.py:126-152):
  loss = mean(criterion_cls(cls, labels))
       + [20 * mean(loss_at)            if --isattention]
       + [MASK_LOSS_BCE * mean(loss_mask) if epoch >= TRAIN.PRETRAIN]
The pretrain gate arrives as a traced scalar weight so epochs don't
recompile.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from wseg_tpu.losses import (
    attention_loss,
    get_criterion,
    self_supervision_loss,
)
from wseg_tpu.models.backbones.common import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    denormalize_image,
)
from wseg_tpu.models.stage_net import StageNet


def _normalise_batch_image(image, jitter=None):
    """(normalised, raw [0,1]) from either transfer dtype.

    uint8 batches (the loader default) normalise ON DEVICE — shipping
    u8 quarters the host->device upload, which dominates the step time
    on remote-attached chips; f32 batches arrive pre-normalised (the
    reference contract) and are denormalised for the PAMR raw stream.
    ``jitter``: optional (B, 9) colour-jitter params, applied on device
    before normalisation (ops/jitter.py; DATASET.DEVICE_JITTER).
    """
    if image.dtype == jnp.uint8:
        x = image.astype(jnp.float32)
        if jitter is not None:
            from wseg_tpu.ops.jitter import apply_colour_jitter
            x = apply_colour_jitter(x, jitter)
        raw = x / 255.0
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        return (raw - mean) / std, raw
    return image, denormalize_image(image)


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def init_variables(model: StageNet, rng, sample_batch):
    """Jitted model.init — eager init dispatches thousands of tiny ops,
    which is pathological on remote-relay TPU backends."""
    def init_fn(r, image, labels):
        rngs = {"params": r, "dropout": r, "sg": r}
        img, raw = _normalise_batch_image(image)
        return model.init(rngs, img, raw, labels, train=True)
    return jax.jit(init_fn)(rng, sample_batch["image"],
                            sample_batch["labels"])


def init_test_variables(model: StageNet, rng, input_shape):
    """Jitted test-mode init (for inference/CAM entry points)."""
    def init_fn(r, x):
        return model.init({"params": r, "dropout": r, "sg": r}, x,
                          train=False)
    return jax.jit(init_fn)(rng, jnp.zeros(input_shape, jnp.float32))


def create_train_state(model: StageNet, tx, rng, sample_batch,
                       variables=None) -> TrainState:
    """Initialise params/batch_stats and the optimizer state."""
    if variables is None:
        variables = init_variables(model, rng, sample_batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats,
                      opt_state=jax.jit(tx.init)(params))


def make_train_step(model: StageNet, tx, loss_name: str = "SoftMargin",
                    attn_loss_weight: float = 0.0,
                    mask_loss_bce: float = 1.0):
    """Build the jitted train step.

    Returns fn(state, batch, rng, mask_loss_on: scalar) ->
    (state, metrics dict).  ``batch`` = {image (B,H,W,3) normalised,
    labels (B,C-1)}.
    """
    criterion = get_criterion(loss_name)

    def step_fn(state: TrainState, batch, rng, mask_loss_on):
        rng = jax.random.fold_in(rng, state.step)
        drop_rng, sg_rng = jax.random.split(rng)
        image, image_raw = _normalise_batch_image(
            batch["image"], batch.get("jitter"))
        labels = batch["labels"]

        def loss_fn(params):
            variables = {"params": params}
            mutable = []
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out, new_state = model.apply(
                variables, image, image_raw, labels, train=True,
                rngs={"dropout": drop_rng, "sg": sg_rng}, mutable=mutable)

            loss_cls = jnp.mean(criterion(out.cls, labels))
            loss = loss_cls
            metrics = {"loss_cls": loss_cls,
                       "loss_fg": jnp.mean(out.cls_fg)}

            if attn_loss_weight > 0 and out.attn_map is not None:
                l_at = jnp.mean(attention_loss(out.attn_map))
                loss = loss + attn_loss_weight * l_at
                metrics["loss_at"] = l_at

            if out.masks_dec is not None:
                l_mask, _ = self_supervision_loss(
                    out.mask_logits, out.masks_dec, labels)
                l_mask = jnp.mean(l_mask)
                loss = loss + mask_loss_on * mask_loss_bce * l_mask
                metrics["loss_mask"] = l_mask

            metrics["loss"] = loss
            return loss, (metrics, new_state.get("batch_stats",
                                                 state.batch_stats))

        grads, (metrics, new_bs) = jax.grad(loss_fn, has_aux=True)(
            state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_eval_step(model: StageNet, loss_name: str = "SoftMargin",
                   attn_loss_weight: float = 0.0,
                   mask_loss_bce: float = 1.0):
    """Validation step: same losses, no gradient, dropout/SG deterministic.

    Returns fn(state, batch) -> (metrics, cls_scores).
    """
    criterion = get_criterion(loss_name)

    def step_fn(state: TrainState, batch):
        image, image_raw = _normalise_batch_image(batch["image"])
        labels = batch["labels"]
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        out = model.apply(variables, image, image_raw, labels, train=False)

        loss_cls = jnp.mean(criterion(out.cls, labels))
        loss = loss_cls
        metrics = {"loss_cls": loss_cls, "loss_fg": jnp.mean(out.cls_fg)}
        if attn_loss_weight > 0 and out.attn_map is not None:
            l_at = jnp.mean(attention_loss(out.attn_map))
            loss = loss + attn_loss_weight * l_at
            metrics["loss_at"] = l_at
        if out.masks_dec is not None:
            l_mask, _ = self_supervision_loss(out.mask_logits,
                                              out.masks_dec, labels)
            l_mask = jnp.mean(l_mask)
            loss = loss + mask_loss_bce * l_mask
            metrics["loss_mask"] = l_mask
        metrics["loss"] = loss
        return metrics, out.cls

    return jax.jit(step_fn)


def make_vis_step(model: StageNet):
    """Forward returning the mask tensors for visualisation:
    fn(state, batch) -> dict(cam, dec?, pseudo?) (all NHWC float32)."""
    from wseg_tpu.ops.pseudo_mask import pseudo_gtmask

    def step_fn(state: TrainState, batch):
        image = batch["image"]
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        img, raw = _normalise_batch_image(image)
        out = model.apply(variables, img, raw,
                          batch["labels"], train=False)
        vis = {"cam": out.masks}
        if out.masks_dec is not None:
            vis["dec"] = out.masks_dec
            vis["pseudo"] = pseudo_gtmask(out.masks_dec)
        return vis

    return jax.jit(step_fn)


def make_infer_fn(model: StageNet, device_norm: bool = False):
    """Test-mode forward: fn(variables, image) -> (cls, masks).

    ``device_norm``: takes uint8 views + per-view pad windows (B, 4)
    (pt, pl, h, w), normalises with ImageNet stats on device, and zeroes
    the padded region — byte-exact with the host pipeline (the host views
    are PIL-resized uint8 normalised then zero-padded,
    data/multiscale.py) at 1/4 the host->device bytes.
    """
    if not device_norm:
        @jax.jit
        def infer(variables, image):
            out = model.apply(variables, image, train=False)
            return out.cls, out.masks
        return infer

    from wseg_tpu.data.pascal_voc import MEAN, STD
    mean = jnp.asarray(MEAN, jnp.float32)
    std = jnp.asarray(STD, jnp.float32)

    @jax.jit
    def infer_u8(variables, image_u8, windows):
        b, h, w, _ = image_u8.shape
        x = (image_u8.astype(jnp.float32) / 255.0 - mean) / std
        ri = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 1)
        ci = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 2)
        win = windows.astype(jnp.int32)
        pt = win[:, 0][:, None, None, None]
        pl = win[:, 1][:, None, None, None]
        vh = win[:, 2][:, None, None, None]
        vw = win[:, 3][:, None, None, None]
        inside = (ri >= pt) & (ri < pt + vh) & (ci >= pl) & (ci < pl + vw)
        x = jnp.where(inside, x, 0.0)
        out = model.apply(variables, x, train=False)
        return out.cls, out.masks
    return infer_u8
