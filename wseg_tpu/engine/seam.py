"""SEAM-style equivariance-regularised training step.

Reference train_SEAM.py:85-135: a second forward at 0.5x scale; after
PRETRAIN+5 epochs the second classification loss and an ER loss
``0.01 * mean(|stopgrad(downscaled logits) - logits_at_half_scale|)`` are
added.  (The second mask loss is logged but, as in the reference, not
added to the optimised loss.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from wseg_tpu.engine.train_loop import TrainState
from wseg_tpu.losses import (
    attention_loss,
    get_criterion,
    self_supervision_loss,
)
from wseg_tpu.ops.resize import resize_bilinear


def make_seam_train_step(model, tx, loss_name: str = "SoftMargin",
                         attn_loss_weight: float = 0.0,
                         mask_loss_bce: float = 1.0,
                         scale_factor: float = 0.5,
                         er_weight: float = 0.01):
    """fn(state, batch, rng, mask_loss_on, er_on) -> (state, metrics)."""
    criterion = get_criterion(loss_name)

    def step_fn(state: TrainState, batch, rng, mask_loss_on, er_on):
        rng = jax.random.fold_in(rng, state.step)
        r1, r2, sg1, sg2 = jax.random.split(rng, 4)
        from wseg_tpu.engine.train_loop import _normalise_batch_image
        image, image_raw = _normalise_batch_image(
            batch["image"], batch.get("jitter"))
        labels = batch["labels"]
        h2 = int(image.shape[1] * scale_factor)
        w2 = int(image.shape[2] * scale_factor)
        image2 = resize_bilinear(image, (h2, w2), align_corners=True)
        image2_raw = resize_bilinear(image_raw, (h2, w2),
                                     align_corners=True)

        def loss_fn(params):
            variables = {"params": params}
            mutable = []
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out1, new_state = model.apply(
                variables, image, image_raw, labels, train=True,
                rngs={"dropout": r1, "sg": sg1}, mutable=mutable)
            out2, _ = model.apply(
                variables, image2, image2_raw, labels, train=True,
                rngs={"dropout": r2, "sg": sg2}, mutable=mutable)

            loss_cls = jnp.mean(criterion(out1.cls, labels))
            loss_cls = loss_cls + er_on * jnp.mean(
                criterion(out2.cls, labels))
            loss = loss_cls
            metrics = {"loss_cls": loss_cls,
                       "loss_fg": jnp.mean(out1.cls_fg)}

            if attn_loss_weight > 0 and out1.attn_map is not None:
                l_at = jnp.mean(attention_loss(out1.attn_map))
                loss = loss + attn_loss_weight * l_at
                metrics["loss_at"] = l_at

            # ER loss between half-scale logits and downscaled logits
            lg1 = resize_bilinear(out1.mask_logits,
                                  (out2.mask_logits.shape[1],
                                   out2.mask_logits.shape[2]),
                                  align_corners=True)
            loss_er = er_weight * jnp.mean(jnp.abs(
                jax.lax.stop_gradient(lg1) - out2.mask_logits))
            metrics["loss_er"] = loss_er

            if out1.masks_dec is not None:
                l_mask, _ = self_supervision_loss(
                    out1.mask_logits, out1.masks_dec, labels)
                l_mask = jnp.mean(l_mask)
                loss = loss + mask_loss_on * mask_loss_bce * l_mask
                loss = loss + er_on * loss_er
                # Reference train_SEAM.py:124-126: the second forward's
                # mask loss is folded into the LOGGED loss_mask once the
                # ER phase starts, but never into the optimised loss.
                l_mask2, _ = self_supervision_loss(
                    out2.mask_logits, out2.masks_dec, labels)
                metrics["loss_mask"] = l_mask + er_on * jnp.mean(l_mask2)

            metrics["loss"] = loss
            return loss, (metrics, new_state.get("batch_stats",
                                                 state.batch_stats))

        grads, (metrics, new_bs) = jax.grad(loss_fn, has_aux=True)(
            state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_bs, opt_state=new_opt), metrics

    return jax.jit(step_fn, donate_argnums=(0,))
