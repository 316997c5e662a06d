"""LR schedules: cos / poly / step with warmup.

Reference utils/lr_scheduler.py:13-70 keeps an (unused-by-default)
scheduler; here it is an optax-compatible schedule factory so it can be
plugged into the 4-group optimizer when experiments need it (the reference
training recipe itself is constant-LR with per-group multipliers).
"""

from __future__ import annotations

import math

import optax


def make_schedule(mode: str, base_lr: float, num_epochs: int,
                  iters_per_epoch: int, lr_step: int = 0,
                  warmup_epochs: int = 0):
    """Returns an optax schedule: step -> lr."""
    total = max(1, num_epochs * iters_per_epoch)
    warmup = warmup_epochs * iters_per_epoch

    def schedule(step):
        import jax.numpy as jnp
        t = jnp.asarray(step, jnp.float32)
        if mode == "cos":
            lr = 0.5 * base_lr * (1.0 + jnp.cos(
                math.pi * jnp.minimum(t / total, 1.0)))
        elif mode == "poly":
            lr = base_lr * jnp.power(
                jnp.maximum(1.0 - t / total, 0.0), 0.9)
        elif mode == "step":
            epoch = t / iters_per_epoch
            lr = base_lr * jnp.power(
                0.1, jnp.floor(epoch / max(1, lr_step)))
        else:
            raise NotImplementedError(mode)
        if warmup > 0:
            lr = jnp.where(t < warmup, base_lr * t / warmup, lr)
        return lr

    return schedule


def scale_by_schedule_like_sgd(schedule, momentum: float = 0.9,
                               weight_decay: float = 0.0):
    """SGD chain using a schedule instead of a fixed LR."""
    tx = []
    if weight_decay > 0:
        tx.append(optax.add_decayed_weights(weight_decay))
    if momentum > 0:
        tx.append(optax.trace(decay=momentum))
    tx.append(optax.scale_by_schedule(lambda s: -schedule(s)))
    return optax.chain(*tx)
