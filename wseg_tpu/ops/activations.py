"""ReLU with a guided-backprop mode.

Guided backpropagation (reference pytorch_grad_cam/guided_backprop.py:7-100)
replaces the ReLU VJP so only positive gradients flow through positive
activations.  The reference monkey-patches torch autograd; here every model
relu routes through :func:`relu`, which dispatches at trace time on a
module flag — tracing inside :func:`guided_mode` builds the guided graph.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp

_GUIDED = False


@jax.custom_vjp
def _guided_relu(x):
    return jnp.maximum(x, 0)


def _guided_relu_fwd(x):
    return jnp.maximum(x, 0), x


def _guided_relu_bwd(x, g):
    return (jnp.where((x > 0) & (g > 0), g, jnp.zeros_like(g)),)


_guided_relu.defvjp(_guided_relu_fwd, _guided_relu_bwd)


def relu(x):
    """Standard relu, or guided relu inside :func:`guided_mode`."""
    if _GUIDED:
        return _guided_relu(x)
    return jax.nn.relu(x)


@contextmanager
def guided_mode():
    """Trace model code under this to get guided-backprop gradients."""
    global _GUIDED
    prev = _GUIDED
    _GUIDED = True
    try:
        yield
    finally:
        _GUIDED = prev
