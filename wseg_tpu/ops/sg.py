"""Stochastic Gate: stochastic deep/shallow feature mixing.

Reference models/mods/sg.py:6-43.  Train mode draws a per-element Bernoulli
mask selecting the (bias-corrected) deep branch vs the shallow branch; eval
mode is the deterministic convex blend.

Torch detail reproduced exactly: the reference builds its gate as
``(1 - psi) * F.dropout(ones, psi)``.  Inverted dropout scales kept units by
1/(1-psi), so the gate's "on" value is exactly 1 and it is 0 with
probability psi.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stochastic_gate(x1, x2, psi: float = 0.3, *, train: bool,
                    rng: jax.Array | None = None):
    """Merge deep features ``x1`` with shallow features ``x2``.

    Train:  gate ~ Bernoulli(1-psi); out = gate * (x1 - psi*x2)/(1-psi)
            + (1-gate) * x2  (E[out] = x1)
    Eval:   out = (1-psi) * x1 + psi * x2
    """
    if not train:
        return (1.0 - psi) * x1 + psi * x2
    assert rng is not None, "stochastic_gate needs an rng in train mode"
    gate = jax.random.bernoulli(rng, p=1.0 - psi, shape=x1.shape)
    gate = gate.astype(x1.dtype)
    x1_corr = (x1 - psi * x2) / max(1e-8, 1.0 - psi)
    return gate * x1_corr + (1.0 - gate) * x2
