"""FullGrad: complete input + per-layer bias gradient attribution.

Reference pytorch_grad_cam/fullgrad_cam.py:10-106 hooks every layer with a
bias (convs, BNs) and aggregates psi(bias * dY/d(layer output)) with the
input-gradient term, where psi = abs + per-map min-max scaling.

Functional JAX version: instead of hooks, ``flax.linen.intercept_methods``
adds a zero "perturbation" to every bias-layer output; ``jax.grad`` w.r.t.
those perturbations yields exactly the per-position layer-output gradients.
Bias layers here: FrozenBatchNorm (constant-affine backbone BNs — the
dominant bias carriers in this model family) and biased convs.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from wseg_tpu.models.backbones.common import FrozenBatchNorm
from wseg_tpu.ops.resize import resize_bilinear


def _is_bias_site(module) -> bool:
    if isinstance(module, FrozenBatchNorm):
        return True
    if isinstance(module, nn.Conv) and module.use_bias:
        return True
    return False


def _site_bias(module, variables_path) -> jnp.ndarray:
    """Per-channel effective bias of the site (FrozenBN: the beta param)."""
    return variables_path["bias"]


def _scale_map(x):
    """psi: abs -> min-max to [0,1] per map (fullgrad postprocessing)."""
    x = jnp.abs(x)
    mn = jnp.min(x, axis=(1, 2), keepdims=True)
    mx = jnp.max(x, axis=(1, 2), keepdims=True)
    return (x - mn) / (1e-7 + mx - mn)


class FullGrad:
    uses_gradients = True

    def __init__(self, model, variables, tap: str = "conv6"):
        self.model = model
        self.variables = variables

        # variables as an explicit jit argument (closure-captured params
        # would be embedded in the HLO; see cam_methods.BaseCAM).  One
        # persistent jitted fn: retraces only on new image/site shapes.
        def score(variables, img, perturbs, target):
            def interceptor(next_fun, args, kwargs, context):
                out = next_fun(*args, **kwargs)
                p = context.module.path if context.module else None
                if context.method_name == "__call__" and p in perturbs:
                    out = out + perturbs[p].astype(out.dtype)
                return out

            with nn.intercept_methods(interceptor):
                out = self.model.apply(variables, img, train=False)
            return jnp.sum(out.cls[:, target])

        self._grad_fn = jax.jit(jax.grad(score, argnums=(1, 2)))

    def _discover_sites(self, image) -> Dict[Tuple[str, ...], Tuple]:
        """One traced pass recording (shape, bias) of every bias site."""
        sites: Dict[Tuple[str, ...], Tuple] = {}

        def interceptor(next_fun, args, kwargs, context):
            out = next_fun(*args, **kwargs)
            if context.method_name == "__call__" and \
                    _is_bias_site(context.module) and \
                    isinstance(out, jnp.ndarray) and out.ndim == 4:
                path = context.module.path
                # bias param lives in variables under the module path
                node = self.variables["params"]
                ok = True
                for p in path:
                    if p in node:
                        node = node[p]
                    else:
                        ok = False
                        break
                if ok and "bias" in node:
                    sites[path] = (out.shape, np.asarray(node["bias"]))
            return out

        def run(img):
            with nn.intercept_methods(interceptor):
                return self.model.apply(self.variables, img, train=False)

        jax.eval_shape(run, image)
        return sites

    def __call__(self, image, target_category: int,
                 eigen_smooth: bool = False) -> np.ndarray:
        image = jnp.asarray(image)
        t = int(target_category)
        sites = self._discover_sites(image)
        zeros = {p: jnp.zeros(shape, jnp.float32)
                 for p, (shape, _) in sites.items()}

        g_img, g_sites = self._grad_fn(self.variables, image, zeros,
                                       jnp.asarray(t))

        H, W = image.shape[1], image.shape[2]
        cam = jnp.sum(_scale_map(g_img.astype(jnp.float32)
                                 * image.astype(jnp.float32)), axis=-1)
        for p, g in g_sites.items():
            bias = jnp.asarray(sites[p][1], jnp.float32)
            m = _scale_map(g.astype(jnp.float32) * bias)  # (B,h,w,C)
            m = jnp.sum(m, axis=-1, keepdims=True)
            cam = cam + resize_bilinear(m, (H, W),
                                        align_corners=False)[..., 0]
        mn = jnp.min(cam, axis=(1, 2), keepdims=True)
        mx = jnp.max(cam, axis=(1, 2), keepdims=True)
        return np.asarray((cam - mn) / (1e-7 + mx - mn))
