"""Class-activation-map toolbox, functional JAX edition.

Replaces the reference's vendored pytorch_grad_cam package
(pytorch_grad_cam/base_cam.py:9-216 and per-method files).  No hooks: the
model exposes ``backbone_taps`` (activations) and accepts a ``taps``
override, so gradients w.r.t. the target activations are a plain
``jax.grad`` through the head.  Target layer = the backbone output
('conv6'), matching the reference's ``target_layers=[model.cls_branch[-1]]``
usage in infer_cam.py:104.

Every method maps (activations A (B,h,w,K), grads dY/dA) -> weights, then
CAM = scale(relu(sum_k w_k A_k)) resized to the input.  ScoreCAM and
AblationCAM are gradient-free re-scoring methods expressed as batched
forwards.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wseg_tpu.ops.resize import resize_bilinear


def _scale_cam(cam):
    """Min-max normalise each map to [0, 1] (base_cam.py scale_cam_image)."""
    mn = jnp.min(cam, axis=(1, 2), keepdims=True)
    cam = cam - mn
    mx = jnp.max(cam, axis=(1, 2), keepdims=True)
    return cam / (1e-7 + mx)


class BaseCAM:
    """CAM engine over a StageNet.

    Args:
      model: StageNet.
      variables: model variables.
      tap: which backbone tap to treat as the target layer.
    """

    uses_gradients = True

    def __init__(self, model, variables, tap="conv6"):
        if (getattr(self, "uses_gradients", True)
                and str(getattr(model, "backbone_dtype", "")
                        ).startswith("int8")):
            # round() in the quantized convs has zero gradient — every
            # GRADIENT-based CAM would silently return zeros (the
            # forward-only engines — Score/Ablation/Eigen — work fine
            # in int8 and benefit most from its speed)
            raise ValueError(
                "gradient-based CAM engines need a differentiable "
                "model; NET.DTYPE 'int8' is inference-only — use "
                "'bfloat16' for this method")
        self.model = model
        self.variables = variables
        # one tap or several: multiple target layers are aggregated as
        # the mean of the per-layer scaled CAMs (reference
        # base_cam.py:129-137 aggregate_multi_layers)
        self.taps = (tap,) if isinstance(tap, str) else tuple(tap)
        self.tap = self.taps[0]

        # variables are an explicit jit argument everywhere: closure-
        # captured params would be serialised into the HLO as constants
        # (hundreds of MB for WRN38), which remote-compile backends reject
        def taps_fn(variables, image):
            return model.apply(variables, image, method="backbone_taps")

        def head_cls(variables, tap_value, taps, image, tap):
            out = model.apply(variables, image,
                              taps={**taps, tap: tap_value},
                              train=False)
            return out.cls

        self._taps_jit = jax.jit(taps_fn)
        self._taps_fn = lambda image: self._taps_jit(self.variables, image)
        self._head_cls = head_cls

        def acts_grads(variables, image, target, tap):
            taps = taps_fn(variables, image)
            acts = taps[tap]

            def score(tap_value):
                cls = head_cls(variables, tap_value, taps, image, tap)
                return jnp.sum(cls[:, target]), cls

            (_, cls), grads = jax.value_and_grad(score, has_aux=True)(acts)
            return acts, grads, cls, taps

        self._acts_grads_jit = jax.jit(acts_grads,
                                       static_argnames=("tap",))

    # ---- per-method weighting rule
    def get_cam_weights(self, acts, grads, cls, target):
        raise NotImplementedError

    def _acts_grads(self, image, target: int, tap: Optional[str] = None):
        return self._acts_grads_jit(self.variables, image,
                                    jnp.asarray(target),
                                    tap=tap or self.tap)

    def _cam_one_tap(self, image, target: int, tap: str,
                     eigen_smooth: bool):
        acts, grads, cls, _ = self._acts_grads(image, target, tap)
        acts = acts.astype(jnp.float32)
        grads = grads.astype(jnp.float32)
        if eigen_smooth:
            cam = _svd_projection(acts * self.get_cam_weights(
                acts, grads, cls, target)[:, None, None, :])
        else:
            w = self.get_cam_weights(acts, grads, cls, target)
            cam = jnp.sum(acts * w[:, None, None, :], axis=-1)
        cam = jax.nn.relu(cam)
        cam = resize_bilinear(cam[..., None],
                              (image.shape[1], image.shape[2]),
                              align_corners=False)[..., 0]
        return _scale_cam(cam)

    def __call__(self, image, target_category: int,
                 eigen_smooth: bool = False) -> np.ndarray:
        """Returns (B, H, W) CAM in [0, 1] at input resolution; with
        multiple taps, the mean of per-layer scaled CAMs."""
        image = jnp.asarray(image)
        t = int(target_category)
        cams = [self._cam_one_tap(image, t, tap, eigen_smooth)
                for tap in self.taps]
        return np.asarray(_scale_cam(sum(cams) / len(cams)))


def _svd_projection(acts):
    """First right-singular-vector projection of the (hw, K) activations
    (reference utils/svd_on_activations.py:4-19)."""
    b, h, w, k = acts.shape
    flat = acts.reshape(b, h * w, k)
    flat = flat - flat.mean(axis=1, keepdims=True)
    # first principal component via SVD
    _, _, vt = jnp.linalg.svd(flat, full_matrices=False)
    proj = jnp.einsum("bnk,bk->bn", flat, vt[:, 0, :])
    return proj.reshape(b, h, w)


class GradCAM(BaseCAM):
    """weights = mean gradient over H, W (grad_cam.py:5-22)."""

    def get_cam_weights(self, acts, grads, cls, target):
        return jnp.mean(grads, axis=(1, 2))


class GradCAMPlusPlus(BaseCAM):
    """alpha-weighted positive gradients (grad_cam_plusplus.py:7-32)."""

    def get_cam_weights(self, acts, grads, cls, target):
        g2 = grads * grads
        g3 = g2 * grads
        sum_a = jnp.sum(acts, axis=(1, 2))[:, None, None, :]
        denom = 2.0 * g2 + sum_a * g3
        alpha = jnp.where(grads != 0.0, g2 / (denom + 1e-7), 0.0)
        w = alpha * jax.nn.relu(grads)
        return jnp.sum(w, axis=(1, 2))


class XGradCAM(BaseCAM):
    """grads * acts / sum(acts) (xgrad_cam.py:5-31)."""

    def get_cam_weights(self, acts, grads, cls, target):
        sum_a = jnp.sum(acts, axis=(1, 2))
        return jnp.sum(grads * acts, axis=(1, 2)) / (sum_a + 1e-7)


class LayerCAM(BaseCAM):
    """Per-pixel relu(grad) * act, no pooling (layer_cam.py:8-36)."""

    def __call__(self, image, target_category, eigen_smooth=False):
        image = jnp.asarray(image)
        acts, grads, cls, _ = self._acts_grads(image, int(target_category))
        spatial = jax.nn.relu(grads.astype(jnp.float32)) * \
            acts.astype(jnp.float32)
        cam = _svd_projection(spatial) if eigen_smooth else \
            jnp.sum(spatial, axis=-1)
        cam = jax.nn.relu(cam)
        cam = resize_bilinear(cam[..., None],
                              (image.shape[1], image.shape[2]),
                              align_corners=False)[..., 0]
        return np.asarray(_scale_cam(cam))


class EigenCAM(BaseCAM):
    """SVD projection of the raw activations (eigen_cam.py:7-20)."""
    uses_gradients = False

    def __call__(self, image, target_category, eigen_smooth=False):
        image = jnp.asarray(image)
        taps = self._taps_fn(image)
        cam = _svd_projection(taps[self.tap].astype(jnp.float32))
        cam = jax.nn.relu(cam)
        cam = resize_bilinear(cam[..., None],
                              (image.shape[1], image.shape[2]),
                              align_corners=False)[..., 0]
        return np.asarray(_scale_cam(cam))


class EigenGradCAM(BaseCAM):
    """SVD projection of grad * act (eigen_grad_cam.py:10-21)."""

    def __call__(self, image, target_category, eigen_smooth=False):
        image = jnp.asarray(image)
        acts, grads, cls, _ = self._acts_grads(image, int(target_category))
        cam = _svd_projection(grads.astype(jnp.float32)
                              * acts.astype(jnp.float32))
        cam = jax.nn.relu(cam)
        cam = resize_bilinear(cam[..., None],
                              (image.shape[1], image.shape[2]),
                              align_corners=False)[..., 0]
        return np.asarray(_scale_cam(cam))


class ScoreCAM(BaseCAM):
    """Gradient-free: re-score the input masked by each channel's
    normalised activation; softmax over channel scores = weights
    (score_cam.py:6-61).  Channels are batched through the model in
    chunks."""
    uses_gradients = False

    def __init__(self, model, variables, tap="conv6", batch_size: int = 16):
        super().__init__(model, variables, tap)
        self.batch_size = batch_size

        def cls_fn(variables, image):
            out = model.apply(variables, image, train=False)
            return out.cls

        self._cls_jit = jax.jit(cls_fn)
        self._cls_fn = lambda image: self._cls_jit(self.variables, image)

    def __call__(self, image, target_category, eigen_smooth=False):
        image = jnp.asarray(image)
        assert image.shape[0] == 1, "ScoreCAM runs per image"
        taps = self._taps_fn(image)
        acts = taps[self.tap].astype(jnp.float32)  # (1,h,w,K)
        K = acts.shape[-1]
        ups = resize_bilinear(acts, (image.shape[1], image.shape[2]),
                              align_corners=False)
        mn = jnp.min(ups, axis=(1, 2), keepdims=True)
        mx = jnp.max(ups, axis=(1, 2), keepdims=True)
        ups_n = (ups - mn) / (1e-8 + mx - mn)

        scores = []
        for s in range(0, K, self.batch_size):
            chunk = ups_n[0, :, :, s:s + self.batch_size]  # (H,W,k)
            masked = image[0][None] * \
                jnp.transpose(chunk, (2, 0, 1))[..., None]
            cls = self._cls_fn(masked)
            scores.append(cls[:, int(target_category)])
        w = jax.nn.softmax(jnp.concatenate(scores))[None, :]
        cam = jnp.sum(acts * w[:, None, None, :], axis=-1)
        cam = jax.nn.relu(cam)
        cam = resize_bilinear(cam[..., None],
                              (image.shape[1], image.shape[2]),
                              align_corners=False)[..., 0]
        return np.asarray(_scale_cam(cam))


class AblationCAM(BaseCAM):
    """Gradient-free: weight_k = (score - score_with_channel_k_zeroed) /
    score (ablation_cam.py:8-105), channels ablated in batched chunks.

    ``ratio_channels_to_ablate`` is accepted for API parity with the
    reference but intentionally ignored: every channel is always
    ablated (the exact method).  The reference's <1.0 ratio samples a
    channel subset as a speed/fidelity trade; here the ablation
    forwards are batched jitted programs, so the exact pass is cheap
    enough to keep as the only behaviour."""
    uses_gradients = False

    def __init__(self, model, variables, tap="conv6", batch_size: int = 16,
                 ratio_channels_to_ablate: float = 1.0):
        super().__init__(model, variables, tap)
        self.batch_size = batch_size

        def ablate_cls(variables, tap_value, taps, image):
            out = self.model.apply(variables, image,
                                   taps={**taps, self.tap: tap_value},
                                   train=False)
            return out.cls

        self._ablate_jit = jax.jit(ablate_cls)
        self._ablate_cls = lambda tap_value, taps, image: \
            self._ablate_jit(self.variables, tap_value, taps, image)

    def __call__(self, image, target_category, eigen_smooth=False):
        image = jnp.asarray(image)
        assert image.shape[0] == 1
        t = int(target_category)
        taps = self._taps_fn(image)
        acts = taps[self.tap].astype(jnp.float32)
        K = acts.shape[-1]
        base = self._cls_base(taps, image)[0, t]

        drops = []
        for s in range(0, K, self.batch_size):
            k = min(self.batch_size, K - s)
            rep = jnp.repeat(acts, k, axis=0)  # (k,h,w,K)
            mask = 1.0 - jax.nn.one_hot(jnp.arange(s, s + k), K)
            rep = rep * mask[:, None, None, :]
            img_rep = jnp.repeat(image, k, axis=0)
            taps_rep = {kk: jnp.repeat(v, k, axis=0)
                        for kk, v in taps.items()}
            cls = self._ablate_cls(rep, taps_rep, img_rep)
            drops.append(cls[:, t])
        abl = jnp.concatenate(drops)
        w = ((base - abl) / (base + 1e-8))[None, :]
        cam = jnp.sum(acts * w[:, None, None, :], axis=-1)
        cam = jax.nn.relu(cam)
        cam = resize_bilinear(cam[..., None],
                              (image.shape[1], image.shape[2]),
                              align_corners=False)[..., 0]
        return np.asarray(_scale_cam(cam))

    def _cls_base(self, taps, image):
        out = self.model.apply(self.variables, image, taps=taps,
                               train=False)
        return out.cls


class GuidedBackprop:
    """Guided backpropagation: gradient of the target score w.r.t. the
    input image with guided-relu VJPs (reference
    pytorch_grad_cam/guided_backprop.py:7-100).

    Returns the raw (B, H, W, 3) gradient image (not min-max scaled; the
    caller deprocesses as it wishes, matching the reference API)."""

    uses_gradients = True

    def __init__(self, model, variables, tap: str = "conv6"):
        if str(getattr(model, "backbone_dtype", "")).startswith("int8"):
            # same guard as the gradient-based BaseCAM engines: round()
            # in the quantized convs has zero gradient
            raise ValueError(
                "GuidedBackprop needs a differentiable model; "
                "NET.DTYPE 'int8' is inference-only — use 'bfloat16'")

        def score_fn(variables, image, target):
            out = model.apply(variables, image, train=False)
            # TRACED target (one-hot dot, like _acts_grads_jit): one
            # compiled backward serves every class.  A static target
            # would recompile the full model per class — 20 fresh
            # WRN38-scale compiles on remote-compile backends.
            onehot = (jnp.arange(out.cls.shape[1]) ==
                      target).astype(out.cls.dtype)
            return jnp.sum(out.cls * onehot[None, :])

        self._grad_jit = jax.jit(jax.grad(score_fn, argnums=1))
        self._grad_fn = lambda image, target: \
            self._grad_jit(variables, image, jnp.asarray(target,
                                                         jnp.int32))

    def __call__(self, image, target_category: int,
                 eigen_smooth: bool = False) -> np.ndarray:
        from wseg_tpu.ops.activations import guided_mode
        # jit traces lazily: the guided flag must be set during the first
        # call for the given shape/target, hence the context here
        with guided_mode():
            g = self._grad_fn(jnp.asarray(image), int(target_category))
        return np.asarray(g, np.float32)


def aug_smooth(cam_callable, image, target_category: int,
               eigen_smooth: bool = False) -> np.ndarray:
    """Test-time-augmentation smoothing: average the CAM over horizontal
    flips and intensity multipliers [0.9, 1.0, 1.1] (reference
    base_cam.py:161-188 via ttach)."""
    image = np.asarray(image)
    acc = None
    n = 0
    for flip in (False, True):
        for mult in (0.9, 1.0, 1.1):
            x = image * mult
            if flip:
                x = x[:, :, ::-1]
            m = cam_callable(np.ascontiguousarray(x), target_category,
                             eigen_smooth=eigen_smooth)
            if flip:
                m = m[:, :, ::-1]
            acc = m if acc is None else acc + m
            n += 1
    return acc / n


CAM_METHODS = {
    "gradcam": GradCAM,
    "gradcam++": GradCAMPlusPlus,
    "xgradcam": XGradCAM,
    "layercam": LayerCAM,
    "eigencam": EigenCAM,
    "eigengradcam": EigenGradCAM,
    "scorecam": ScoreCAM,
    "ablationcam": AblationCAM,
}

CAM_METHODS["guidedbackprop"] = GuidedBackprop


def _register_fullgrad():
    from wseg_tpu.gradcam.fullgrad import FullGrad
    CAM_METHODS["fullgrad"] = FullGrad


_register_fullgrad()


def get_cam_method(name: str):
    if name not in CAM_METHODS:
        raise NotImplementedError(
            f"CAM method '{name}' (have: {sorted(CAM_METHODS)})")
    return CAM_METHODS[name]
