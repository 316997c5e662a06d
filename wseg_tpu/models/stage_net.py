"""StageNet: the factored model family behind all 26 reference variants.

The reference implements 26 near-copy model files (models/stage_net.py:31-87
dispatches them).  Structurally they are combinations of a small set of
choices, so this framework implements ONE parameterised Flax module driven
by a :class:`HeadSpec`, plus a registry mapping every reference
``cfg.NET.MODEL`` string to its spec.  See SURVEY.md §2.3 for the variant
table and the reference file for each named spec below.

Output contract (replacing the reference 7-tuple
``(cls, cls_fg, masks{cam,dec}, mask_logits, pseudo_gt, loss_mask,
loss_at)``, e.g. models/SoftMaxAE.py:261): models return tensors only; the
pseudo-GT construction and losses live in ``wseg_tpu.losses`` so the
compute graph stays functional.  ``pseudo_gt``/``loss_mask``/``loss_at``
are derived from ``masks_dec``/``mask_logits``/``attn_map`` by the trainer.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from wseg_tpu.ops.activations import relu as wrelu

from wseg_tpu.models.backbones import get_backbone
from wseg_tpu.models.heads.attention import (
    ChannelAttention,
    GlobalSRA,
    GridAttention,
    SpatialAttention,
    WindowAttention,
    pad_to_multiple,
)
from wseg_tpu.models.heads.softmax_ae import SoftMaxAEDecoder
from wseg_tpu.ops.pamr import pamr
from wseg_tpu.ops.pooling import ngwp_focal_scores
from wseg_tpu.ops.resize import adaptive_max_pool, rescale_as, resize_bilinear


@dataclasses.dataclass(frozen=True)
class HeadSpec:
    """Static architecture switches for one model variant."""
    name: str = ""
    kind: str = "cam"              # "ae" | "cam"
    # attention pipeline (applied in order: self_attn -> CA -> SA)
    channel_attn: bool = False
    spatial_attn: bool = False
    residual_attn: bool = False    # tf_v3: x = x + x*attn
    attn_before_fc7: bool = False  # tf_v3: CA/SA on raw backbone features
    self_attn: str = ""            # "" | "window" | "global" | "grid" | "multiwindow"
    self_attn_ws: Any = 2          # int, or tuple for multiwindow
    self_attn_out_mult: int = 0    # out dim = mult*num_classes; 0 = keep
                                   # dim (tf_v3: num_classes*8)
    sr_ratio: int = 1              # for "global"
    talking: bool = False
    cross_query: bool = False      # query from conv3 via strided fc6
    attn_fullpad_bug: bool = False # tf_v6 pads a full window when divisible
    attn_nopad: bool = False       # tf_v5 assumes divisible sizes
    multi_window_norm: bool = False  # tf_v10 concat+1x1+residual+LayerNorm
    fc7: bool = False              # 1x1 fan_out->1024 before self-attention
    sa_dim: int = 0                # fc7 width; 0 = model default (1024);
                                   # tf_v10 uses 512 (tf_v10.py:156)
    # scoring
    scoring: str = "cam"           # "cam" | "softmax"
    bg: str = "score"              # "score" | "const_one" | "learned"
    pooling: str = "gap"           # cam scoring: "gap" | "wgap"
    mask_branch_relu: bool = False # relu before softmax (v6/tf heads)
    cls_all_channels: bool = False # v4 keeps the BG score in cls
    labels_with_bg: bool = False   # v4 expects C-dim labels
    # multi-level fusion
    multilevel: str = ""           # "" | "sum" | "concat"
    conv3_tap: str = "conv3"       # "conv3_pre" for resnet38d_v2 consumers
    # refinement
    refine: str = ""               # "" | "pamr" | "pcm"
    clean_before_refine: bool = False
    # aux outputs
    loss_at: bool = False


class ModelOutput(flax.struct.PyTreeNode):
    """Tensors produced by one forward pass (None fields = not produced)."""
    cls: jax.Array                       # (B, C-1) or (B, C) class scores
    masks: jax.Array                     # (B, H, W, C) at image size
    cls_fg: Optional[jax.Array] = None   # (B,) foreground stat
    masks_dec: Optional[jax.Array] = None
    mask_logits: Optional[jax.Array] = None  # feature-res logits for CE
    attn_map: Optional[jax.Array] = None     # (B, HW) SA softmax map


def _rescale_and_clean(masks, size_hw, labels_fg):
    """Upscale to image size and zero channels of absent classes
    (reference models/SoftMaxAE.py:263-268)."""
    masks = resize_bilinear(masks, size_hw, align_corners=True)
    fg = masks[..., 1:] * labels_fg[:, None, None, :]
    return jnp.concatenate([masks[..., :1], fg], axis=-1)


def _clean_only(masks, labels_fg):
    fg = masks[..., 1:] * labels_fg[:, None, None, :]
    return jnp.concatenate([masks[..., :1], fg], axis=-1)


class StageNet(nn.Module):
    """Backbone + spec-driven head.

    Call: ``model.apply(vars, image, image_raw, labels, train=...)``.
    ``image`` is ImageNet-normalised NHWC; ``image_raw`` the [0,1] RGB used
    by PAMR; ``labels`` multi-hot (B, C-1) (or (B, C) if
    spec.labels_with_bg).  Test mode = ``labels is None``.
    """
    spec: HeadSpec
    backbone: str
    num_classes: int = 21
    bg_score: float = 0.1
    focal_p: float = 3.0
    focal_lambda: float = 0.01
    sg_psi: float = 0.3
    pamr_iter: int = 10
    pamr_kernel: Tuple[int, ...] = (1, 2, 4, 8, 12, 24)
    pamr_impl: str = "lax"
    sa_dim: int = 1024
    dtype: Any = jnp.float32
    # compute dtype for the backbone only; None = same as ``dtype``.
    # The int8 inference mode (NET.DTYPE: int8) sets this to the
    # "int8" marker: backbone convs run w8a8-quantized (~90% of the
    # forward FLOPs) while the head stays bfloat16.
    backbone_dtype: Any = None

    def setup(self):
        # the backbone lives in setup() so both __call__ and
        # backbone_taps (Grad-CAM engines) can run it
        self._backbone_mod = get_backbone(
            self.backbone, self.backbone_dtype or self.dtype,
            module_name="backbone")

    def _dropout2d(self, x, rate, train):
        return nn.Dropout(rate, broadcast_dims=(1, 2),
                          deterministic=not train)(x)

    @nn.compact
    def __call__(self, image, image_raw=None, labels=None, *,
                 train: bool = False, taps=None):
        """Full forward.  ``taps`` overrides the backbone output (used by
        the Grad-CAM engine to differentiate w.r.t. activations)."""
        spec = self.spec
        C = self.num_classes
        test_mode = labels is None
        size_hw = (image.shape[1], image.shape[2])

        d = self._backbone_mod(image, train=train)
        if taps is not None:
            d = {**d, **taps}

        if spec.kind == "ae":
            return self._forward_ae(d, image, image_raw, labels, train,
                                    size_hw)
        return self._forward_cam(d, image, image_raw, labels, train,
                                 size_hw)

    def backbone_taps(self, image, train: bool = False):
        """Backbone-only application (for CAM engines); call via
        ``model.apply(vars, image, method='backbone_taps')``."""
        return self._backbone_mod(image, train=train)

    # ------------------------------------------------------------------ ae
    def _forward_ae(self, d, image, image_raw, labels, train, size_hw):
        C = self.num_classes
        logits_fg = SoftMaxAEDecoder(C, self.sg_psi, dtype=self.dtype,
                                     name="decoder")(
            d["conv3"], d["conv6"], train=train)
        logits = jnp.concatenate(
            [jnp.ones_like(logits_fg[..., :1]), logits_fg], axis=-1)
        logits = logits.astype(jnp.float32)
        masks = nn.softmax(logits, axis=-1)
        cls = ngwp_focal_scores(logits, masks, self.focal_p,
                                self.focal_lambda)
        if labels is None:
            return ModelOutput(cls=cls, masks=rescale_as(masks, image))

        labels_fg = labels.astype(jnp.float32)
        cls_fg = (jnp.mean(masks[..., 1:], axis=(1, 2)) * labels_fg
                  ).sum(-1) / labels_fg.sum(-1)
        masks_dec = pamr(image_raw, jax.lax.stop_gradient(masks),
                         self.pamr_kernel, self.pamr_iter, self.pamr_impl)
        return ModelOutput(
            cls=cls, cls_fg=cls_fg,
            masks=_rescale_and_clean(masks, size_hw, labels_fg),
            masks_dec=_rescale_and_clean(masks_dec, size_hw, labels_fg),
            mask_logits=logits)

    # ----------------------------------------------------------------- cam
    def _forward_cam(self, d, image, image_raw, labels, train, size_hw):
        spec = self.spec
        C = self.num_classes
        x = d["conv6"]

        if spec.multilevel == "sum":
            return self._forward_mf(d, image, labels, train, size_hw)
        if spec.multilevel == "concat":
            x3 = adaptive_max_pool(d.get(spec.conv3_tap, d["conv3"]),
                                   (x.shape[1], x.shape[2]))
            x = jnp.concatenate([x3, d["conv4"], x], axis=-1)

        attn_map = None
        if spec.attn_before_fc7:
            # tf_v3 applies CA/SA residually on the raw backbone features
            # BEFORE fc7/self-attention (reference
            # models/CAM_CASA_WGAP_tf_v3.py:243-248)
            x, attn_map = self._apply_casa(x, spec)

        if spec.fc7:
            x = nn.Conv(spec.sa_dim or self.sa_dim, (1, 1), use_bias=False,
                        dtype=self.dtype,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name="fc7")(x)

        x = self._apply_self_attention(x, d, train)

        if not spec.attn_before_fc7:
            x, attn_map = self._apply_casa(x, spec)

        if spec.scoring == "softmax":
            return self._score_softmax(x, d, image, image_raw, labels,
                                       train, size_hw, attn_map)
        return self._score_cam(x, image, labels, train, size_hw, attn_map)

    # ---------------------------------------------------------- CBAM CA/SA
    def _apply_casa(self, x, spec):
        """Channel then spatial attention, multiplicative or residual
        (reference models/mods/attention.py:3-41 and per-variant usage)."""
        attn_map = None
        if spec.channel_attn:
            ca = ChannelAttention(x.shape[-1], dtype=self.dtype,
                                  name="caatention")(x)
            x = x + x * ca if spec.residual_attn else x * ca
        if spec.spatial_attn:
            sw, attn_map = SpatialAttention(dtype=self.dtype,
                                            name="attention")(x)
            x = x + x * sw if spec.residual_attn else x * sw
        return x, attn_map

    # ------------------------------------------------------ self-attention
    def _apply_self_attention(self, x, d, train):
        spec = self.spec
        if not spec.self_attn:
            return x
        dim = x.shape[-1]

        if spec.self_attn == "global":
            return GlobalSRA(dim, 8, spec.sr_ratio, dtype=self.dtype,
                             name="selfattn")(x)

        if spec.self_attn == "grid":
            g = int(spec.self_attn_ws)
            xp, (h, w) = pad_to_multiple(x, g, g)
            # pad so H and W divide the grid count
            ph = (-xp.shape[1]) % g
            pw = (-xp.shape[2]) % g
            if ph or pw:
                xp = jnp.pad(xp, ((0, 0), (0, ph), (0, pw), (0, 0)))
            out = GridAttention(dim, 8, g, dtype=self.dtype,
                                name="selfattn")(xp)
            return out[:, :h, :w, :]

        if spec.self_attn == "multiwindow":
            # tf_v10: shared-weight window attention at several window
            # sizes, concat -> 1x1 -> residual add -> LayerNorm; its
            # GroupAttention softmaxes over the query axis (a reference
            # bug reproduced for parity, tf_v10.py:118)
            attn = WindowAttention(dim, 8, softmax_query_axis=True,
                                   dtype=self.dtype,
                                   name="selfattn")
            outs = []
            h, w = x.shape[1], x.shape[2]
            for ws in spec.self_attn_ws:
                xp, _ = pad_to_multiple(x, ws, ws)
                o = attn(xp, ws=ws)[:, :h, :w, :]
                outs.append(o)
            o = jnp.concatenate(outs, axis=-1)
            o = nn.Conv(dim, (1, 1), use_bias=False, dtype=self.dtype,
                        name="attn_conv")(o)
            x = x + o
            return nn.LayerNorm(dtype=self.dtype, name="norm")(x)

        # windowed (default), optionally cross-queried from conv3
        ws = int(spec.self_attn_ws)
        query = None
        if spec.cross_query:
            q = nn.Conv(self.sa_dim, (2, 2), strides=(2, 2), use_bias=False,
                        padding="VALID", dtype=self.dtype, name="fc6")(
                d.get(spec.conv3_tap, d["conv3"]))
            q = resize_bilinear(q, (x.shape[1], x.shape[2]),
                                align_corners=True)
            query = q
        if spec.attn_nopad:
            xp, (h, w) = x, (x.shape[1], x.shape[2])
            qp = query
        else:
            xp, (h, w) = pad_to_multiple(x, ws, ws,
                                         spec.attn_fullpad_bug)
            qp = None
            if query is not None:
                qp, _ = pad_to_multiple(query, ws, ws,
                                        spec.attn_fullpad_bug)
        out_dim = spec.self_attn_out_mult * self.num_classes
        out = WindowAttention(xp.shape[-1], 8, ws, talking=spec.talking,
                              cross=spec.cross_query,
                              out_dim=out_dim, dtype=self.dtype,
                              name="selfattn")(xp, query=qp)
        return out[:, :h, :w, :]

    # ------------------------------------------------------- CAM scoring
    def _score_cam(self, x, image, labels, train, size_hw, attn_map):
        """Classic CAM path: shared fc8; GAP/WGAP cls; relu+maxnorm masks
        (reference models/BaselineCAM.py:61-108)."""
        spec = self.spec
        C = self.num_classes
        fc8 = nn.Conv(C - 1, (1, 1), use_bias=False, dtype=self.dtype,
                      kernel_init=nn.initializers.xavier_uniform(),
                      name="fc8")

        if spec.pooling == "wgap":
            # weighted GAP: sum over positions of x * SA softmax map
            # (reference models/CAM_SA_WGAP.py:70-76)
            b, h, w, c = x.shape
            pooled = jnp.einsum("bnc,bn->bc",
                                x.reshape(b, h * w, c).astype(jnp.float32),
                                attn_map.reshape(b, h * w))
            pooled = pooled[:, None, None, :].astype(self.dtype)
            pooled = self._dropout2d(pooled, 0.5, train)
            cls = fc8(pooled)[:, 0, 0, :]
        else:
            pooled = self._dropout2d(x, 0.5, train)
            pooled = jnp.mean(pooled, axis=(1, 2), keepdims=True)
            cls = fc8(pooled)[:, 0, 0, :]

        logits = fc8(x)  # (B, h, w, C-1)
        masks = resize_bilinear(logits, size_hw, align_corners=True)
        masks = wrelu(masks.astype(jnp.float32))
        z = jnp.max(masks, axis=(1, 2), keepdims=True)
        masks = masks / (1e-5 + z)
        bg = jnp.full_like(masks[..., :1], self.bg_score)
        masks = jnp.concatenate([bg, masks], axis=-1)

        if labels is None:
            return ModelOutput(cls=cls, masks=masks)

        labels_fg = labels.astype(jnp.float32)
        cls_fg = (jnp.mean(masks[..., 1:], axis=(1, 2)) * labels_fg
                  ).sum(-1) / labels_fg.sum(-1)
        # masks already at image size; train-mode cleaning only
        masks_c = _clean_only(masks, labels_fg)
        return ModelOutput(cls=cls, cls_fg=cls_fg, masks=masks_c,
                           mask_logits=logits.astype(jnp.float32),
                           attn_map=attn_map if spec.loss_at else None)

    # --------------------------------------------------- softmax scoring
    def _score_softmax(self, x, d, image, image_raw, labels, train,
                       size_hw, attn_map):
        """nGWP softmax path shared by v2..v6/tf* (reference
        models/CAM_CASA_WGAP_v5.py:145-200)."""
        spec = self.spec
        C = self.num_classes
        out_ch = C - 1 if spec.bg == "const_one" else C
        if not spec.mask_branch_relu:
            # cls_branch = [Dropout2d, fc8] (v2-v5/PCM, e.g. reference
            # CAM_CASA_WGAP_v5.py:122-124); the mask_branch variants
            # (v6 + all tf*) apply fc8+relu with NO dropout
            x = self._dropout2d(x, 0.5, train)
        x = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=nn.initializers.xavier_uniform(),
                    name="fc8")(x)
        if spec.mask_branch_relu:
            x = wrelu(x)
        if spec.bg == "const_one":
            x = jnp.concatenate([jnp.ones_like(x[..., :1]), x], axis=-1)
        logits = x.astype(jnp.float32)
        masks = nn.softmax(logits, axis=-1)
        cls_all = ngwp_focal_scores(logits, masks, self.focal_p,
                                    self.focal_lambda)
        if spec.cls_all_channels:
            # v4: nGWP+focal over every channel including BG
            from wseg_tpu.ops.pooling import focal_penalty, ngwp_pool
            cls = ngwp_pool(logits, masks) + focal_penalty(
                jnp.mean(masks, axis=(1, 2)), self.focal_p,
                self.focal_lambda)
        else:
            cls = cls_all

        if labels is None:
            return ModelOutput(cls=cls, masks=rescale_as(masks, image))

        labels_fg = (labels[:, 1:] if spec.labels_with_bg else labels
                     ).astype(jnp.float32)
        cls_fg = (jnp.mean(masks[..., 1:], axis=(1, 2)) * labels_fg
                  ).sum(-1) / labels_fg.sum(-1)

        masks_dec = None
        if spec.refine == "pamr":
            src = _clean_only(masks, labels_fg) if spec.clean_before_refine \
                else masks
            masks_dec = pamr(image_raw, jax.lax.stop_gradient(src),
                             self.pamr_kernel, self.pamr_iter,
                             self.pamr_impl)
        elif spec.refine == "pcm":
            masks_dec = self._pcm_refine(logits, d, image)

        return ModelOutput(
            cls=cls, cls_fg=cls_fg,
            masks=_rescale_and_clean(masks, size_hw, labels_fg),
            masks_dec=None if masks_dec is None else _rescale_and_clean(
                masks_dec, size_hw, labels_fg),
            mask_logits=logits,
            attn_map=attn_map if spec.loss_at else None)

    # ------------------------------------------------------------ PCM
    def _pcm_refine(self, logits, d, image):
        """SEAM-style pixel-correlation module (reference
        models/CAM_CASA_WGAP_PCM.py:185-237)."""
        h, w = logits.shape[1], logits.shape[2]
        cam_d = wrelu(jax.lax.stop_gradient(logits))
        cam_max = jnp.max(cam_d, axis=(1, 2), keepdims=True) + 1e-5
        cam_norm = wrelu(cam_d - 1e-5) / cam_max
        fg = cam_norm[..., 1:]
        bg = 1.0 - jnp.max(fg, axis=-1, keepdims=True)
        fg_max = jnp.max(fg, axis=-1, keepdims=True)
        fg = jnp.where(fg < fg_max, 0.0, fg)
        cam_norm = jnp.concatenate([bg, fg], axis=-1)

        f83 = wrelu(nn.Conv(64, (1, 1), use_bias=False, dtype=self.dtype,
                              name="f8_3")(
            jax.lax.stop_gradient(d["conv4"])))
        f84 = wrelu(nn.Conv(128, (1, 1), use_bias=False,
                              dtype=self.dtype, name="f8_4")(
            jax.lax.stop_gradient(d["conv5"])))
        xs = resize_bilinear(image, (h, w), align_corners=True)
        f83 = resize_bilinear(f83, (h, w), align_corners=True)
        f84 = resize_bilinear(f84, (h, w), align_corners=True)
        f = jnp.concatenate([xs.astype(self.dtype), f83, f84], axis=-1)
        f = nn.Conv(192, (1, 1), use_bias=False, dtype=self.dtype,
                    name="f9")(f)
        b = f.shape[0]
        fv = f.reshape(b, h * w, -1).astype(jnp.float32)
        fv = fv / (jnp.linalg.norm(fv, axis=-1, keepdims=True) + 1e-5)
        aff = wrelu(jnp.einsum("bnc,bmc->bnm", fv, fv,
                                 preferred_element_type=jnp.float32))
        aff = aff / (jnp.sum(aff, axis=1, keepdims=True) + 1e-5)
        cam = cam_norm.reshape(b, h * w, -1)
        out = jnp.einsum("bnm,bnc->bmc", aff, cam)
        return out.reshape(b, h, w, -1)

    # --------------------------------------------------- multi-level (MF)
    def _forward_mf(self, d, image, labels, train, size_hw):
        """CAM_MF: per-level fc8 heads, summed cls, averaged masks
        (reference models/CAM_MF.py:31-141, including the ``m += relu(m)``
        accumulation on levels 3-5)."""
        C = self.num_classes
        levels = ["conv6", "conv5", "conv4", "conv3"]
        cls = 0.0
        masks_levels = []
        logits6 = None
        for lv in levels:
            fc8 = nn.Conv(C - 1, (1, 1), use_bias=False, dtype=self.dtype,
                          kernel_init=nn.initializers.xavier_uniform(),
                          name=f"fc8_{lv}")
            feat = d[self.spec.conv3_tap] if lv == "conv3" else d[lv]
            pooled = self._dropout2d(feat, 0.5, train)
            pooled = jnp.mean(pooled, axis=(1, 2), keepdims=True)
            cls = cls + fc8(pooled)[:, 0, 0, :]
            lg = fc8(feat)
            if lv == "conv6":
                logits6 = lg.astype(jnp.float32)
            m = resize_bilinear(lg, size_hw, align_corners=True)
            m = m.astype(jnp.float32)
            if lv == "conv6":
                m = wrelu(m)
            else:
                m = m + wrelu(m)
            masks_levels.append(m)
        masks = sum(masks_levels) / len(masks_levels)
        z = jnp.max(masks, axis=(1, 2), keepdims=True)
        masks = masks / (1e-5 + z)
        bg = jnp.full_like(masks[..., :1], self.bg_score)
        masks = jnp.concatenate([bg, masks], axis=-1)

        if labels is None:
            return ModelOutput(cls=cls, masks=masks)
        labels_fg = labels.astype(jnp.float32)
        cls_fg = (jnp.mean(masks[..., 1:], axis=(1, 2)) * labels_fg
                  ).sum(-1) / labels_fg.sum(-1)
        return ModelOutput(cls=cls, cls_fg=cls_fg,
                           masks=_clean_only(masks, labels_fg),
                           mask_logits=logits6)


# --------------------------------------------------------------- registry
def _spec(**kw) -> HeadSpec:
    return HeadSpec(**kw)


MODEL_SPECS = {
    # the CVPR-2020 paper model (reference models/SoftMaxAE.py)
    "ae": _spec(name="ae", kind="ae", scoring="softmax", bg="const_one",
                refine="pamr"),
    # classic CAM baseline (models/BaselineCAM.py)
    "bsl": _spec(name="bsl"),
    # CBAM-attention CAM variants (models/CAM_SA.py etc.)
    "CAM_SA": _spec(name="CAM_SA", spatial_attn=True, loss_at=True),
    "CAM_CASA": _spec(name="CAM_CASA", channel_attn=True,
                      spatial_attn=True, loss_at=True),
    "CAM_SA_WGAP": _spec(name="CAM_SA_WGAP", spatial_attn=True,
                         pooling="wgap", loss_at=True),
    "CAM_CASA_WGAP": _spec(name="CAM_CASA_WGAP", channel_attn=True,
                           spatial_attn=True, pooling="wgap", loss_at=True),
    # multi-level fusion (models/CAM_MF.py, CAM_MF_v2.py); both read the
    # resnet38d_v2-style pre-activation conv3 tap
    "CAM_MF": _spec(name="CAM_MF", multilevel="sum",
                    conv3_tap="conv3_pre"),
    "CAM_MF_v2": _spec(name="CAM_MF_v2", multilevel="concat",
                       conv3_tap="conv3_pre"),
    # nGWP-scored attention variants (models/CAM_CASA_WGAP_v2..v6.py)
    "CAM_CASA_WGAP_v2": _spec(name="CAM_CASA_WGAP_v2", channel_attn=True,
                              spatial_attn=True, scoring="softmax",
                              bg="const_one", loss_at=True),
    "CAM_CASA_WGAP_v3": _spec(name="CAM_CASA_WGAP_v3", channel_attn=True,
                              spatial_attn=True, scoring="softmax",
                              bg="learned", loss_at=True),
    "CAM_WGAP_v3": _spec(name="CAM_WGAP_v3", scoring="softmax",
                         bg="learned"),
    "CAM_CASA_WGAP_v4": _spec(name="CAM_CASA_WGAP_v4", channel_attn=True,
                              spatial_attn=True, scoring="softmax",
                              bg="learned", cls_all_channels=True,
                              labels_with_bg=True, loss_at=True),
    "CAM_CASA_WGAP_v5": _spec(name="CAM_CASA_WGAP_v5", channel_attn=True,
                              spatial_attn=True, scoring="softmax",
                              bg="learned", refine="pamr"),
    "CAM_CASA_WGAP_v6": _spec(name="CAM_CASA_WGAP_v6", channel_attn=True,
                              spatial_attn=True, scoring="softmax",
                              bg="learned", mask_branch_relu=True,
                              refine="pamr", clean_before_refine=True),
    "CAM_CASA_WGAP_PCM": _spec(name="CAM_CASA_WGAP_PCM", channel_attn=True,
                               spatial_attn=True, scoring="softmax",
                               bg="learned", refine="pcm"),
    # transformer-attention variants (models/CAM_CASA_WGAP_tf*.py)
    "CAM_CASA_WGAP_tf": _spec(name="CAM_CASA_WGAP_tf", fc7=True,
                              self_attn="window", self_attn_ws=2,
                              channel_attn=True, spatial_attn=True,
                              scoring="softmax", bg="learned",
                              mask_branch_relu=True, refine="pamr",
                              clean_before_refine=True),
    "CAM_CASA_WGAP_tf_v2": _spec(name="CAM_CASA_WGAP_tf_v2", fc7=True,
                                 self_attn="global", sr_ratio=3,
                                 channel_attn=True, spatial_attn=True,
                                 scoring="softmax", bg="learned",
                                 mask_branch_relu=True, refine="pamr",
                                 clean_before_refine=True),
    # tf_v3: CA/SA residually on the RAW backbone features, then fc7 ->
    # GroupAttention-as-fc8 (1024 -> C*8, no padding) -> 1x1 fc8_2
    # (reference models/CAM_CASA_WGAP_tf_v3.py:205-254)
    "CAM_CASA_WGAP_tf_v3": _spec(name="CAM_CASA_WGAP_tf_v3", fc7=True,
                                 self_attn="window", self_attn_ws=2,
                                 self_attn_out_mult=8, attn_nopad=True,
                                 channel_attn=True, spatial_attn=True,
                                 residual_attn=True, attn_before_fc7=True,
                                 scoring="softmax",
                                 bg="learned", mask_branch_relu=True,
                                 refine="pamr", clean_before_refine=True),
    # tf_v4 = tf_v2 with sr_ratio 1 (full-resolution K/V; the ONLY diff,
    # reference CAM_CASA_WGAP_tf_v4.py:222)
    "CAM_CASA_WGAP_tf_v4": _spec(name="CAM_CASA_WGAP_tf_v4", fc7=True,
                                 self_attn="global", sr_ratio=1,
                                 channel_attn=True,
                                 spatial_attn=True, scoring="softmax",
                                 bg="learned", mask_branch_relu=True,
                                 refine="pamr", clean_before_refine=True),
    "CAM_CASA_WGAP_tf_v5": _spec(name="CAM_CASA_WGAP_tf_v5", fc7=True,
                                 self_attn="window", self_attn_ws=3,
                                 attn_nopad=True, channel_attn=True,
                                 spatial_attn=True, scoring="softmax",
                                 bg="learned", mask_branch_relu=True,
                                 refine="pamr", clean_before_refine=True),
    "CAM_CASA_WGAP_tf_v6": _spec(name="CAM_CASA_WGAP_tf_v6", fc7=True,
                                 self_attn="window", self_attn_ws=7,
                                 attn_fullpad_bug=True, channel_attn=True,
                                 spatial_attn=True, scoring="softmax",
                                 bg="learned", mask_branch_relu=True,
                                 refine="pamr", clean_before_refine=True),
    "CAM_CASA_WGAP_tf_v7": _spec(name="CAM_CASA_WGAP_tf_v7", fc7=True,
                                 self_attn="window", self_attn_ws=2,
                                 talking=True, channel_attn=True,
                                 spatial_attn=True, scoring="softmax",
                                 bg="learned", mask_branch_relu=True,
                                 refine="pamr", clean_before_refine=True),
    "CAM_CASA_WGAP_tf_v8": _spec(name="CAM_CASA_WGAP_tf_v8", fc7=True,
                                 self_attn="grid", self_attn_ws=3,
                                 channel_attn=True, spatial_attn=True,
                                 scoring="softmax", bg="learned",
                                 mask_branch_relu=True, refine="pamr",
                                 clean_before_refine=True),
    "CAM_CASA_WGAP_tf_v9": _spec(name="CAM_CASA_WGAP_tf_v9", fc7=True,
                                 self_attn="window", self_attn_ws=2,
                                 conv3_tap="conv3_pre",
                                 talking=True, cross_query=True,
                                 channel_attn=True, spatial_attn=True,
                                 scoring="softmax", bg="learned",
                                 mask_branch_relu=True, refine="pamr",
                                 clean_before_refine=True),
    "CAM_CASA_WGAP_tf_v9_2": _spec(name="CAM_CASA_WGAP_tf_v9_2", fc7=True,
                                   self_attn="window", self_attn_ws=2,
                                   conv3_tap="conv3_pre",
                                   cross_query=True, channel_attn=True,
                                   spatial_attn=True, scoring="softmax",
                                   bg="learned", mask_branch_relu=True,
                                   refine="pamr",
                                   clean_before_refine=True),
    "CAM_CASA_WGAP_tf_v10": _spec(name="CAM_CASA_WGAP_tf_v10", fc7=True,
                                  sa_dim=512, self_attn="multiwindow",
                                  self_attn_ws=(2, 4),
                                  multi_window_norm=True,
                                  scoring="softmax", bg="learned",
                                  mask_branch_relu=True, refine="pamr",
                                  clean_before_refine=True),
}


def get_model(net_cfg, num_classes: int = 21) -> StageNet:
    """Build a StageNet from a cfg.NET-style AttrDict (the reference
    ``get_model(cfg.NET, num_classes)`` API, models/__init__.py:4-6)."""
    name = net_cfg.MODEL
    if name == "vgg16":  # reference default config quirk: MODEL 'vgg16'
        name = "bsl"
    if name not in MODEL_SPECS:
        raise NotImplementedError(f"Unknown model '{name}'")
    dstr = str(getattr(net_cfg, "DTYPE", "float32"))
    # "int8": w8a8-quantized backbone convs (inference mode; ~2x the
    # bf16 conv rate on v5e, docs/ROOFLINE.md) + bfloat16 head math.
    # NET.QUANT_ACT "static" switches the activation scales to the
    # calibrated per-input-channel grids (tools/quant_calibrate.py).
    dtype = jnp.bfloat16 if dstr in ("bfloat16", "int8") else jnp.float32
    backbone_dtype = None
    if dstr == "int8":
        static = str(getattr(net_cfg, "QUANT_ACT", "dynamic")) == "static"
        backbone_dtype = "int8_static" if static else "int8"
    return StageNet(
        spec=MODEL_SPECS[name],
        backbone=net_cfg.BACKBONE,
        backbone_dtype=backbone_dtype,
        num_classes=num_classes,
        bg_score=float(net_cfg.BG_SCORE),
        focal_p=float(net_cfg.FOCAL_P),
        focal_lambda=float(net_cfg.FOCAL_LAMBDA),
        sg_psi=float(net_cfg.SG_PSI),
        pamr_iter=int(net_cfg.PAMR_ITER),
        pamr_kernel=tuple(net_cfg.PAMR_KERNEL),
        pamr_impl=str(getattr(net_cfg, "PAMR_IMPL", "lax")),
        dtype=dtype,
    )
