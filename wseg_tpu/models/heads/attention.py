"""Attention modules for the CAM head family (NHWC, static shapes).

Covers every attention mechanism in the reference model zoo:
  * ChannelAttention / SpatialAttention (CBAM-style)
    - reference models/mods/attention.py:3-41
  * WindowAttention: window-partitioned MHSA (optionally talking-heads,
    optionally cross-attention with an external query)
    - reference models/CAM_CASA_WGAP_tf.py:140-180 (GroupAttention),
      tf_v7.py:91-138 (GroupTalkingAttention), tf_v9.py:93-143 (cross)
  * GlobalSRA: global MHSA with spatial-reduction of keys/values
    - reference models/CAM_CASA_WGAP_tf.py:92-138 (Attention)
  * GridAttention: fixed g x g grid partition (window size H/g x W/g)
    - reference models/CAM_CASA_WGAP_tf_v8.py:183-223 (GroupAttention_v2)

TPU notes: window partition is pure reshape/transpose (no gather); the
per-window attention is a batched einsum that XLA maps onto the MXU.  All
matmuls accumulate in float32 via preferred_element_type.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from wseg_tpu.ops.activations import relu as wrelu


def pad_to_multiple(x, mult_h: int, mult_w: int, buggy_full_pad: bool = False):
    """Zero-pad NHWC bottom/right so H, W divide the window size.

    ``buggy_full_pad`` reproduces reference tf_v6.py:197-199, which (a)
    pads a full extra window when already divisible (no outer modulo) and
    (b) swaps the pad amounts between H and W (``F.pad(x, (0, padh, 0,
    padw))`` puts the h-derived pad on the W axis).
    """
    h, w = x.shape[1], x.shape[2]
    if buggy_full_pad:
        ph, pw = mult_h - w % mult_h, mult_w - h % mult_w
    else:
        ph, pw = (mult_h - h % mult_h) % mult_h, (mult_w - w % mult_w) % mult_w
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return x, (h, w)


class ChannelAttention(nn.Module):
    """SE-style: shared bottleneck over avg- and max-pooled descriptors."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # reference hard-codes the //16 bottleneck (attention.py:9)
        mid = self.features // 16
        fc1 = nn.Dense(mid, use_bias=False, dtype=self.dtype, name="fc1")
        fc2 = nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                       name="fc2")
        avg = jnp.mean(x, axis=(1, 2))
        mx = jnp.max(x, axis=(1, 2))
        out = fc2(wrelu(fc1(avg))) + fc2(wrelu(fc1(mx)))
        return nn.sigmoid(out)[:, None, None, :]  # (B,1,1,C)


class SpatialAttention(nn.Module):
    """7x7 conv over channel-mean||channel-max.

    Returns (sigmoid weight (B,H,W,1), softmax map over H*W (B, H*W)).
    """
    kernel: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pool = jnp.concatenate(
            [jnp.mean(x, axis=-1, keepdims=True),
             jnp.max(x, axis=-1, keepdims=True)], axis=-1)
        p = self.kernel // 2
        s = nn.Conv(1, (self.kernel, self.kernel),
                    padding=[(p, p), (p, p)], use_bias=False,
                    dtype=self.dtype, name="conv1")(pool)  # (B,H,W,1)
        weight = nn.sigmoid(s)
        b = x.shape[0]
        attn_map = nn.softmax(s.reshape(b, -1).astype(jnp.float32), axis=-1)
        return weight, attn_map


def _heads_split(x, num_heads):
    """(..., N, C) -> (..., heads, N, C/heads)"""
    *lead, n, c = x.shape
    x = x.reshape(*lead, n, num_heads, c // num_heads)
    return jnp.swapaxes(x, -2, -3)


def _heads_merge(x):
    """(..., heads, N, hd) -> (..., N, C)"""
    x = jnp.swapaxes(x, -2, -3)
    *lead, n, h, hd = x.shape
    return x.reshape(*lead, n, h * hd)


class WindowAttention(nn.Module):
    """MHSA within non-overlapping ws x ws windows.

    Input/output NHWC with H, W divisible by ``ws`` (use pad_to_multiple).
    ``talking`` adds pre/post-softmax head-mixing linears; ``cross`` takes a
    second NHWC ``query`` input supplying Q and K (V comes from x),
    reproducing tf_v9's GroupTalkingAttention signature.
    ``ws`` may be overridden per call (multi-window tf_v10 shares weights
    across window sizes).
    """
    dim: int
    num_heads: int = 8
    ws: int = 2
    qkv_bias: bool = True
    talking: bool = False
    cross: bool = False
    out_dim: int = 0  # 0 = same as dim (tf_v3's fc8 projects 1024->C*8,
                      # reference CAM_CASA_WGAP_tf_v3.py:142-156)
    softmax_query_axis: bool = False  # tf_v10 bug: softmax over the QUERY
                                      # axis (dim=-2), tf_v10.py:118
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, query=None, ws: int | None = None):
        ws = ws or self.ws
        dim_out = self.out_dim or self.dim
        b, h, w, c = x.shape
        assert h % ws == 0 and w % ws == 0, (h, w, ws)
        hg, wg = h // ws, w // ws
        scale = (dim_out // self.num_heads) ** -0.5

        def windows(t):
            tc = t.shape[-1]
            t = t.reshape(b, hg, ws, wg, ws, tc)
            t = jnp.swapaxes(t, 2, 3)              # (B,hg,wg,ws,ws,C)
            return t.reshape(b, hg * wg, ws * ws, tc)

        xw = windows(x)
        if self.cross:
            assert query is not None, "cross attention needs a query input"
            qw = windows(query)
            qk = nn.Dense(2 * dim_out, use_bias=self.qkv_bias,
                          dtype=self.dtype, name="qk")(qw)
            q, k = jnp.split(qk, 2, axis=-1)
            v = nn.Dense(dim_out, use_bias=self.qkv_bias,
                         dtype=self.dtype, name="v")(xw)
        else:
            qkv = nn.Dense(3 * dim_out, use_bias=self.qkv_bias,
                           dtype=self.dtype, name="qkv")(xw)
            q, k, v = jnp.split(qkv, 3, axis=-1)

        q = _heads_split(q, self.num_heads)        # (B,G,heads,N,hd)
        k = _heads_split(k, self.num_heads)
        v = _heads_split(v, self.num_heads)

        attn = jnp.einsum("bghnd,bghmd->bghnm", q, k,
                          preferred_element_type=jnp.float32) * scale
        if self.talking:
            pre = self.param("pre_softmax_proj", nn.initializers.lecun_normal(),
                             (self.num_heads, self.num_heads))
            post = self.param("post_softmax_proj",
                              nn.initializers.lecun_normal(),
                              (self.num_heads, self.num_heads))
            # reference tf_v7.py:124-128 mixes heads before and after a
            # softmax over the key axis; in our (B,G,heads,n,m) layout the
            # key axis is the last one
            attn = jnp.einsum("bghnm,hi->bginm", attn, pre)
            attn = nn.softmax(attn, axis=-1)
            attn = jnp.einsum("bghnm,hi->bginm", attn, post)
        else:
            attn = nn.softmax(attn,
                              axis=-2 if self.softmax_query_axis else -1)
        attn = attn.astype(v.dtype)

        out = jnp.einsum("bghnm,bghmd->bghnd", attn, v,
                         preferred_element_type=jnp.float32)
        out = _heads_merge(out).astype(self.dtype)  # (B,G,N,C)
        out = nn.Dense(dim_out, dtype=self.dtype, name="proj")(out)

        out = out.reshape(b, hg, wg, ws, ws, dim_out)
        out = jnp.swapaxes(out, 2, 3).reshape(b, h, w, dim_out)
        return out


class GlobalSRA(nn.Module):
    """Global MHSA with spatial reduction (PVT-style) of K/V."""
    dim: int
    num_heads: int = 8
    sr_ratio: int = 1
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        n = h * w
        scale = (self.dim // self.num_heads) ** -0.5
        q = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="q")(x.reshape(b, n, c))
        if self.sr_ratio > 1:
            # strided conv reduction + LayerNorm (reference tf.py:112-127)
            xr = nn.Conv(c, (self.sr_ratio, self.sr_ratio),
                         strides=(self.sr_ratio, self.sr_ratio),
                         padding="VALID", dtype=self.dtype, name="sr")(x)
            xr = xr.reshape(b, -1, c)
            xr = nn.LayerNorm(dtype=self.dtype, name="norm")(xr)
        else:
            xr = x.reshape(b, n, c)
        kv = nn.Dense(2 * self.dim, use_bias=self.qkv_bias,
                      dtype=self.dtype, name="kv")(xr)
        k, v = jnp.split(kv, 2, axis=-1)

        q = _heads_split(q, self.num_heads)
        k = _heads_split(k, self.num_heads)
        v = _heads_split(v, self.num_heads)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32) * scale
        attn = nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32)
        out = _heads_merge(out).astype(self.dtype)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        return out.reshape(b, h, w, self.dim)


class GridAttention(nn.Module):
    """MHSA within a fixed g x g grid of large windows (H/g x W/g each)."""
    dim: int
    num_heads: int = 8
    group_nums: int = 3
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = self.group_nums
        b, h, w, c = x.shape
        assert h % g == 0 and w % g == 0
        hd, wd = h // g, w // g
        scale = (c // self.num_heads) ** -0.5

        t = x.reshape(b, g, hd, g, wd, c)
        t = jnp.swapaxes(t, 2, 3).reshape(b, g * g, hd * wd, c)
        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias,
                       dtype=self.dtype, name="qkv")(t)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _heads_split(q, self.num_heads)
        k = _heads_split(k, self.num_heads)
        v = _heads_split(v, self.num_heads)
        attn = jnp.einsum("bghnd,bghmd->bghnm", q, k,
                          preferred_element_type=jnp.float32) * scale
        attn = nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bghnm,bghmd->bghnd", attn, v,
                         preferred_element_type=jnp.float32)
        out = _heads_merge(out).astype(self.dtype)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        out = out.reshape(b, g, g, hd, wd, c)
        out = jnp.swapaxes(out, 2, 3).reshape(b, h, w, c)
        return out
