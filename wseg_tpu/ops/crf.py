"""Dense-CRF mean-field inference (convolutional approximation).

Replaces the reference's pydensecrf C++ dependency (utils/dcrf.py:6-21):
unary from softmax, Gaussian pairwise (sxy 3, compat 3) + bilateral
pairwise (sxy 80, srgb 13, compat 10), ``t`` mean-field iterations with
symmetric kernel normalisation.

pydensecrf evaluates the bilateral term exactly with a permutohedral
lattice; here the bilateral kernel is sampled on a sparse displacement
grid (taps at multiples of ~sxy/2 out to 2*sxy) with per-tap colour
Gaussians — a convolutional approximation whose cost is
O(taps * H * W * C) and which vectorises on both numpy (host
post-processing) and XLA (batched on-device refinement).

Update rule (Krähenbühl & Koltun 2011, Potts compatibility):
  logit_c = log p_c + sum_k compat_k * (filter_k(Q)_c - Q_c)
  Q <- softmax(logit)
(the self-contribution Q_i is excluded from each message).
"""

from __future__ import annotations

import functools
import math
from typing import List, Tuple

import numpy as np
from scipy.ndimage import correlate1d


def _bilateral_taps(sxy: float, spacing_div: float = 2.0,
                    radius_mult: float = 2.0) -> List[Tuple[int, int]]:
    """Displacement taps on a sparse grid covering ~2 sigma."""
    step = max(1, int(round(sxy / spacing_div)))
    r = int(round(radius_mult * sxy))
    offs = list(range(-r, r + 1, step))
    return [(dy, dx) for dy in offs for dx in offs
            if not (dy == 0 and dx == 0)]


def _shift2d(x: np.ndarray, dy: int, dx: int) -> np.ndarray:
    """Shift with zero fill (pixels outside the image contribute nothing)."""
    H, W = x.shape[:2]
    out = np.zeros_like(x)
    if abs(dy) >= H or abs(dx) >= W:
        return out
    ys = slice(max(0, dy), min(H, H + dy))
    yd = slice(max(0, -dy), min(H, H - dy))
    xs = slice(max(0, dx), min(W, W + dx))
    xd = slice(max(0, -dx), min(W, W - dx))
    out[yd, xd] = x[ys, xs]
    return out


def crf_inference_np(img: np.ndarray, probs: np.ndarray, t: int = 10,
                     scale_factor: float = 1.0, labels: int = 21,
                     sxy_gaussian: float = 3.0, compat_gaussian: float = 3.0,
                     sxy_bilateral: float = 80.0, srgb: float = 13.0,
                     compat_bilateral: float = 10.0,
                     tap_spacing_div: float = 2.0) -> np.ndarray:
    """Host (numpy) mean-field CRF.

    Args:
      img: (H, W, 3) uint8 RGB.
      probs: (H, W, C) class probabilities (softmax output).
    Returns:
      (H, W, C) refined probabilities.
    """
    H, W, C = probs.shape
    img_f = img.astype(np.float32)
    sxy_g = sxy_gaussian / scale_factor
    sxy_b = sxy_bilateral / scale_factor

    # bilateral: precompute per-tap spatial and colour weights
    taps = _bilateral_taps(sxy_b, spacing_div=tap_spacing_div)
    tap_spatial = np.asarray(
        [math.exp(-(dy * dy + dx * dx) / (2.0 * sxy_b * sxy_b))
         for dy, dx in taps], np.float32)
    colour_w = []
    for (dy, dx) in taps:
        diff = img_f - _shift2d(img_f, dy, dx)
        cw = np.exp(-np.sum(diff * diff, -1) / (2.0 * srgb * srgb))
        colour_w.append(cw.astype(np.float32))

    # symmetric normalisation: d_i = sum_j k(i,j), message uses
    # k/sqrt(d_i d_j)
    ones = np.ones((H, W), np.float32)

    # explicit unnormalised separable Gaussian (centre tap weight exactly
    # 1) so the self-contribution subtraction below is well-defined
    r = int(round(2.0 * sxy_g))
    x1d = np.arange(-r, r + 1, dtype=np.float32)
    k1d = np.exp(-x1d * x1d / (2.0 * sxy_g * sxy_g))

    def gauss_filter(x):
        out = correlate1d(x, k1d, axis=0, mode="constant")
        return correlate1d(out, k1d, axis=1, mode="constant")

    def bilateral_filter(x):
        acc = np.zeros_like(x)
        for k, (dy, dx) in enumerate(taps):
            acc += tap_spatial[k] * colour_w[k] * _shift2d(x, dy, dx)
        return acc

    norm_g = np.maximum(gauss_filter(ones), 1e-20) ** -0.5
    norm_b = np.maximum(bilateral_filter(ones), 1e-20) ** -0.5

    unary = -np.log(np.maximum(probs.astype(np.float32), 1e-8))
    Q = probs.astype(np.float32).copy()
    # self-contribution: the Gaussian filter includes the centre tap with
    # pre-normalisation weight 1, which after symmetric normalisation is
    # norm_g^2 * Q; the bilateral tap grid excludes the centre entirely.
    self_g = norm_g * norm_g
    for _ in range(t):
        msg = np.zeros_like(Q)
        for c in range(C):
            qg = gauss_filter(Q[..., c] * norm_g) * norm_g \
                - self_g * Q[..., c]
            qb = bilateral_filter(Q[..., c] * norm_b) * norm_b
            msg[..., c] = compat_gaussian * qg + compat_bilateral * qb
        logit = -unary + msg
        logit -= logit.max(-1, keepdims=True)
        e = np.exp(logit)
        Q = e / e.sum(-1, keepdims=True)
    return Q


def crf_inference(img, probs, t: int = 10, scale_factor: float = 1.0,
                  labels: int = 21):
    """Reference-signature wrapper (utils/dcrf.py:6): probs (C, H, W) ->
    (C, H, W)."""
    p = np.transpose(np.asarray(probs, np.float32), (1, 2, 0))
    out = crf_inference_np(np.asarray(img), p, t=t,
                           scale_factor=scale_factor, labels=labels)
    return np.transpose(out, (2, 0, 1))


# ------------------------------------------------------------------ JAX
def crf_inference_jax(img, probs, t: int = 10,
                      sxy_gaussian: float = 3.0,
                      compat_gaussian: float = 3.0,
                      sxy_bilateral: float = 80.0, srgb: float = 13.0,
                      compat_bilateral: float = 10.0, valid_mask=None,
                      dtype=None, bilateral_stride: int = 1,
                      tap_spacing_div: float = 2.0, impl: str = "auto",
                      full_stride: int = 1, refine_iters: int = 0,
                      q_init=None):
    """Batched on-device mean-field CRF over NHWC probs.

    Same algorithm as :func:`crf_inference_np`, expressed with XLA ops
    (separable Gaussian as slice-sums, bilateral as a static tap loop /
    fused Pallas kernel).  ``valid_mask`` (B, H, W, 1) zeroes messages
    from padded pixels so padded static shapes don't bleed into the
    interior.

    Layout: the public surface is NHWC, but the whole mean field runs
    CHANNELS-MAJOR (B, C, H, W) internally.  XLA's fusions already
    handle the C=21 minor dim well for pure-XLA ops (probed NHWC ~= CM
    for the fused elementwise/softmax path), but every *Pallas* call
    needs W-minor lanes, so the NHWC loop paid a transpose pair per
    bilateral kernel invocation per iteration.  Hoisting the layout
    change to this boundary removes those: measured 5.17 -> 4.89
    ms/img for the production fs2+r1 config at the 384x512 merge
    canvas on v5e.

    ``dtype`` sets the message-passing precision (the ~80-tap bilateral
    loop is HBM-bound; bfloat16 halves its traffic).  Unary and softmax
    stay float32 — mean-field renormalises every iteration, so message
    rounding does not accumulate.  Default float32.

    ``bilateral_stride`` s > 1 evaluates the bilateral message on an
    (H/s, W/s) grid and bilinearly upsamples it: the sxy=80 kernel is
    ~40-px tap-sampled already, so the message is smooth far beyond s=2
    pixels; cost of the dominant tap loop drops ~s^2.  The fine-scale
    Gaussian (sxy 3) pairwise stays full resolution.

    ``tap_spacing_div`` sets the bilateral tap-grid density (step =
    sxy / div).  At stride 2, div=4.0 costs about the same as the
    full-resolution div=2.0 grid and tracks the exact permutohedral
    lattice closest (argmax disagreement ~1.2%, tools/crf_fidelity.py).
    Accuracy bounds: tools/crf_fidelity.py + docs/PARITY.md.

    ``full_stride`` s > 1 runs the mean field on the (H/s, W/s) grid —
    inputs box-downsampled once, both spatial sigmas divided by s (the
    reference crf_inference's ``scale_factor`` semantics,
    utils/dcrf.py:6-12), one bilinear upsample of the final Q.  Unlike
    ``bilateral_stride`` this also shrinks the fine Gaussian kernel and
    the per-iteration softmax/unary traffic, which dominate the device
    CRF once the bilateral message is strided.

    ``refine_iters`` r > 0 (with full_stride > 1) makes the schedule
    coarse-to-fine: t - r iterations at (H/s, W/s), then r final
    iterations at full resolution (full-res unary, stride-s bilateral
    message) seeded from the upsampled coarse Q — restores the boundary
    detail the coarse grid loses at a fraction of the all-full-res cost
    (per-iteration full-res traffic only for the last r iterations).

    ``q_init`` optionally seeds the mean field with a (B, H, W, C)
    distribution instead of ``probs`` (the unary stays -log probs).
    """
    import jax.numpy as jnp

    def cm(x):
        return None if x is None else jnp.transpose(x, (0, 3, 1, 2))

    q = _crf_jax_cm(cm(img), cm(probs), t=t,
                    sxy_gaussian=sxy_gaussian,
                    compat_gaussian=compat_gaussian,
                    sxy_bilateral=sxy_bilateral, srgb=srgb,
                    compat_bilateral=compat_bilateral,
                    valid_mask=cm(valid_mask), dtype=dtype,
                    bilateral_stride=bilateral_stride,
                    tap_spacing_div=tap_spacing_div, impl=impl,
                    full_stride=full_stride, refine_iters=refine_iters,
                    q_init=cm(q_init))
    return jnp.transpose(q, (0, 2, 3, 1))


def _up2_cm(x, axis: int):
    """Exact 2x half-pixel bilinear upsample along ``axis`` as
    elementwise interleaving: out[2i] = .25 x[i-1] + .75 x[i],
    out[2i+1] = .75 x[i] + .25 x[i+1] (edge-clamped) — identical to
    resize_bilinear(..., align_corners=False) at exactly 2x, without
    the matmul (which exceeded the 16 MB scoped-vmem budget inside the
    vmapped scan)."""
    import jax
    import jax.numpy as jnp

    n = x.shape[axis]
    prev = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 0, 1, axis=axis),
         jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)], axis)
    nxt = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, None, axis=axis),
         jax.lax.slice_in_dim(x, n - 1, None, axis=axis)], axis)
    even = 0.75 * x + 0.25 * prev
    odd = 0.75 * x + 0.25 * nxt
    st = jnp.stack([even, odd], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] *= 2
    return st.reshape(shape)


def _crf_jax_cm(img, probs, t, sxy_gaussian, compat_gaussian,
                sxy_bilateral, srgb, compat_bilateral, valid_mask,
                dtype, bilateral_stride, tap_spacing_div, impl,
                full_stride, refine_iters, q_init):
    """Channels-major core: img (B, 3, H, W), probs/q_init (B, C, H, W),
    valid_mask (B, 1, H, W) -> Q (B, C, H, W).  See
    :func:`crf_inference_jax` for semantics."""
    import jax
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.float32

    B, C, H, W = probs.shape

    fs = int(full_stride)
    if fs > 1:
        Hp_, Wp_ = -(-H // fs) * fs, -(-W // fs) * fs
        if valid_mask is None:
            valid_mask = jnp.ones((B, 1, H, W), jnp.float32)

        def _down(x):
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, Hp_ - H),
                             (0, Wp_ - W)))
            return xp.reshape(B, x.shape[1], Hp_ // fs, fs, Wp_ // fs,
                              fs).mean(axis=(3, 5))

        vm_s = _down(valid_mask)
        den = jnp.maximum(vm_s, 1e-8)
        img_s = _down(img.astype(jnp.float32) * valid_mask) / den
        probs_s = _down(probs.astype(jnp.float32) * valid_mask) / den
        probs_s = probs_s / jnp.maximum(
            probs_s.sum(1, keepdims=True), 1e-8)
        r = min(int(refine_iters), t)
        q = _crf_jax_cm(
            img_s, probs_s, t=t - r,
            sxy_gaussian=sxy_gaussian / fs,
            compat_gaussian=compat_gaussian,
            sxy_bilateral=sxy_bilateral / fs, srgb=srgb,
            compat_bilateral=compat_bilateral,
            valid_mask=(vm_s > 0.0).astype(jnp.float32), dtype=dtype,
            bilateral_stride=max(1, int(bilateral_stride) // fs),
            tap_spacing_div=tap_spacing_div, impl=impl, full_stride=1,
            refine_iters=0, q_init=None)
        if fs == 2:
            up = _up2_cm(_up2_cm(q, 2), 3)
        else:
            from wseg_tpu.ops.resize import resize_bilinear
            up = jnp.transpose(resize_bilinear(
                jnp.transpose(q, (0, 2, 3, 1)), (Hp_, Wp_),
                align_corners=False), (0, 3, 1, 2))
        up = up[:, :, :H, :W] * valid_mask
        if r == 0:
            return up
        up = up / jnp.maximum(up.sum(1, keepdims=True), 1e-8)
        return _crf_jax_cm(
            img, probs, t=r, sxy_gaussian=sxy_gaussian,
            compat_gaussian=compat_gaussian,
            sxy_bilateral=sxy_bilateral, srgb=srgb,
            compat_bilateral=compat_bilateral, valid_mask=valid_mask,
            dtype=dtype, bilateral_stride=bilateral_stride,
            tap_spacing_div=tap_spacing_div, impl=impl, full_stride=1,
            refine_iters=0, q_init=up)

    img_f = img.astype(jnp.float32)
    if valid_mask is None:
        valid_mask = jnp.ones((B, 1, H, W), jnp.float32)

    # --- Gaussian kernel (separable 1-D weights)
    r = int(round(2.0 * sxy_gaussian))
    x1d = np.arange(-r, r + 1, dtype=np.float32)
    k1d = np.exp(-x1d * x1d / (2.0 * sxy_gaussian * sxy_gaussian))
    k1d_j = jnp.asarray(k1d)

    # The Pallas gauss kernel (full-res rolls of a padded buffer per
    # pass) measured SLOWER than the XLA slice-sum on v5e; only the
    # bilateral tap sum benefits from the fused kernel.  ``impl``:
    #   auto   — bilateral Pallas on TPU (when the block fits VMEM),
    #            Gaussian always XLA slice-sum
    #   xla    — force XLA for both
    #   pallas — force Pallas for both (experiments only)
    gauss_pallas = impl == "pallas"

    def gauss_filter(x):  # (B, c, H, W)
        x = x * valid_mask
        if gauss_pallas:
            # fused VMEM kernel: HBM sees x once instead of once per
            # tap (ops/crf_pallas.py)
            from wseg_tpu.ops.crf_pallas import gauss_blur_pallas_cm
            return gauss_blur_pallas_cm(x, k1d, r)
        # 13-tap separable slice-sum; a depthwise-conv formulation
        # measured 3x SLOWER on v5e (feature_group_count=21 lowers to
        # tiny grouped convs the MXU can't tile)
        xp = jnp.pad(x, ((0, 0), (0, 0), (r, r), (0, 0)))
        acc = sum(k1d_j[i] * xp[:, :, i:i + H] for i in range(2 * r + 1))
        xp = jnp.pad(acc, ((0, 0), (0, 0), (0, 0), (r, r)))
        return sum(k1d_j[i] * xp[:, :, :, i:i + W]
                   for i in range(2 * r + 1))

    # --- bilateral: optionally evaluated on a strided grid
    s = int(bilateral_stride)
    if s > 1:
        Hp, Wp = -(-H // s) * s, -(-W // s) * s
        Hl, Wl = Hp // s, Wp // s

        def down(x):
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, Hp - H), (0, Wp - W)))
            return xp.reshape(B, x.shape[1], Hl, s, Wl,
                              s).mean(axis=(3, 5))

        vm_b = down(valid_mask)
        denom = jnp.maximum(vm_b, 1e-8)
        img_b = down(img_f * valid_mask) / denom
        sxy_b = sxy_bilateral / s
        Hb, Wb = Hl, Wl
    else:
        vm_b = valid_mask
        img_b = img_f
        sxy_b = sxy_bilateral
        Hb, Wb = H, W

    taps = _bilateral_taps(sxy_b, spacing_div=tap_spacing_div)
    tap_sp = [math.exp(-(dy * dy + dx * dx) / (2.0 * sxy_b * sxy_b))
              for dy, dx in taps]

    def shift(x, dy, dx):
        """Shift by (dy, dx) with zero fill, static slicing."""
        pad = ((0, 0), (0, 0), (max(0, -dy), max(0, dy)),
               (max(0, -dx), max(0, dx)))
        xp = jnp.pad(x, pad)
        return xp[:, :, max(0, dy):max(0, dy) + Hb,
                  max(0, dx):max(0, dx) + Wb]

    colour_w = []
    for (dy, dx) in taps:
        diff = img_b - shift(img_b, -dy, -dx)
        cw = jnp.exp(-jnp.sum(diff * diff, 1, keepdims=True)
                     / (2.0 * srgb * srgb))
        colour_w.append((cw * vm_b).astype(dtype))

    # Pallas fused tap sum on TPU (ops/crf_pallas.py): the XLA loop
    # materialises a shifted copy per tap (~80 HBM round trips per
    # iteration).  Falls back to XLA when the padded VMEM working set
    # would be too large (full-res sxy=80 taps) or off-TPU.
    pad_b = max(max(abs(dy), abs(dx)) for dy, dx in taps) if taps else 0
    # kernel VMEM model (ops/crf_pallas.py, per batch slot): padded Q is
    # f32 (Mosaic roll is 32-bit only), tap weights bf16, f32 out; the
    # pipeline double-buffers every block across grid steps, plus one
    # padded-plane roll temporary.  Must stay under the kernel's 100 MB
    # vmem_limit_bytes or Mosaic fails at compile time (observed with
    # the 288-tap div-4 grid: 113 MB requested).
    qp_b = C * (Hb + 2 * pad_b) * (Wb + 2 * pad_b) * 4
    w_b = len(taps) * Hb * Wb * 2
    out_b = C * Hb * Wb * 4
    vmem_est = 2 * (qp_b + w_b + out_b) + qp_b
    use_pallas = (impl == "pallas" or
                  (impl == "auto" and jax.default_backend() == "tpu"
                   and vmem_est < 90 * 1024 * 1024))
    if use_pallas:
        from wseg_tpu.ops.crf_pallas import bilateral_message_pallas_cm
        wstack = jnp.concatenate(
            [(tap_sp[k] * colour_w[k]).astype(dtype)
             for k in range(len(taps))], axis=1)

        def bilateral_filter(x):
            # note: shifts here are x(pos - d) like the XLA loop's
            # shift(x, -dy, -dx); the kernel applies +d, so negate
            return bilateral_message_pallas_cm(
                x, wstack, [(-dy, -dx) for dy, dx in taps])
    else:
        def bilateral_filter(x):
            # x arrives pre-masked and in ``dtype``; per-tap colour
            # weights already carry the valid mask
            acc = jnp.zeros(x.shape, jnp.float32)
            for k, (dy, dx) in enumerate(taps):
                acc = acc + tap_sp[k] * (
                    colour_w[k] * shift(x, -dy, -dx)).astype(jnp.float32)
            return acc

    norm_g = jax.lax.rsqrt(jnp.maximum(gauss_filter(valid_mask), 1e-20))
    norm_b = jax.lax.rsqrt(jnp.maximum(
        bilateral_filter(vm_b.astype(dtype)), 1e-20))

    if s > 1:
        def upsample(qb):
            if s == 2:
                return _up2_cm(_up2_cm(qb, 2), 3)
            from wseg_tpu.ops.resize import resize_bilinear
            return jnp.transpose(resize_bilinear(
                jnp.transpose(qb, (0, 2, 3, 1)), (Hp, Wp),
                align_corners=False), (0, 3, 1, 2))

        def bilateral_msg(Q):
            Ql = down(Q * valid_mask) / denom
            qb = bilateral_filter((Ql * norm_b).astype(dtype)) * norm_b
            up = upsample(qb)
            return up[:, :, :H, :W] * valid_mask
    else:
        def bilateral_msg(Q):
            return bilateral_filter(
                (Q * norm_b * valid_mask).astype(dtype)) * norm_b

    unary = -jnp.log(jnp.maximum(probs.astype(jnp.float32), 1e-8))
    self_g = norm_g * norm_g  # centre-tap self contribution (see numpy ver)

    def body(Q, _):
        qg = gauss_filter(Q * norm_g) * norm_g - self_g * Q
        qb = bilateral_msg(Q)
        msg = compat_gaussian * qg + compat_bilateral * qb
        Q = jax.nn.softmax(-unary + msg, axis=1)
        return Q, None

    Q0 = (q_init if q_init is not None else probs).astype(jnp.float32)
    Q, _ = jax.lax.scan(body, Q0, None, length=t)
    return Q
