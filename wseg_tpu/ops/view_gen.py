"""Device-side multi-scale view generation (resize / flip / pad on TPU).

Replaces the host PIL work of ``MultiscaleViews.build`` (reference
``datasets/pascal_voc_ms.py:126-155``: per-view cubic resize, hflip,
centre zero-pad) with one XLA program per (original-canvas, view-canvas)
shape pair.  The original image is uploaded ONCE as uint8 (~1/num_views
of the per-view upload volume — the host->device link is the e2e
inference bottleneck on remote-attached chips) and every scale/flip view
is produced on device as a pair of window-to-window cubic resampling
matmuls, which the MXU does for free next to the model forward.

Semantics match PIL ``resize(..., BICUBIC)``: Keys cubic kernel
(a = -0.5), half-pixel sampling over the source window, kernel support
scaled by the downscale factor (antialias), edge weights cropped to the
window and renormalised.  PIL computes with 8-bit fixed-point
coefficients and rounds each view to uint8; this path keeps float32, so
individual pixels may differ by ~1-2/255 (bounded by the golden test
``tests/test_view_gen.py``).

Window parameters are TRACED (broadcasted-iota matrices), so one program
serves every image geometry that shares the canvas shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _cubic_kernel(x, a: float = -0.5):
    """Keys bicubic kernel (PIL BICUBIC / torch 'bicubic', a=-0.5)."""
    ax = jnp.abs(x)
    return jnp.where(
        ax <= 1.0, ((a + 2.0) * ax - (a + 3.0)) * ax * ax + 1.0,
        jnp.where(ax < 2.0,
                  a * (((ax - 5.0) * ax + 8.0) * ax - 4.0),
                  0.0))


def cubic_matrix(dst_n: int, src_n: int, dst_start, dst_len, src_start,
                 src_len, flip=False):
    """(dst_n, src_n) cubic-resampling matrix with traced windows.

    Maps the src window [src_start, src_start+src_len) onto the dst
    window [dst_start, dst_start+dst_len) with PIL resize semantics:
    half-pixel sampling, antialias kernel scaling on downscale, edge
    crop + renormalise.  Rows outside the dst window (and src columns
    outside the src window) get zero weight, so padding comes out 0.
    ``flip`` mirrors the sampling in src coordinates (= PIL transpose of
    the resized view).
    """
    dst_start = jnp.float32(dst_start)
    dst_len = jnp.float32(dst_len)
    src_start = jnp.float32(src_start)
    src_len = jnp.float32(src_len)
    i = jax.lax.broadcasted_iota(jnp.float32, (dst_n, 1), 0)
    j = jax.lax.broadcasted_iota(jnp.float32, (1, src_n), 1)
    y = (i - dst_start + 0.5) * (src_len / dst_len) - 0.5
    y = jnp.where(flip, src_len - 1.0 - y, y)
    y = y + src_start
    # antialias: stretch the kernel by the downscale factor
    f = jnp.minimum(1.0, dst_len / src_len)
    w = _cubic_kernel((y - j) * f) * f
    inside_src = (j >= src_start) & (j < src_start + src_len)
    inside_dst = (i >= dst_start) & (i < dst_start + dst_len)
    w = jnp.where(inside_src & inside_dst, w, 0.0)
    s = jnp.sum(w, axis=1, keepdims=True)
    return w / jnp.maximum(s, 1e-8)


def resize_window_cubic(img, src_win, dst_win, dst_hw, flip=False):
    """Cubic-resample ``img``'s src window into a (dst_h, dst_w) canvas.

    Args:
      img: (Hs, Ws, C) float32 source canvas.
      src_win / dst_win: (4,) (top, left, h, w), traced.
      dst_hw: static (dst_h, dst_w).
      flip: traced bool — mirror horizontally within the window.
    Returns:
      (dst_h, dst_w, C) float32; zero outside the dst window.
    """
    hs, ws, _ = img.shape
    A_h = cubic_matrix(dst_hw[0], hs, dst_win[0], dst_win[2],
                       src_win[0], src_win[2], False)
    A_w = cubic_matrix(dst_hw[1], ws, dst_win[1], dst_win[3],
                       src_win[1], src_win[3], flip)
    out = jnp.einsum("oh,hwc->owc", A_h, img,
                     preferred_element_type=jnp.float32)
    return jnp.einsum("pw,owc->opc", A_w, out,
                      preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("out_hw", "flip_pair",
                                             "round_u8"))
def build_views_u8(orig_u8, owin, vwin, *, out_hw, flip_pair=True,
                   round_u8=True):
    """uint8 original canvases -> one scale's view canvases, on device.

    Args:
      orig_u8: (B, Hc, Wc, 3) uint8 originals, zero-padded into a canvas.
      owin: (B, 4) int (top, left, h, w) original-pixel windows.
      vwin: (B, 4) int view windows inside the (out_h, out_w) canvas
        (the centre placement computed by the host, reference
        ``pascal_voc_ms.py:150``).
      out_hw: static (out_h, out_w) view canvas.
      flip_pair: emit [view, flipped] per image (reference view order).
      round_u8: round each view to uint8 like PIL before normalising
        (bit-compat with the uint8-transfer host path).
    Returns:
      (B*2 if flip_pair else B, out_h, out_w, 3) uint8 views, zeroed
      padding, ready for the ``device_norm`` forward.
    """
    img = orig_u8.astype(jnp.float32)
    owin = owin.astype(jnp.float32)
    vwin = vwin.astype(jnp.float32)

    def one(im, ow, vw, flip):
        v = resize_window_cubic(im, ow, vw, out_hw, flip)
        v = jnp.clip(v, 0.0, 255.0)
        if round_u8:
            v = jnp.round(v)
        return v.astype(jnp.uint8)

    if flip_pair:
        flips = jnp.asarray([False, True])
        vs = jax.vmap(
            lambda im, ow, vw: jax.vmap(
                lambda f: one(im, ow, vw, f))(flips)
        )(img, owin, vwin)
        b, two, h, w, c = vs.shape
        return vs.reshape(b * two, h, w, c)
    return jax.vmap(lambda im, ow, vw: one(im, ow, vw, False))(
        img, owin, vwin)
