"""Device-side colour jitter (brightness/contrast/saturation/hue).

The reference jitters on the host inside the torch DataLoader
(reference datasets/transforms.py:60-74, torchvision ColorJitter); at
~9 ms/sample of PIL HSV round-trips that is the single largest host
cost in the input pipeline and makes the 1-core train loop
decode-bound (docs/ROADMAP.md r3).  Here the loader only SAMPLES the
per-image jitter parameters (same rng stream as the host transform)
and the train step applies them on device, batched, between the uint8
upload and the ImageNet normalisation.

Fidelity: brightness/contrast/saturation reproduce PIL's math exactly
(blend = a + (img - a) * f with round-half-up to uint8 between ops;
grey = (19595 R + 38470 G + 7471 B + 32768) >> 16; contrast mean =
int(mean(L) + 0.5)).  Hue uses the float HSV round-trip (torchvision
tensor-mode semantics) instead of PIL's quantised uint8 HSV images, so
a hue-shifted channel can differ from the host path by PIL's internal
quantisation (~1/255 typical, bounded in tests/test_jitter.py).  The
host path (DATASET.DEVICE_JITTER: False) remains the byte-exact
reference.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

PARAM_DIM = 9  # [b, c, s, h, order0..3, applied]


def sample_colour_jitter(rng: np.random.RandomState, p: float = 0.5,
                         brightness: float = 0.3, contrast: float = 0.3,
                         saturation: float = 0.3,
                         hue: float = 0.1) -> np.ndarray:
    """Draw per-image jitter params — identical rng stream to
    transforms.MaskColourJitter.__call__ (early-exit on the p draw
    included) so host- and device-jitter runs consume the same random
    sequence."""
    out = np.array([1.0, 1.0, 1.0, 0.0, 0, 1, 2, 3, 0.0], np.float32)
    if rng.rand() >= p:
        return out
    out[0] = rng.uniform(1 - brightness, 1 + brightness)
    out[1] = rng.uniform(1 - contrast, 1 + contrast)
    out[2] = rng.uniform(1 - saturation, 1 + saturation)
    out[3] = rng.uniform(-hue, hue)
    out[4:8] = rng.permutation(4).astype(np.float32)
    out[8] = 1.0
    return out


def _trunc_u8(x):
    """PIL ImagingBlend quantisation: truncation, clipped to u8."""
    return jnp.clip(jnp.floor(x), 0.0, 255.0)


def _grey(img):
    """PIL L-mode conversion of an integer-valued RGB float image."""
    l24 = (img[..., 0] * 19595.0 + img[..., 1] * 38470.0 +
           img[..., 2] * 7471.0 + 32768.0)
    return jnp.floor(l24 / 65536.0)


def _adjust_hue(img, factor):
    """Hue rotation through PIL's QUANTISED uint8 HSV planes.

    Mirrors transforms._adjust_hue: convert("HSV") truncates h and s to
    uint8 (libImaging rgb2hsv), the shift adds round(factor * 255) mod
    256 on the integer h plane, and hsv2rgb rebuilds RGB with
    round-half-up p/q/t (libImaging hsv2rgb, "following colorsys").
    ``img``: integer-valued f32 (B, H, W, 3).
    """
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    cr = maxc - minc
    ok = cr > 0.5  # integer-valued: minc != maxc
    crs = jnp.where(ok, cr, 1.0)
    rc = (maxc - r) / crs
    gc = (maxc - g) / crs
    bc = (maxc - b) / crs
    h = jnp.where(
        maxc == r, bc - gc,
        jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0 + 1.0) % 1.0
    uh = jnp.where(ok, jnp.floor(h * 255.0), 0.0)
    us = jnp.where(ok, jnp.floor(cr / maxc * 255.0), 0.0)

    shift = jnp.round(factor * 255.0)
    uh = (uh + shift) % 256.0

    uh6 = uh * 6.0
    i = jnp.floor(uh6 / 255.0)
    f = (uh6 - 255.0 * i) / 255.0
    fs = us / 255.0
    p_ = jnp.floor(v * (1.0 - fs) + 0.5)
    q = jnp.floor(v * (1.0 - fs * f) + 0.5)
    t = jnp.floor(v * (1.0 - fs * (1.0 - f)) + 0.5)
    i = i.astype(jnp.int32) % 6
    r2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [v, q, p_, p_, t, v])
    g2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [t, v, v, q, p_, p_])
    b2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [p_, p_, t, v, v, q])
    out = jnp.stack([r2, g2, b2], axis=-1)
    grey3 = jnp.repeat(v[..., None], 3, axis=-1)
    return jnp.where((us < 0.5)[..., None], grey3, out)


def apply_colour_jitter(img: jnp.ndarray, params: jnp.ndarray):
    """Apply sampled jitter on device.

    ``img``: (B, H, W, 3) float32 in [0, 255] with integer values (the
    raw uint8 upload).  ``params``: (B, 9) float32 from
    sample_colour_jitter.  Returns integer-valued float32 in [0, 255].
    """
    bfac = params[:, 0][:, None, None, None]
    cfac = params[:, 1][:, None, None, None]
    sfac = params[:, 2][:, None, None, None]
    hfac = params[:, 3][:, None, None]
    order = params[:, 4:8].astype(jnp.int32)
    applied = params[:, 8][:, None, None, None]

    out = img
    for pos in range(4):
        k = order[:, pos][:, None, None, None]
        grey = _grey(out)[..., None]
        # contrast blends toward int(mean(L) + 0.5) of the CURRENT image
        mean = jnp.floor(jnp.mean(grey, axis=(1, 2, 3)) +
                         0.5)[:, None, None, None]
        cand_b = _trunc_u8(out * bfac)
        cand_c = _trunc_u8(mean + (out - mean) * cfac)
        cand_s = _trunc_u8(grey + (out - grey) * sfac)
        # host _adjust_hue early-exits on a tiny factor; mirror it so a
        # zero-hue draw is byte-exact (the float HSV round-trip is not;
        # it also rounds-half-up rather than truncating — nearest is
        # closer to PIL's integer HSV images)
        cand_h = jnp.where(
            jnp.abs(hfac[..., None]) < 1e-8, out,
            jnp.clip(jnp.floor(_adjust_hue(out, hfac) + 0.5), 0.0,
                     255.0))
        out = jnp.where(k == 0, cand_b,
                        jnp.where(k == 1, cand_c,
                                  jnp.where(k == 2, cand_s, cand_h)))
    return jnp.where(applied > 0.5, out, img)
