#!/usr/bin/env python
"""Quantify the device-CRF approximation against the exact permutohedral
CRF (VERDICT r2 task 7).

The fast infer_val path refines masks with the sparse-tap XLA mean-field
CRF (wseg_tpu/ops/crf.py) in bfloat16 and, optionally, with the
bilateral message evaluated on an H/2 grid (TEST.CRF_STRIDE).  The
reference runs pydensecrf's exact permutohedral bilateral
(reference utils/dcrf.py:6-21).  This tool measures, on synthetic
natural-image-like inputs (piecewise-smooth regions + texture noise +
CAM-like soft unaries), how far each approximation strays from the
exact lattice CRF (native/densecrf):

  * argmax disagreement vs the exact CRF (fraction of pixels)
  * mIoU vs ground truth for every variant (does the approximation
    cost segmentation quality, which is what the +CRF mIoU claim rides
    on)

Run on CPU: ``WSEG_PLATFORM=cpu python tools/crf_fidelity.py``.
Results are recorded in docs/PARITY.md; tests/test_crf_fidelity.py
pins regression bounds on a smaller configuration.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _smooth_noise(rng, h, w, sigma):
    """Low-frequency field: blurred white noise (separable box-ish)."""
    from scipy.ndimage import gaussian_filter
    return gaussian_filter(rng.randn(h, w), sigma, mode="reflect")


def make_scene(rng, h=192, w=256, n_classes=6, unary_blur=6.0):
    """Piecewise-smooth scene + CAM-like soft probabilities.

    GT regions come from the argmax of ``n_classes`` smooth random
    fields (blob-shaped regions with curved boundaries, like object
    segments).  The image gives each region a base colour plus texture
    noise and a global illumination gradient.  The unary is the GT
    one-hot degraded by heavy blur + logit noise — mimicking the soft,
    boundary-sloppy score maps a CAM model produces (which is exactly
    where the CRF has work to do).
    """
    from scipy.ndimage import gaussian_filter

    fields = np.stack([_smooth_noise(rng, h, w, 24.0)
                       for _ in range(n_classes)])
    gt = np.argmax(fields, axis=0)

    base = rng.rand(n_classes, 3) * 200 + 25
    img = base[gt]
    img += rng.randn(h, w, 3) * 12.0  # texture
    ramp = np.linspace(-20, 20, w)[None, :, None]
    img = np.clip(img + ramp, 0, 255).astype(np.uint8)

    onehot = np.eye(n_classes, dtype=np.float32)[gt]
    logits = gaussian_filter(onehot * 4.0, (unary_blur, unary_blur, 0))
    logits += rng.randn(h, w, n_classes).astype(np.float32) * 0.5
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    return img, probs.astype(np.float32), gt


def miou(pred, gt, n_classes):
    ious = []
    for c in range(n_classes):
        inter = np.sum((pred == c) & (gt == c))
        union = np.sum((pred == c) | (gt == c))
        if union:
            ious.append(inter / union)
    return float(np.mean(ious))


def main(n_scenes=8, t=10, seed=0, h=192, w=256):
    os.environ.setdefault("WSEG_PLATFORM", "cpu")
    import jax.numpy as jnp

    from wseg_tpu.ops.crf import crf_inference_jax, crf_inference_np
    from wseg_tpu.ops.crf_native import crf_inference_native

    rng = np.random.RandomState(seed)
    variants = {
        "xla_f32": dict(dtype=jnp.float32, bilateral_stride=1),
        "xla_bf16": dict(dtype=jnp.bfloat16, bilateral_stride=1),
        "xla_bf16_s2": dict(dtype=jnp.bfloat16, bilateral_stride=2),
        "xla_bf16_s2_d4": dict(dtype=jnp.bfloat16, bilateral_stride=2,
                               tap_spacing_div=4.0),
        "xla_bf16_s4": dict(dtype=jnp.bfloat16, bilateral_stride=4),
        "xla_bf16_fs2": dict(dtype=jnp.bfloat16, full_stride=2),
        "xla_bf16_fs2_r1": dict(dtype=jnp.bfloat16, full_stride=2,
                                bilateral_stride=2, refine_iters=1),
        "xla_bf16_fs2_r2": dict(dtype=jnp.bfloat16, full_stride=2,
                                bilateral_stride=2, refine_iters=2),
        "xla_bf16_fs2_r3": dict(dtype=jnp.bfloat16, full_stride=2,
                                bilateral_stride=2, refine_iters=3),
        "xla_bf16_fs2_d4": dict(dtype=jnp.bfloat16, full_stride=2,
                                tap_spacing_div=4.0),
        "xla_f32_fs2_d4": dict(dtype=jnp.float32, full_stride=2,
                               tap_spacing_div=4.0),
    }
    stats = {k: {"dis": [], "miou": []} for k in
             ["unary", "native", "numpy", *variants]}
    times = {k: 0.0 for k in ["native", "numpy", *variants]}

    for si in range(n_scenes):
        img, probs, gt = make_scene(rng, h=h, w=w)
        nc = probs.shape[-1]
        stats["unary"]["miou"].append(miou(np.argmax(probs, -1), gt, nc))
        stats["unary"]["dis"].append(np.nan)

        t0 = time.perf_counter()
        exact = crf_inference_native(img, probs, t=t)
        times["native"] += time.perf_counter() - t0
        exact_map = np.argmax(exact, -1)
        stats["native"]["dis"].append(0.0)
        stats["native"]["miou"].append(miou(exact_map, gt, nc))

        t0 = time.perf_counter()
        approx = crf_inference_np(img, probs, t=t)
        times["numpy"] += time.perf_counter() - t0
        m = np.argmax(approx, -1)
        stats["numpy"]["dis"].append(float((m != exact_map).mean()))
        stats["numpy"]["miou"].append(miou(m, gt, nc))

        for name, kw in variants.items():
            t0 = time.perf_counter()
            q = np.asarray(crf_inference_jax(
                img[None].astype(np.float32), probs[None], t=t, **kw))[0]
            times[name] += time.perf_counter() - t0
            m = np.argmax(q, -1)
            stats[name]["dis"].append(float((m != exact_map).mean()))
            stats[name]["miou"].append(miou(m, gt, nc))

    out = {}
    for k, v in stats.items():
        out[k] = {
            "argmax_disagreement_vs_native":
                None if np.isnan(v["dis"]).any()
                else round(float(np.mean(v["dis"])), 4),
            "miou_vs_gt": round(float(np.mean(v["miou"])), 4),
        }
        if k in times:
            out[k]["sec_per_scene"] = round(times[k] / n_scenes, 3)
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    # args: [n_scenes] [h] [w]  (production merge canvas: 2 384 512)
    a = sys.argv[1:]
    main(n_scenes=int(a[0]) if a else 8,
         h=int(a[1]) if len(a) > 1 else 192,
         w=int(a[2]) if len(a) > 2 else 256)
