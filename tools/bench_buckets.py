#!/usr/bin/env python
"""Per-bucket forward roofline for the headline bench (VERDICT r3 task 3).

For each scale bucket of the bench geometry (512x384 image, scales
[1, 0.5, 1.5, 2.0] + flip, batch 8 images), measures steady-state time
of the bucket's forward program on the real chip, its analytic FLOPs,
and the implied MXU utilisation vs v5e bf16 peak.  Also measures the
same buckets at PAD_ALIGN=64 (tighter padding on the 0.5x and 1.5x
buckets) and a variant that batches the two small buckets' views into
one program.

Timing rule for the relayed chip (CLAUDE.md): dispatch n back-to-back
program runs chained through a checksum and fetch ONE scalar.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

V5E_BF16_PEAK = 394e12 / 2  # 197 TFLOP/s per chip


def wrn38_forward_flops(h: int, w: int, n: int) -> float:
    """Exact analytic forward MXU FLOPs of WRN38 stride-8 + the
    CAM_CASA_WGAP_tf head for an (n, h, w, 3) input: 2*K*K*Cin*Cout per
    conv output element, summed over the exact conv inventory of
    models/backbones/resnet38.py (ResBlock = 3x3 in->mid + 3x3 mid->out
    [+ 1x1 proj when shape changes]; ResBlockBot = 1x1/3x3/1x1 + proj)
    plus fc7/qkv/attn/fc8 of models/stage_net.py.  Elementwise work (BN,
    relu, softmax, mask rescale) is excluded — this is the MXU roofline
    numerator."""
    a0, a1, a2, a3 = h * w, h * w // 4, h * w // 16, h * w // 64

    def c(cin, cout, k, area):
        return 2.0 * k * k * cin * cout * area

    f = c(3, 64, 3, a0)                                    # conv1a
    f += c(64, 128, 3, a1) + c(128, 128, 3, a1) \
        + c(64, 128, 1, a1)                                # b2 + proj
    f += (c(128, 128, 3, a1) * 2) * 2                      # b2_1, b2_2
    f += c(128, 256, 3, a2) + c(256, 256, 3, a2) \
        + c(128, 256, 1, a2)                               # b3 + proj
    f += (c(256, 256, 3, a2) * 2) * 2                      # b3_1, b3_2
    f += c(256, 512, 3, a3) + c(512, 512, 3, a3) \
        + c(256, 512, 1, a3)                               # b4 + proj
    f += (c(512, 512, 3, a3) * 2) * 5                      # b4_1..b4_5
    # b5: 512 -> mid 512 -> out 1024 + proj; b5_1/2: 1024 -> 512 -> 1024
    f += c(512, 512, 3, a3) + c(512, 1024, 3, a3) + c(512, 1024, 1, a3)
    f += (c(1024, 512, 3, a3) + c(512, 1024, 3, a3)) * 2
    # b6 bottleneck: 1024 -> 512 -> 1024(3x3 d4) -> 2048 + proj
    f += c(1024, 512, 1, a3) + c(512, 1024, 3, a3) \
        + c(1024, 2048, 1, a3) + c(1024, 2048, 1, a3)
    # b7 bottleneck: 2048 -> 1024 -> 2048(3x3 d4) -> 4096 + proj
    f += c(2048, 1024, 1, a3) + c(1024, 2048, 3, a3) \
        + c(2048, 4096, 1, a3) + c(2048, 4096, 1, a3)
    # head: fc7 4096->1024, window-attn qkv 1024->3*1024 + QK^T/AV
    # (ws=2: 4 px/window), proj 1024->21, fc8 1024->21
    f += c(4096, 1024, 1, a3) + c(1024, 3 * 1024, 1, a3)
    f += 2.0 * 2 * (4 * 1024) * a3                         # QK^T + AV
    f += c(1024, 21, 1, a3) + c(1024, 21, 1, a3)
    return f * n


def measure(fwd, variables, batch, n=8):
    import jax

    _, _, chk = fwd(variables, batch)
    float(chk)  # compile + settle
    t0 = time.perf_counter()
    for _ in range(n):
        _, _, chk = fwd(variables, batch)
    float(chk)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from wseg_tpu.config import cfg, reset_cfg
    from wseg_tpu.engine.train_loop import init_test_variables
    from wseg_tpu.models import get_model

    reset_cfg()
    cfg.NET.MODEL = "CAM_CASA_WGAP_tf"
    cfg.NET.BACKBONE = "resnet38"
    # WSEG_BUCKET_DTYPE=int8 benches the w8a8-quantized backbone mode
    cfg.NET.DTYPE = os.environ.get("WSEG_BUCKET_DTYPE", "bfloat16")
    model = get_model(cfg.NET, num_classes=21)
    rng = jax.random.PRNGKey(0)
    variables = init_test_variables(model, rng, (1, 128, 128, 3))

    @jax.jit
    def fwd(v, x):
        out = model.apply(v, x, train=False)
        chk = out.cls.astype(jnp.float32).sum() + \
            out.masks.astype(jnp.float32).sum()
        return out.cls, out.masks, chk

    base_hw = (384, 512)
    scales = [1.0, 0.5, 1.5, 2.0]
    # WSEG_BUCKET_IMGS: images per batch (2x views with flip); 16 checks
    # whether the serving-batch-16 path lifts per-bucket MXU.
    # WSEG_BUCKET_ALIGNS: comma list (default "128,64").
    imgs = int(os.environ.get("WSEG_BUCKET_IMGS", "8"))
    aligns = tuple(int(a) for a in os.environ.get(
        "WSEG_BUCKET_ALIGNS", "128,64").split(","))
    host = np.random.RandomState(0)

    results = {}
    for align in aligns:
        total_t = 0.0
        total_f = 0.0
        per = {}
        for s in scales:
            h = int(np.ceil(base_hw[0] * s / align) * align)
            w = int(np.ceil(base_hw[1] * s / align) * align)
            batch = jnp.asarray(host.rand(2 * imgs, h, w, 3), jnp.float32)
            dt = measure(fwd, variables, batch)
            fl = wrn38_forward_flops(h, w, 2 * imgs)
            per[f"{s}x({h}x{w})"] = {
                "ms": round(dt * 1000, 1),
                "tflop": round(fl / 1e12, 2),
                "tflops": round(fl / dt / 1e12, 1),
                "mxu": round(fl / dt / V5E_BF16_PEAK, 3),
            }
            total_t += dt
            total_f += fl
        per["TOTAL"] = {
            "ms": round(total_t * 1000, 1),
            "img_per_sec": round(imgs / total_t, 2),
            "tflops": round(total_f / total_t / 1e12, 1),
            "mxu": round(total_f / total_t / V5E_BF16_PEAK, 3),
        }
        results[f"align{align}"] = per
        print(json.dumps({f"align{align}": per}), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
    import os
    os._exit(0)
