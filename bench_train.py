#!/usr/bin/env python
"""Secondary benchmark: flagship training-step throughput (img/s/chip).

WRN38 + CAM_CASA_WGAP_tf, batch 8, crop 384 (configs/voc_resnet38.yaml),
bf16 compute, Pallas PAMR.  Prints one JSON line like bench.py; bench.py
also calls :func:`measure_train_step` so the driver's BENCH_r{N}.json
records train numbers (VERDICT r2 task 4).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def measure_train_step(bs: int, crop: int = 384, n: int = 10):
    """Returns (step_ms, imgs_per_sec) for the flagship train step.

    Steady state: dispatch ``n`` steps back-to-back (each chains on the
    previous state on device) and fetch ONE final loss — matching the
    trainer, which batches metric fetches every LOG_EVERY steps.  A
    per-step fetch would add the ~30 ms relay round trip to every step.
    """
    import jax
    import jax.numpy as jnp

    from wseg_tpu.config import cfg, reset_cfg
    from wseg_tpu.engine.train_loop import (
        create_train_state,
        init_variables,
        make_train_step,
    )
    from wseg_tpu.models import get_model
    from wseg_tpu.parallel import make_optimizer

    reset_cfg()
    cfg.NET.MODEL = "CAM_CASA_WGAP_tf"
    cfg.NET.BACKBONE = "resnet38"
    cfg.NET.DTYPE = "bfloat16"
    cfg.NET.PAMR_IMPL = "auto"

    model = get_model(cfg.NET, num_classes=21)
    rng = jax.random.PRNGKey(0)
    host = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(host.rand(bs, crop, crop, 3), jnp.float32),
        "labels": jnp.ones((bs, 20), jnp.float32),
    }
    variables = init_variables(model, rng, batch)
    tx, _ = make_optimizer(cfg.NET, "resnet38", variables["params"])
    state = create_train_state(model, tx, rng, batch, variables=variables)
    step = make_train_step(model, tx)

    state, metrics = step(state, batch, rng, jnp.asarray(1.0))
    float(metrics["loss"])  # force compile + first run

    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step(state, batch, rng, jnp.asarray(1.0))
    final = float(metrics["loss"])  # forces the whole chain to complete
    dt = (time.perf_counter() - t0) / n
    assert np.isfinite(final)
    return dt * 1000.0, bs / dt


def measure_seam_step(bs: int, crop: int = 384, n: int = 10):
    """(step_ms, imgs_per_sec) for the SEAM train step (two forwards +
    ER loss, reference train_SEAM.py:100-129), flagship config, both
    phase losses active (mask_loss_on = er_on = 1)."""
    import jax
    import jax.numpy as jnp

    from wseg_tpu.config import cfg, reset_cfg
    from wseg_tpu.engine.seam import make_seam_train_step
    from wseg_tpu.engine.train_loop import create_train_state, init_variables
    from wseg_tpu.models import get_model
    from wseg_tpu.parallel import make_optimizer

    reset_cfg()
    cfg.NET.MODEL = "CAM_CASA_WGAP_tf"
    cfg.NET.BACKBONE = "resnet38"
    cfg.NET.DTYPE = "bfloat16"
    cfg.NET.PAMR_IMPL = "auto"
    # Bench LR 0: with ER force-enabled from step 0 on random init/data
    # the raw-logit L1 term diverges within a few steps even at LR 1e-5
    # (in the real schedule ER activates after PRETRAIN+5 epochs on a
    # trained net).  Step COST is LR-independent — scale(-0.0) performs
    # the same optimizer arithmetic — and frozen params keep the chained
    # losses finite so the guard below means something.
    cfg.NET.LR = 0.0

    model = get_model(cfg.NET, num_classes=21)
    rng = jax.random.PRNGKey(0)
    host = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(host.rand(bs, crop, crop, 3), jnp.float32),
        "labels": jnp.ones((bs, 20), jnp.float32),
    }
    variables = init_variables(model, rng, batch)
    tx, _ = make_optimizer(cfg.NET, "resnet38", variables["params"])
    state = create_train_state(model, tx, rng, batch, variables=variables)
    step = make_seam_train_step(model, tx)
    on = jnp.asarray(1.0)

    state, metrics = step(state, batch, rng, on, on)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step(state, batch, rng, on, on)
    final = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / n
    assert np.isfinite(final)
    return dt * 1000.0, bs / dt


def measure_train_epoch(bs: int = 8, crop: int = 384,
                        n_steps: int = 100, n_imgs: int = 256):
    """Sustained live-loop throughput: real input pipeline (on-disk
    JPEG decode + augment + device jitter) feeding the jitted train
    step, >= ``n_steps`` steady-state (VERDICT r3 task 2).  This is the
    honest analogue of the reference's measured Im/Sec
    (/root/reference/train.py:206), where the synthetic-batch
    measure_train_step is the device-only bound.

    Returns (imgs_per_sec, split) where ``split`` attributes the
    steady-state wall time in ms/step to load (waiting on the input
    pipeline), put (host->device conversion) and dispatch (the step
    call, which blocks only when the device queue back-pressures) —
    the diagnosable breakdown VERDICT r4 task 6 requires in the bench
    artifact."""
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from wseg_tpu.config import cfg, reset_cfg
    from wseg_tpu.data import get_dataloader
    from wseg_tpu.engine.train_loop import (
        create_train_state,
        init_variables,
        make_train_step,
    )
    from wseg_tpu.models import get_model
    from wseg_tpu.parallel import make_optimizer

    reset_cfg()
    cfg.NET.MODEL = "CAM_CASA_WGAP_tf"
    cfg.NET.BACKBONE = "resnet38"
    cfg.NET.DTYPE = "bfloat16"
    cfg.NET.PAMR_IMPL = "auto"
    cfg.DATASET.CROP_SIZE = crop
    cfg.TRAIN.BATCH_SIZE = bs
    # LR 0 so the 100-step chain on random init + noise images cannot
    # diverge and trip the finite-loss guard (same rationale as the
    # SEAM bench); the optimizer arithmetic and step cost are identical
    cfg.NET.LR = 0.0

    # on-disk synthetic VOC at the real 500x375 geometry so JPEG decode
    # cost is representative
    root = tempfile.mkdtemp(prefix="wseg_epoch_bench_")
    os.makedirs(f"{root}/img")
    os.makedirs(f"{root}/m")
    host = np.random.RandomState(0)
    lines = []
    for i in range(n_imgs):
        n = f"2007_{i:06d}"
        Image.fromarray((host.rand(375, 500, 3) * 255).astype(
            np.uint8)).save(f"{root}/img/{n}.jpg", quality=90)
        Image.fromarray(host.randint(0, 21, (375, 500)).astype(
            np.uint8)).save(f"{root}/m/{n}.png")
        lines.append(f"/img/{n}.jpg /m/{n}.png\n")
    with open(f"{root}/train_bench.txt", "w") as f:
        f.writelines(lines)
    cfg.DATASET.ROOT = root

    class _Args:
        random_seed = 0
        workers = int(os.environ.get("WSEG_EPOCH_WORKERS", "4"))

    loader = get_dataloader(_Args(), cfg, "train_bench")

    model = get_model(cfg.NET, num_classes=21)
    rng = jax.random.PRNGKey(0)
    init_batch = {
        "image": jnp.asarray(host.rand(bs, crop, crop, 3), jnp.float32),
        "labels": jnp.ones((bs, 20), jnp.float32),
    }
    variables = init_variables(model, rng, init_batch)
    tx, _ = make_optimizer(cfg.NET, "resnet38", variables["params"])
    state = create_train_state(model, tx, rng, init_batch,
                               variables=variables)
    step = make_train_step(model, tx)
    on = jnp.asarray(1.0)
    log_every = 50

    def step_batch(b):
        out = {"image": jnp.asarray(b["image"]),
               "labels": jnp.asarray(b["labels"])}
        if "jitter" in b:
            out["jitter"] = jnp.asarray(b["jitter"])
        return out

    try:
        # warmup: compile both the uint8+jitter program and run 2 steps
        it = iter(loader)
        for _ in range(2):
            state, metrics = step(state, step_batch(next(it)), rng, on)
        float(metrics["loss"])
        for _ in it:   # drain the epoch so the next one starts clean
            pass

        done = 0
        t_load = t_put = t_disp = 0.0
        t0 = time.perf_counter()
        while done < n_steps:
            it = iter(loader)
            while done < n_steps:
                ta = time.perf_counter()
                try:
                    b = next(it)
                except StopIteration:
                    break
                tb = time.perf_counter()
                db = step_batch(b)
                tc = time.perf_counter()
                state, metrics = step(state, db, rng, on)
                td = time.perf_counter()
                t_load += tb - ta
                t_put += tc - tb
                t_disp += td - tc
                done += 1
                if done % log_every == 0:
                    # trainer fetches metrics every LOG_EVERY steps
                    assert np.isfinite(float(metrics["loss"]))
        float(metrics["loss"])  # final barrier
        dt = time.perf_counter() - t0
    finally:
        shutil.rmtree(root, ignore_errors=True)
    split = {
        "load_ms_per_step": round(t_load / n_steps * 1000.0, 1),
        "put_ms_per_step": round(t_put / n_steps * 1000.0, 1),
        "dispatch_ms_per_step": round(t_disp / n_steps * 1000.0, 1),
        # the final-barrier tail (device work still in flight when the
        # host loop finishes) shows up here
        "other_ms_per_step": round(
            (dt - t_load - t_put - t_disp) / n_steps * 1000.0, 1),
    }
    return bs * n_steps / dt, split


def main():
    bs = int(os.environ.get("WSEG_BENCH_BS", "8"))
    crop = int(os.environ.get("WSEG_BENCH_CROP", "384"))
    step_ms, ips = measure_train_step(bs, crop)
    print(json.dumps({
        "metric": "flagship_train_step_images_per_sec_per_chip",
        "value": round(ips, 3),
        "unit": "img/s",
        "step_ms": round(step_ms, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
