"""Epoch-level training driver (the reference DecTrainer, train.py:73-343).

Responsibilities: data loaders, model/optimizer construction, the
train-epoch / validation / checkpoint-best cycle, TensorBoard scalars, and
stdout loss lines every 10 steps with Im/Sec throughput.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from wseg_tpu.config import cfg
from wseg_tpu.data import get_dataloader
from wseg_tpu.engine.train_loop import (
    create_train_state,
    make_eval_step,
    make_train_step,
)
from wseg_tpu.models import get_model
from wseg_tpu.parallel import make_mesh, make_optimizer, replicate
from wseg_tpu.utils.checkpoints import Checkpoint, make_suffix, parse_suffix
from wseg_tpu.utils.metrics import average_precision
from wseg_tpu.utils.stat_manager import StatManager
from wseg_tpu.utils.timer import Timer


class MetricBuffer:
    """Keeps per-step metric dicts ON DEVICE and fetches them in one
    stacked transfer per flush.

    A ``float(v)`` per metric per step stalls the dispatch pipeline on
    every step (the host<->device RTT on a relay-attached chip is ~30 ms
    — larger than the step itself); ``jax.device_get`` on a raw list is
    no better, it issues one fetch per scalar leaf.  Used by
    train_epoch, validation and the SEAM loop.
    """

    def __init__(self, stat: Optional[StatManager] = None):
        self.stat = stat
        self.pending = []
        self.extra = []  # optional per-step device arrays (e.g. cls)
        self.last = None
        self.extra_rows = []

    def append(self, metrics, extra=None):
        self.pending.append(metrics)
        if extra is not None:
            self.extra.append(extra)

    def flush(self):
        """One stacked scalar transfer (+ one concat transfer for any
        ``extra`` arrays); returns the most recent metrics row."""
        if not self.pending:
            return self.last
        keys = sorted(self.pending[0])
        flat = jnp.stack([m[k] for m in self.pending for k in keys])
        vals = np.asarray(jax.device_get(flat), np.float32)
        for j in range(len(self.pending)):
            row = {k: float(vals[j * len(keys) + i])
                   for i, k in enumerate(keys)}
            if self.stat is not None:
                for k, v in row.items():
                    self.stat.update_stats(k, v)
            self.last = row
        self.pending.clear()
        if self.extra:
            cat = jnp.concatenate(self.extra, axis=0)
            self.extra_rows.append(np.asarray(jax.device_get(cat)))
            self.extra.clear()
        return self.last


class DecTrainer:
    def __init__(self, args):
        self.args = args
        self.start_epoch = getattr(args, "start_epoch", 0)

        self.trainloader = get_dataloader(args, cfg, cfg.DATASET.FILENAME)
        self.valloader = get_dataloader(args, cfg, "val_voc")
        self.nclass = 21

        if str(getattr(cfg.NET, "DTYPE", "")) == "int8":
            # round() in the quantized convs has zero gradient: the head
            # would learn while the backbone silently receives nothing
            raise ValueError(
                "NET.DTYPE 'int8' is inference-only (w8a8 convs are not "
                "differentiable); train with 'bfloat16' or 'float32'")
        self.model = get_model(cfg.NET, num_classes=self.nclass)

        rng = jax.random.PRNGKey(getattr(args, "random_seed", 64))
        self.rng = rng

        # build a sample batch for init (jitted init; see train_loop)
        crop = int(cfg.DATASET.CROP_SIZE)
        sample = {
            "image": jnp.zeros((1, crop, crop, 3), jnp.float32),
            "labels": jnp.ones((1, self.nclass - 1), jnp.float32),
        }
        from wseg_tpu.engine.train_loop import init_variables
        variables = init_variables(self.model, rng, sample)
        self.tx, self.labels_tree = make_optimizer(
            cfg.NET, cfg.NET.BACKBONE, variables["params"])
        self.state = create_train_state(self.model, self.tx, rng, sample,
                                        variables=variables)

        # pretrained backbone weights
        pre = str(cfg.NET.PRE_WEIGHTS_PATH)
        if pre and os.path.isfile(pre):
            from wseg_tpu.utils.torch_convert import load_pretrained_backbone
            self.state = self.state.replace(params=load_pretrained_backbone(
                self.state.params, pre, cfg.NET.BACKBONE))
        else:
            # from-scratch fallback (outside the reference recipe, which
            # always starts from ImageNet weights): SkipInit the residual
            # branches so frozen-identity BN doesn't blow up activations
            from wseg_tpu.models.backbones.common import \
                stabilize_scratch_init
            print("WARNING: no pretrained weights at %r; applying "
                  "scratch-init stabilisation (zero residual-branch "
                  "output convs)" % pre)
            self.state = self.state.replace(params=stabilize_scratch_init(
                self.state.params, str(cfg.NET.BACKBONE)))

        attn_w = 20.0 if getattr(args, "isattention", False) else 0.0
        self.train_step = make_train_step(
            self.model, self.tx, str(cfg.NET.LOSS), attn_w,
            float(cfg.NET.MASK_LOSS_BCE))
        self.eval_step = make_eval_step(
            self.model, str(cfg.NET.LOSS), attn_w,
            float(cfg.NET.MASK_LOSS_BCE))

        # checkpoints
        self.checkpoint = Checkpoint(args.snapshot_dir, max_n=5)
        self.checkpoint.add_model("enc", self.state.params,
                                  self.state.opt_state)
        # live-BatchNorm models (ae decoder/GCI) carry batch statistics
        # the reference persists inside the torch state_dict; store them
        # as a separate enc_bn tree
        if self.state.batch_stats:
            self.checkpoint.add_model("enc_bn", self.state.batch_stats)
        self.best_score = -1e16
        if getattr(args, "resume", None):
            found, states, opts = self.checkpoint.load(
                args.resume, {"enc": self.state.params},
                {"enc": self.state.opt_state})
            if found:
                self.state = self.state.replace(params=states["enc"])
                if "enc" in opts:
                    self.state = self.state.replace(opt_state=opts["enc"])
                if self.state.batch_stats:
                    ok_bn, st_bn, _ = self.checkpoint.load(
                        args.resume,
                        {"enc_bn": self.state.batch_stats})
                    if ok_bn:
                        self.state = self.state.replace(
                            batch_stats=st_bn["enc_bn"])
                epoch, score = parse_suffix(args.resume)
                self.best_score = score
                if self.start_epoch == 0:
                    self.start_epoch = epoch
                print(f"Resumed from {args.resume} (epoch {epoch})")

        # device mesh: batch sharded over as many devices as divide it
        n_dev = len(jax.devices())
        bs = int(cfg.TRAIN.BATCH_SIZE)
        n_data = max(d for d in range(1, n_dev + 1) if bs % d == 0)
        if n_data != n_dev:
            print(f"Using {n_data}/{n_dev} devices "
                  f"(batch {bs} not divisible by {n_dev})")
        self.mesh = make_mesh(n_data=n_data,
                              devices=jax.devices()[:n_data])
        self.state = replicate(self.mesh, self.state)

        # fixed-batch visual regression
        self.fixed_batch = None
        fbp = getattr(args, "fixed_batch_path", None)
        if fbp and os.path.isfile(fbp):
            d = np.load(fbp)
            self.fixed_batch = {"image": d["image"], "labels": d["labels"]}
            print("Loading fixed batch from", fbp)

        # TensorBoard
        self.writer = self.writer_val = None
        try:
            from tensorboardX import SummaryWriter
            self.writer = SummaryWriter(os.path.join(args.logdir, "train"))
            self.writer_val = SummaryWriter(os.path.join(args.logdir, "val"))
        except Exception as e:  # pragma: no cover
            print("TensorBoard disabled:", e)

    # ------------------------------------------------------------------
    def _device_batch(self, batch):
        # shard_leading_if_divisible rather than shard_batch: a batch
        # whose leading axis doesn't divide the mesh data axis (e.g. a
        # ragged tail from a non-dropping loader) falls back to an
        # unsharded put instead of a device_put ValueError
        from wseg_tpu.parallel.mesh import shard_leading_if_divisible
        # "jitter" (device colour-jitter params) rides along when the
        # loader emits it — dropping it here would silently train
        # WITHOUT colour augmentation under DATASET.DEVICE_JITTER (the
        # default); the train step applies it on device
        # (train_loop.py _normalise_batch_image)
        keys = [k for k in ("image", "labels", "jitter") if k in batch]
        return {k: shard_leading_if_divisible(self.mesh, batch[k])
                for k in keys}

    def _maybe_capture_fixed_batch(self, batch):
        """Persist the first training batch for epoch-over-epoch visual
        regression (reference train.py:105-110, 191-195)."""
        if self.fixed_batch is not None:
            return
        path = getattr(self.args, "fixed_batch_path", None)
        self.fixed_batch = {"image": np.asarray(batch["image"]),
                            "labels": np.asarray(batch["labels"])}
        if path:
            d = os.path.dirname(path)
            if d:
                os.makedirs(d, exist_ok=True)
            np.savez(path, **self.fixed_batch)

    def _visualise_fixed_batch(self, epoch: int):
        """Mask overlays of the fixed batch into TensorBoard
        (reference base_trainer.py:128-155)."""
        if self.fixed_batch is None or self.writer is None:
            return
        from wseg_tpu.engine.train_loop import make_vis_step
        from wseg_tpu.engine.writers import _mask2rgb
        from wseg_tpu.models.backbones.common import denormalize_image

        if not hasattr(self, "_vis_step"):
            self._vis_step = make_vis_step(self.model)
        vis = self._vis_step(self.state, self.fixed_batch)
        img = self.fixed_batch["image"]
        if img.dtype == np.uint8:
            # default loader transfer='uint8': raw 0-255 pixels —
            # denormalising those saturates the panel to white
            image01 = img.astype(np.float32) / 255.0
        else:
            image01 = np.clip(np.asarray(denormalize_image(img)), 0, 1)
        panels = [image01]
        for key in ("cam", "dec", "pseudo"):
            if key not in vis:
                continue
            m = np.asarray(vis[key], np.float32)
            idx = np.argmax(m, axis=-1)
            conf = np.clip(np.max(m, axis=-1), 0, 1)[..., None]
            rgb = _mask2rgb(idx) * conf
            panels.append(0.3 * image01 + 0.7 * rgb)
        strip = np.concatenate(panels, axis=2)  # (B, H, W*k, 3)
        grid = np.concatenate(list(strip), axis=0)  # (B*H, W*k, 3)
        self.writer.add_image("vis/fixed_batch",
                              np.transpose(grid, (2, 0, 1)), epoch)

    def train_epoch(self, epoch: int):
        stat = StatManager()
        timer = Timer("New Epoch: ")
        self._last_log_t = 0.0
        pretrain = epoch < int(cfg.TRAIN.PRETRAIN)
        mask_on = jnp.asarray(0.0 if pretrain else 1.0)

        # Metrics stay on device and are fetched in batches every 10 steps
        # so the dispatch pipeline is never stalled by a per-step host sync
        # (the reference's .item()-per-step is a torch-ism, reference
        # train.py:163-171).
        buf = MetricBuffer(stat)

        profile_dir = getattr(self.args, "profile_dir", "")
        profiling = False
        dbg = bool(os.environ.get("WSEG_DEBUG_STEPTIME"))
        import time as _time
        t_last = _time.perf_counter()
        for i, batch in enumerate(self.trainloader):
            if dbg:
                t0 = _time.perf_counter()
                print(f"[steptime] {i} load {t0 - t_last:.3f}",
                      flush=True)
            if profile_dir and epoch == self.start_epoch and i == 10:
                jax.profiler.start_trace(profile_dir)
                profiling = True
            self._maybe_capture_fixed_batch(batch)
            db = self._device_batch(batch)
            if dbg:
                t1 = _time.perf_counter()
                print(f"[steptime] {i} put {t1 - t0:.3f}", flush=True)
            self.state, metrics = self.train_step(self.state, db,
                                                  self.rng, mask_on)
            buf.append(metrics)
            if dbg:
                t_last = _time.perf_counter()
                print(f"[steptime] {i} dispatch {t_last - t1:.3f}",
                      flush=True)
            if profiling and i == 20:
                jax.profiler.stop_trace()
                print("Profiler trace written to", profile_dir)
                profile_dir = ""
                profiling = False

            if i % 10 == 0:
                last = buf.flush()
                msg = "Epoch[{}] Loss [{:04d}]: ".format(epoch, i)
                for k in sorted(last):
                    msg += "{}: {:.4f} | ".format(k, float(last[k]))
                # cumulative rate = the reference's Im/Sec print
                # (reference train.py:206); the windowed rate excludes
                # the first-step compile / program-cache load, which
                # otherwise dominates the cumulative number for minutes
                now = timer.get_stage_elapsed()
                ips = (i + 1) * int(cfg.TRAIN.BATCH_SIZE) / now
                win = ""
                if i > 0:
                    w = 10 * int(cfg.TRAIN.BATCH_SIZE) / \
                        max(now - self._last_log_t, 1e-6)
                    win = " (last10: {:.1f})".format(w)
                self._last_log_t = now
                print(msg + " | Im/Sec: {:.1f}".format(ips) + win,
                      flush=True)

        buf.flush()
        for k in stat.vals:
            print("{}: {:4.3f}".format(k, stat.summarize_key(k)))
            if self.writer:
                self.writer.add_scalar("all/" + k,
                                       stat.summarize_key(k), epoch)
        try:
            self._visualise_fixed_batch(epoch)
        except Exception as e:  # visualisation must never kill training
            print("fixed-batch visualisation failed:", e)

    def validation(self, epoch: int, checkpoint: bool = False):
        stat = StatManager()
        # dispatch the whole pass without per-batch host syncs; scalars
        # and cls logits are fetched in batched transfers every 10 steps
        buf = MetricBuffer(stat)
        targets = []
        bs_full = None
        for i, batch in enumerate(self.valloader):
            n_real = int(np.shape(batch["labels"])[0])
            if bs_full is None:
                bs_full = n_real
            if n_real < bs_full:
                # ragged tail (val loader keeps the remainder): pad to
                # the static batch shape by repeating leading rows —
                # the P('data') sharding stays even and the jitted eval
                # step is not retraced (a fresh WRN38 compile costs
                # minutes on the relay).  cls rows are trimmed so mAP
                # stays exact; only this one batch's mean metrics count
                # the duplicated rows.
                # Tile whole copies: a tail smaller than bs_full/2 (e.g.
                # VOC val 1449 % 8 == 1) must still fill all bs_full rows
                # or the shape differs and the step retraces anyway.
                reps = -(-bs_full // n_real)
                batch = dict(
                    batch,
                    image=np.concatenate(
                        [batch["image"]] * reps)[:bs_full],
                    labels=np.concatenate(
                        [batch["labels"]] * reps)[:bs_full])
            db = self._device_batch(batch)
            metrics, cls = self.eval_step(self.state, db)
            if n_real != bs_full:
                cls = cls[:n_real]
            buf.append(metrics, extra=cls)
            targets.append(np.asarray(batch["labels"])[:n_real])
            if (i + 1) % 10 == 0:
                buf.flush()
        buf.flush()

        targets = np.vstack(targets)
        preds = 1.0 / (1.0 + np.exp(
            -np.vstack(buf.extra_rows).astype(np.float32)))
        n_fg = min(targets.shape[1], preds.shape[1])
        aps = average_precision(targets[:, :n_fg], preds[:, :n_fg])
        mean_ap = float(np.mean(aps))
        print("mAP: {:4.3f}".format(mean_ap))
        writer = self.writer_val
        if writer:
            writer.add_scalar("all_wo_BG/mAP", mean_ap, epoch)
            for k in stat.vals:
                writer.add_scalar("all/" + k, stat.summarize_key(k), epoch)

        if checkpoint and epoch >= int(cfg.TRAIN.PRETRAIN):
            proxy = 1.0 - stat.summarize_key("loss")
            if writer:
                writer.add_scalar("all/checkpoint_score", proxy, epoch)
            self.checkpoint_best(proxy, epoch)
        return mean_ap

    def checkpoint_best(self, score: float, epoch: int):
        """Save when the proxy score improves (reference
        base_trainer.py:83-95)."""
        if score > self.best_score:
            self.best_score = score
            suffix = make_suffix(epoch, score)
            params = jax.device_get(self.state.params)
            opt = jax.device_get(self.state.opt_state)
            states = {"enc": params}
            if self.state.batch_stats:
                states["enc_bn"] = jax.device_get(self.state.batch_stats)
            self.checkpoint.checkpoint(suffix, states, {"enc": opt})
            print("Saved checkpoint", suffix)
            return True
        return False
