#!/usr/bin/env python
"""SEAM-style training entry point (reference train_SEAM.py).

Same as train.py plus a 0.5x-scale second forward and the ER
(equivariance-regularisation) loss; validation runs BEFORE training each
epoch (reference train_SEAM.py:356-365).
"""

import sys

import jax.numpy as jnp

from wseg_tpu.config import cfg, cfg_from_file, cfg_from_list
from wseg_tpu.opts import get_arguments
from wseg_tpu.utils.stat_manager import StatManager
from wseg_tpu.utils.timer import Timer


class SEAMTrainer:
    def __init__(self, args):
        from wseg_tpu.engine.seam import make_seam_train_step
        from wseg_tpu.engine.trainer import DecTrainer
        self._base = DecTrainer(args)
        attn_w = 20.0 if getattr(args, "isattention", False) else 0.0
        self.seam_step = make_seam_train_step(
            self._base.model, self._base.tx, str(cfg.NET.LOSS), attn_w,
            float(cfg.NET.MASK_LOSS_BCE), scale_factor=0.5)

    def __getattr__(self, name):
        return getattr(self._base, name)

    def train_epoch(self, epoch: int):
        b = self._base
        stat = StatManager()
        timer = Timer("New Epoch: ")
        pretrain = epoch < int(cfg.TRAIN.PRETRAIN)
        pretrain_er = epoch < int(cfg.TRAIN.PRETRAIN) + 5
        mask_on = jnp.asarray(0.0 if pretrain else 1.0)
        er_on = jnp.asarray(0.0 if pretrain_er else 1.0)

        # metrics stay on device between log points (one stacked fetch
        # per 10 steps), same pipeline hygiene as DecTrainer.train_epoch
        from wseg_tpu.engine.trainer import MetricBuffer
        buf = MetricBuffer(stat)
        for i, batch in enumerate(b.trainloader):
            db = b._device_batch(batch)
            b.state, metrics = self.seam_step(b.state, db, b.rng,
                                              mask_on, er_on)
            buf.append(metrics)
            if i % 10 == 0:
                last = buf.flush()
                msg = "Epoch[{}] Loss [{:04d}]: ".format(epoch, i)
                for k in sorted(last):
                    msg += "{}: {:.4f} | ".format(k, float(last[k]))
                ips = (i + 1) * int(cfg.TRAIN.BATCH_SIZE) / \
                    timer.get_stage_elapsed()
                print(msg + " | Im/Sec: {:.1f}".format(ips), flush=True)

        buf.flush()
        for k in stat.vals:
            print("{}: {:4.3f}".format(k, stat.summarize_key(k)))


def main(argv):
    args = get_arguments(argv)
    cfg_from_file(args.cfg_file)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs)
    print("Config:\n", cfg)

    trainer = SEAMTrainer(args)
    timer = Timer()

    def time_call(func, msg, *a, **kw):
        timer.reset_stage()
        func(*a, **kw)
        print(msg + " {:3.2f}m".format(timer.get_stage_elapsed() / 60.0))

    for epoch in range(trainer.start_epoch,
                       int(cfg.TRAIN.NUM_EPOCHS) + 1):
        print("Epoch >>> ", epoch, flush=True)
        # validation first (reference train_SEAM.py:356-365)
        time_call(trainer.validation, "Validation /   Val: ", epoch,
                  checkpoint=True)
        time_call(trainer.train_epoch, "Train epoch: ", epoch)


if __name__ == "__main__":
    main(sys.argv[1:])
