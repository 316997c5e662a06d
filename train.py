#!/usr/bin/env python
"""Training entry point (CLI-compatible with the reference train.py).

Usage:
  python train.py --dataset pascal_voc --cfg configs/voc_resnet38.yaml \
      --exp EXP --run RUN [--resume eNNNXsS.SSS] [--set KEY VALUE ...]
"""

import sys

from wseg_tpu.config import cfg, cfg_from_file, cfg_from_list
from wseg_tpu.opts import get_arguments
from wseg_tpu.utils.timer import Timer


def main(argv):
    args = get_arguments(argv)
    cfg_from_file(args.cfg_file)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs)
    print("Config:\n", cfg)

    from wseg_tpu.engine.trainer import DecTrainer
    trainer = DecTrainer(args)

    timer = Timer()

    def time_call(func, msg, *a, **kw):
        timer.reset_stage()
        func(*a, **kw)
        print(msg + " {:3.2f}m".format(timer.get_stage_elapsed() / 60.0))

    for epoch in range(trainer.start_epoch,
                       int(cfg.TRAIN.NUM_EPOCHS) + 1):
        print("Epoch >>> ", epoch, flush=True)
        time_call(trainer.train_epoch, "Train epoch: ", epoch)
        time_call(trainer.validation, "Validation /   Val: ", epoch,
                  checkpoint=True)


if __name__ == "__main__":
    main(sys.argv[1:])
