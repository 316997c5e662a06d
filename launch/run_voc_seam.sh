#!/bin/bash
# SEAM-style equivariance-regularised training
EXP=${EXP:-seam_wrn38}
RUN_ID=${RUN_ID:-v01}
python train_SEAM.py --dataset pascal_voc --cfg configs/voc_resnet38.yaml \
    --exp "$EXP" --run "$RUN_ID" "$@"
