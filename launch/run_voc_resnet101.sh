#!/bin/bash
# Train the CVPR-2020 paper model (SoftMaxAE) with a ResNet101 backbone
# (reference launch/run_voc_resnet101.sh)
EXP=${EXP:-ae_r101}
RUN_ID=${RUN_ID:-v01}
python train.py --dataset pascal_voc --cfg configs/voc_resnet101.yaml \
    --exp "$EXP" --run "$RUN_ID" "$@"
