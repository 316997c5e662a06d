#!/bin/bash
# Train the CVPR-2020 paper model (SoftMaxAE) with a ResNet50 backbone
EXP=${EXP:-ae_r50}
RUN_ID=${RUN_ID:-v01}
python train.py --dataset pascal_voc --cfg configs/voc_resnet50.yaml \
    --exp "$EXP" --run "$RUN_ID" "$@"
