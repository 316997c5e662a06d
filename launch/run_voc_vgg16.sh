#!/bin/bash
# Train the CVPR-2020 paper model (SoftMaxAE) with a VGG16 backbone
# (reference launch/run_voc_vgg16.sh)
EXP=${EXP:-ae_vgg16}
RUN_ID=${RUN_ID:-v01}
python train.py --dataset pascal_voc --cfg configs/voc_vgg16.yaml \
    --exp "$EXP" --run "$RUN_ID" "$@"
