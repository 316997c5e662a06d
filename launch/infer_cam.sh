#!/bin/bash
# Grad-CAM mask inference
EXP=${EXP:-tf_wrn38}
RUN_ID=${RUN_ID:-v01}
SNAPSHOT=${SNAPSHOT:?set SNAPSHOT=eNNNXsS.SSS}
METHOD=${METHOD:-gradcam}
FILELIST=${FILELIST:-./data/val_voc.txt}

python infer_cam.py --dataset pascal_voc --cfg configs/voc_resnet38.yaml \
    --exp "$EXP" --run "$RUN_ID" --resume "$SNAPSHOT" --method "$METHOD" \
    --infer-list "$FILELIST" --mask-output-dir "results/cam_$METHOD"
