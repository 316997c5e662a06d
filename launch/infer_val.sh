#!/bin/bash
# Multi-scale mask inference from a snapshot
# (reference launch/infer_val.sh semantics)

EXP=${EXP:-tf_wrn38}
RUN_ID=${RUN_ID:-v01}
SNAPSHOT=${SNAPSHOT:?set SNAPSHOT=eNNNXsS.SSS}
FILELIST=${FILELIST:-./data/val_voc.txt}
OUTPUT_DIR=${OUTPUT_DIR:-results/$EXP/$RUN_ID}

python infer_val.py --dataset pascal_voc --cfg configs/voc_resnet38.yaml \
    --exp "$EXP" --run "$RUN_ID" --resume "$SNAPSHOT" \
    --infer-list "$FILELIST" --mask-output-dir "$OUTPUT_DIR"
