#!/bin/bash
# Multi-scale mask inference from a snapshot
# (reference launch/infer_val.sh semantics)

EXP=${EXP:-tf_wrn38}
RUN_ID=${RUN_ID:-v01}
SNAPSHOT=${SNAPSHOT:?set SNAPSHOT=eNNNXsS.SSS}
FILELIST=${FILELIST:-./data/val_voc.txt}
OUTPUT_DIR=${OUTPUT_DIR:-results/$EXP/$RUN_ID}

# WSEG_INT8=1: opt-in int8 serving mode (~1.4x on TPU v5e; w8a8
# backbone convs, same checkpoint; fidelity bounds in docs/ROOFLINE.md)
EXTRA=""
[ -n "${WSEG_INT8:-}" ] && EXTRA="NET.DTYPE int8"

python infer_val.py --dataset pascal_voc --cfg configs/voc_resnet38.yaml \
    --exp "$EXP" --run "$RUN_ID" --resume "$SNAPSHOT" \
    --infer-list "$FILELIST" --mask-output-dir "$OUTPUT_DIR" \
    ${EXTRA:+--set $EXTRA}
