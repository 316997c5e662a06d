#!/bin/bash
# Train the flagship WRN38 + CAM_CASA_WGAP_tf model on VOC+SBD
# (reference launch/run_voc_resnet38.sh semantics)

EXP=${EXP:-tf_wrn38}
RUN_ID=${RUN_ID:-v01}

# cold start
CMD="python train.py --dataset pascal_voc --cfg configs/voc_resnet38.yaml \
     --exp $EXP --run $RUN_ID"

# warm start: resume from a snapshot suffix
# SNAPSHOT=e005Xs0.914
if [ -n "$SNAPSHOT" ]; then
  EPOCH=$(echo "$SNAPSHOT" | sed -E 's/e0*([0-9]+)Xs.*/\1/')
  CMD="$CMD --resume $SNAPSHOT --start_epoch $EPOCH"
fi

echo "$CMD"
$CMD
