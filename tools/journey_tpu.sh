#!/usr/bin/env bash
# Full user-journey smoke on real TPU hardware, through the actual CLIs:
#   synthetic VOC -> train.py (flagship cfg) -> infer_val.py -> eval_seg.py
# Mirrors the reference workflow (reference launch/run_voc_resnet38.sh ->
# infer_val.py -> eval_seg.py) end to end on one chip.
#
# Usage: bash tools/journey_tpu.sh [workdir]  (default /tmp/wseg_journey)
set -euo pipefail
cd "$(dirname "$0")/.."

WORK=${1:-/tmp/wseg_journey}
DATA=$WORK/data
EPOCHS=${EPOCHS:-2}
rm -rf "$WORK"; mkdir -p "$WORK"

python - "$DATA" <<'EOF'
import sys
sys.path.insert(0, "tests")
from synthetic_voc import make_synthetic_voc
# 500x375 matches the common VOC size; the per-scale pad buckets then
# coincide with bench.py's, so inference programs hit the compile cache.
make_synthetic_voc(sys.argv[1], n_train=16, n_val=4, size=(500, 375))
print("synthetic VOC at", sys.argv[1])
EOF

echo "=== train.py ($EPOCHS epochs, flagship voc_resnet38) ==="
python -u train.py --dataset pascal_voc --cfg configs/voc_resnet38.yaml \
    --exp journey --run r0 \
    --snapshot-dir "$WORK/snapshots" --logdir "$WORK/logs" \
    --set DATASET.ROOT "$DATA" TRAIN.NUM_EPOCHS "$EPOCHS" \
          TRAIN.PRETRAIN 1

SNAP=$(ls -t "$WORK"/snapshots/pascal_voc/journey/r0/model_enc_*.msgpack \
       2>/dev/null | head -1 |
       sed -E 's/.*model_enc_(e[0-9]+Xs[-0-9.]+)\.msgpack/\1/') || true
echo "latest snapshot suffix: $SNAP"

echo "=== infer_val.py (multi-scale + CRF) ==="
python -u infer_val.py --dataset pascal_voc --cfg configs/voc_resnet38.yaml \
    --exp journey --run r0 --resume "$SNAP" \
    --snapshot-dir "$WORK/snapshots" --logdir "$WORK/logs" \
    --infer-list "$DATA/val_voc.txt" \
    --mask-output-dir "$WORK/masks" \
    --set DATASET.ROOT "$DATA" TEST.DATA_ROOT "$DATA" \
          TEST.USE_GT_LABELS True

echo "=== eval_seg.py ==="
# infer_val appends "_<thresh>" to --mask-output-dir (reference writer
# matrix); score the thresh-0 writer's outputs
fail=0
for sub in no_crf crf; do
  d="$WORK/masks_0/$sub"
  if [ ! -d "$d" ]; then echo "missing $d"; fail=1; continue; fi
  echo "--- $sub ($d) ---"
  python -u eval_seg.py --data "$DATA" --filelist "$DATA/val_voc.txt" \
      --masks "$d" || fail=1
done
[ "$fail" = 0 ] && echo "JOURNEY OK" || { echo "JOURNEY FAILED"; exit 1; }
