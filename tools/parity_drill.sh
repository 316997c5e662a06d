#!/usr/bin/env bash
# Day-0 acceptance drill (docs/PARITY.md acceptance block): exercises the
# FULL blocked real-asset acceptance flow on synthetic assets, so that
# the day real VOC data + the released 527 MB .pth appear, the
# acceptance run is a single already-rehearsed command sequence:
#
#   reference-format .pth  ->  infer_val.py (direct convert, multiscale
#   + exact CRF)  ->  eval_seg.py (mIoU table)
#
# The .pth is a REAL torch state_dict saved from the reference network
# (imported from /root/reference, random init) — the exact tensor names
# and layouts of the released checkpoint.  Parity-grade settings: exact
# permutohedral CRF (TEST.CRF_MODE exact; WSEG_DRILL_CRF_MODE=fast for
# a quick pass), device merge on.
#
# Usage: bash tools/parity_drill.sh [workdir]   (TPU or CPU; TPU ~5 min)
set -euo pipefail
cd "$(dirname "$0")/.."

WORK=${1:-/tmp/wseg_parity_drill}
CRF_MODE=${WSEG_DRILL_CRF_MODE:-exact}
rm -rf "$WORK"; mkdir -p "$WORK"

echo "=== launch scripts parse ==="
for f in launch/*.sh; do bash -n "$f" && echo "  ok $f"; done

echo "=== synthetic VOC ==="
python - "$WORK/data" <<'EOF'
import sys
sys.path.insert(0, "tests")
from synthetic_voc import make_synthetic_voc
make_synthetic_voc(sys.argv[1], n_train=2, n_val=4, size=(500, 375))
print("synthetic VOC at", sys.argv[1])
EOF

echo "=== reference-format .pth (real torch state_dict) ==="
python - "$WORK" <<'EOF'
import sys
sys.path.insert(0, "tests")
import torch
from reference_oracle import build_reference_model, make_net_cfg
net = make_net_cfg("CAM_CASA_WGAP_tf", "resnet38")
model = build_reference_model(net, num_classes=21, seed=0)
path = sys.argv[1] + "/model_enc_e020Xs0.900.pth"
torch.save(model.state_dict(), path)
print("saved", path)
EOF

echo "=== infer_val.py: direct .pth convert -> multiscale + ${CRF_MODE} CRF ==="
python -u infer_val.py --dataset pascal_voc --cfg configs/voc_resnet38.yaml \
    --exp drill --run r0 \
    --resume "$WORK/model_enc_e020Xs0.900.pth" \
    --infer-list "$WORK/data/val_voc.txt" \
    --mask-output-dir "$WORK/results" \
    --workers 2 \
    --set TEST.DATA_ROOT "$WORK/data" TEST.CRF_MODE "$CRF_MODE"

echo "=== eval_seg.py (no-CRF and +CRF writer dirs) ==="
for d in "$WORK"/results_*/no_crf "$WORK"/results_*/crf; do
  [ -n "$(ls -A "$d" 2>/dev/null)" ] || continue
  echo "--- $d"
  python -u eval_seg.py --data "$WORK/data" \
      --filelist "$WORK/data/val_voc.txt" --masks "$d" \
      --log-scores "$WORK/scores.log" | tail -5
done

echo "DRILL OK — with real assets, swap in the real .pth path and"
echo "data root (docs/PARITY.md acceptance block) and run the same"
echo "two commands."
