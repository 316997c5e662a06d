#!/bin/bash
# Score produced masks against GT (reference launch/eval_seg.sh semantics)
DATA=${DATA:-./data}
FILELIST=${FILELIST:-./data/val_voc.txt}
MASKS=${MASKS:?set MASKS=<dir with predicted PNGs>}

python eval_seg.py --data "$DATA" --filelist "$FILELIST" --masks "$MASKS"
