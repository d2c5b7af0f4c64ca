#!/bin/sh
# Accuracy parity vs the reference's released RGBNT201 numbers
# (mAP 80.3 / R-1 85.2 / R-5 91.4 / R-10 93.7, `test_RNT201/test_log.txt`).
#
#   scripts/parity_eval.sh <ViT-B-16.pt> <Signal.pth> <RGBNT201_parent_dir>
#
# Exits nonzero when |mAP - 80.3| > 0.2.
set -e
[ $# -ge 3 ] || { echo "usage: $0 <ViT-B-16.pt> <Signal.pth> <data_root>"; exit 2; }
CLIP=$1; WEIGHT=$2; ROOT=$3; shift 3
exec python "$(dirname "$0")/parity_eval.py" \
    --clip "$CLIP" --weight "$WEIGHT" --root "$ROOT" \
    --config "$(dirname "$0")/../configs/RGBNT201/Signal.yml" "$@"
