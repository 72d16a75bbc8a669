#!/usr/bin/env bash
# Synthetic-data generation with the reference's production config
# (/root/reference/count_train_dataset/launch_data_gen.sh:15-17:
# 50000 samples, small objects, count captions).
set -euo pipefail
COCO_DIR=${COCO_DIR:-dataset/coco}
OUT=${OUT:-synthetic_dataset}
exec python -m clip_finegrained_alignment_tpu.cli.generate_data \
  --coco-dir "$COCO_DIR" --output-dir "$OUT" \
  --num-samples 50000 --size-category small --annotation-mode count "$@"
