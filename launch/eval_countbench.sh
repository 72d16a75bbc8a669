#!/usr/bin/env bash
# CountBench eval launcher with the reference's production flags
# (/root/reference/count-bench/launch_cb_eval.sh:15-19: confidence 0.20,
# margin 0.01, word format).
set -euo pipefail
CHECKPOINT=${CHECKPOINT:-}
MODEL=${MODEL:-ViT-B/32}
CKPT_FLAG=""
[ -n "$CHECKPOINT" ] && CKPT_FLAG="--checkpoint $CHECKPOINT"
exec python -m clip_finegrained_alignment_tpu.cli.evaluate countbench \
  --model "$MODEL" --confidence 0.2 --margin 0.01 --format word \
  --position first $CKPT_FLAG "$@"
