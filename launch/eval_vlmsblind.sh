#!/usr/bin/env bash
# VLMs-are-Blind eval launcher with the reference's production flags
# (/root/reference/vlms-are-blind/launch_eval.sh:15-17: ViT-L/14,
# confidence 0.25, margin 0.01).
set -euo pipefail
CHECKPOINT=${CHECKPOINT:-}
MODEL=${MODEL:-ViT-L/14}
CKPT_FLAG=""
[ -n "$CHECKPOINT" ] && CKPT_FLAG="--checkpoint $CHECKPOINT"
exec python -m clip_finegrained_alignment_tpu.cli.evaluate vlmsblind \
  --model "$MODEL" --confidence 0.25 --margin 0.01 $CKPT_FLAG "$@"
