#!/usr/bin/env bash
# TPU training launcher — the role of the reference's SLURM/torchrun script
# (/root/reference/finetune/dist_train.sh: MASTER_ADDR/PORT plumbing + one
# torchrun process per GPU). On TPU there is no rendezvous shell plumbing:
# run this same script on every host of the slice (e.g. via
# `gcloud compute tpus tpu-vm ssh $TPU --worker=all --command=...`);
# jax.distributed.initialize() discovers peers from the TPU metadata and
# the single SPMD program spans all chips.
set -euo pipefail

ANNOTATIONS=${ANNOTATIONS:-synthetic_dataset/synthetic_annotations.json}
MODEL=${MODEL:-ViT-B/32}
LOSS=${LOSS:-sparc}
OPTIMIZER=${OPTIMIZER:-adamspd}
EPOCHS=${EPOCHS:-10}
BATCH=${BATCH:-32}
ACCUM=${ACCUM:-4}
EXPERIMENT=${EXPERIMENT:-sparc_spd_$(date +%Y%m%d_%H%M)}
EXTRA=${EXTRA:-}

# Resume support: pass RESUME=1 (the reference's --resume,
# dist_train.sh:27,51).
RESUME_FLAG=""
[ "${RESUME:-0}" = "1" ] && RESUME_FLAG="--resume"

# Measured-fastest v5e regime (BASELINE.md round 2): unstacked per-layer
# params, XLA attention + SPARC, activations stored (remat 0) —
# 1000 pairs/s/chip on ViT-B/16. Memory-bound configs (ViT-L/14 on a
# v5e-8): EXTRA="--zero1" shards the optimizer state 1/dp per chip;
# MP=2 adds Megatron tensor parallelism (implies the stacked layout);
# PP=2/4 adds GPipe pipeline stages instead (parallel/pipeline.py);
# EXTRA="--remat dots" trades FLOPs for HBM.
MP=${MP:-1}
PP=${PP:-1}
LAYOUT_FLAGS="--unstack-layers"
[ "$MP" -gt 1 ] && LAYOUT_FLAGS="--model-parallel $MP"
[ "$PP" -gt 1 ] && LAYOUT_FLAGS="--pipeline-parallel $PP"

exec python -m clip_finegrained_alignment_tpu.cli.train \
  --annotations "$ANNOTATIONS" \
  --model "$MODEL" \
  --loss-type "$LOSS" \
  --optimizer "$OPTIMIZER" \
  --epochs "$EPOCHS" \
  --batch-size "$BATCH" \
  --grad-accum "$ACCUM" \
  --experiment-name "$EXPERIMENT" \
  $LAYOUT_FLAGS --remat 0 --global-negatives \
  $RESUME_FLAG $EXTRA
