#!/bin/bash
# Round-5 GradCache hardware rehearsal (VERDICT r4 item 4).
#
# tests/test_gradcache.py pins the math (full-effective-batch gradients
# equal a single-chunk oracle) and perf/gradcache_memory_report.log pins
# the memory mechanics on CPU XLA. This script proves the feature's
# REASON on the real v5e chip: the effective contrastive negative pool
# growing 256 -> 512 -> 1024 (mb32 x accum 8/16/32) at bounded HBM
# (one-chunk activations; 15.75 GiB wall — a DIRECT flat-batch step at
# 512 already OOMs at 21.5 G, BASELINE.md round 1), and what each pool
# size costs in pairs/s (GradCache re-forwards every chunk once:
# ~1.33x FLOPs).
#
# Also the objective A/B the VERDICT asks for: plain accumulation at
# accum 16 vs --grad-cache at accum 16, same seed/data/lr — the loss
# trajectories must DIFFER (plain optimizes per-chunk 32-negative
# InfoNCE; grad-cache the full 512-pool objective). Peak-HBM lines come
# from the train CLI done-block (jax device memory_stats).
#
# Do not run concurrently with CPU work (CLAUDE.md: one-core host).
set -e
cd "$(dirname "$0")/.."
{
  echo "=== data: 2048 procedural 224px samples (host, CPU-forced) ==="
  python -c "
import jax; jax.config.update('jax_platforms','cpu')
from clip_finegrained_alignment_tpu.cli.generate_data import main
main(['--procedural','--output-dir','/tmp/gc5data','--num-samples','2048',
      '--image-size','224','--seed','11'])"

  echo "=== pack (decode once; --device-data keeps the feed device-bound"
  echo "    so the grad-cache DEVICE cost is visible, not host decode) ==="
  CFA_ALLOW_HASH_TOKENIZER=1 python -c "
import jax; jax.config.update('jax_platforms','cpu')
from clip_finegrained_alignment_tpu.cli.pack_dataset import main
main(['--annotations','/tmp/gc5data/synthetic_annotations.json',
      '--output','/tmp/gc5pack','--model','ViT-B/16',
      '--loss-type','sparc'])"

  run_train() {  # run_train <name> <accum> [--grad-cache]
    local name=$1 accum=$2; shift 2
    echo "=== $name: ViT-B/16 sparc mb32 x accum $accum $* ==="
    CFA_ALLOW_HASH_TOKENIZER=1 \
    python -m clip_finegrained_alignment_tpu.cli.train \
      --packed /tmp/gc5pack --device-data \
      --model ViT-B/16 --loss-type sparc --optimizer adamspd \
      --batch-size 32 --grad-accum "$accum" --epochs 4 --lr 1e-4 \
      --global-negatives "$@" \
      --experiment-name "$name" --checkpoint-dir /tmp/gc5ckpt \
      --metrics-file "/tmp/gc5_${name}.jsonl"
  }

  run_train plain_a16 16
  run_train gc_a8  8  --grad-cache
  run_train gc_a16 16 --grad-cache
  run_train gc_a32 32 --grad-cache
} 2>&1 | tee perf/gradcache_rehearsal_r5.log
