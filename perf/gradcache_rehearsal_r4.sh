#!/bin/bash
# Round-4 GradCache hardware rehearsal.
#
# tests/test_gradcache.py pins the math (full-effective-batch gradients
# equal to a single-chunk oracle) and perf/gradcache_memory_report.log
# pins the memory story, both on CPU XLA. This script proves the path on
# the real v5e chip and prices it: the same ViT-B/16 SPARC regime
# (mb32 x accum 4, global negatives) trained plain and with --grad-cache.
# Expected cost: GradCache re-forwards every chunk once (~1.33x FLOPs,
# train/gradcache.py step 3), so throughput should land around 0.7-0.8x
# of the plain run — the price of a 4x larger negative pool at one-chunk
# activation memory.
#
# Do not run concurrently with CPU work (CLAUDE.md: one-core host).
set -x
cd "$(dirname "$0")/.."
{
  echo "=== data: 512 procedural samples (host, CPU-forced) ==="
  python -c "
import jax; jax.config.update('jax_platforms','cpu')
from clip_finegrained_alignment_tpu.cli.generate_data import main
main(['--procedural','--output-dir','/tmp/gcdata','--num-samples','512',
      '--image-size','224','--seed','11'])"

  echo "=== plain accumulation (TPU): mb32 x accum 4, global negatives ==="
  CFA_ALLOW_HASH_TOKENIZER=1 python -m clip_finegrained_alignment_tpu.cli.train \
    --annotations /tmp/gcdata/synthetic_annotations.json \
    --model ViT-B/16 --loss-type sparc --optimizer adamspd \
    --batch-size 32 --grad-accum 4 --epochs 3 --lr 1e-4 \
    --global-negatives \
    --experiment-name gc_plain --checkpoint-dir /tmp/gcckpt

  echo "=== --grad-cache (TPU): same regime, full 128-pool negatives ==="
  CFA_ALLOW_HASH_TOKENIZER=1 python -m clip_finegrained_alignment_tpu.cli.train \
    --annotations /tmp/gcdata/synthetic_annotations.json \
    --model ViT-B/16 --loss-type sparc --optimizer adamspd \
    --batch-size 32 --grad-accum 4 --epochs 3 --lr 1e-4 \
    --global-negatives --grad-cache \
    --experiment-name gc_cache --checkpoint-dir /tmp/gcckpt
} 2>&1 | tee perf/gradcache_rehearsal_r4.log
