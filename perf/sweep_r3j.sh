#!/bin/bash
# Round-3 sweep j:
# 1) count-loss trainer regime measured on the chip (BENCH_LOSS=count,
#    ViT-B/32 = the model the reference's count trainer actually loads,
#    count_finetuner.py:29) — the second training family gets a number.
# 2) hardware rehearsal of the optimizer-state migration: train on the
#    chip -> export --include-optimizer -> migrate back in with
#    --import-optimizer-state -> continue on the chip.
set -x
cd "$(dirname "$0")/.."
{
  echo "=== BENCH_LOSS=count ViT-B/32 (per-model regime mb128x4) ==="
  BENCH_LOSS=count BENCH_MODEL=ViT-B/32 python bench.py

  echo "=== migration rehearsal: generate data (host) ==="
  python -c "
import jax; jax.config.update('jax_platforms','cpu')
from clip_finegrained_alignment_tpu.cli.generate_data import main
main(['--procedural','--output-dir','/tmp/r3jdata','--num-samples','128',
      '--image-size','224','--seed','7'])"

  echo "=== rehearsal: source train run (TPU) ==="
  CFA_ALLOW_HASH_TOKENIZER=1 python -m clip_finegrained_alignment_tpu.cli.train \
    --annotations /tmp/r3jdata/synthetic_annotations.json \
    --model ViT-B/32 --loss-type sparc --optimizer adamspd \
    --batch-size 32 --grad-accum 2 --epochs 1 --lr 1e-4 \
    --experiment-name rehearsal_src --checkpoint-dir /tmp/r3jckpt \
    --save-every 1

  echo "=== rehearsal: export with optimizer state (host) ==="
  python -m clip_finegrained_alignment_tpu.cli.export_checkpoint \
    --checkpoint /tmp/r3jckpt/rehearsal_src/best --model ViT-B/32 \
    --output /tmp/r3jckpt/migrated.pt --include-optimizer

  echo "=== rehearsal: migrate back in + continue (TPU) ==="
  CFA_ALLOW_HASH_TOKENIZER=1 python -m clip_finegrained_alignment_tpu.cli.train \
    --annotations /tmp/r3jdata/synthetic_annotations.json \
    --model ViT-B/32 --loss-type sparc --optimizer adamspd \
    --batch-size 32 --grad-accum 2 --epochs 2 --lr 1e-4 \
    --experiment-name rehearsal_mig --checkpoint-dir /tmp/r3jckpt \
    --save-every 1 \
    --pretrained /tmp/r3jckpt/migrated.pt --import-optimizer-state
} 2>&1 | tee perf/sweep_r3j.log
