#!/bin/bash
# Round-5 packed-ingest rehearsal — regenerates the round-4 evidence with
# current code (VERDICT r4 weak #6: the committed r4 log predates commit
# 6b57683, which fixed the done-line to use synced epoch timings, so its
# 28051 pairs/s tail was an enqueue-rate artifact contradicting the real
# 971 pairs/s epoch lines).
#
# Same workload as round 4: ViT-B/16 SPARC+AdamSPD, mb32 x accum 8, 8192
# procedural 224px samples, 3 epochs, decode-free packed ingest with the
# uint8 pixel bank pinned in HBM (--packed --device-data).
#
# Do not run concurrently with CPU work (CLAUDE.md: one-core host).
set -e
cd "$(dirname "$0")/.."
{
  echo "=== data: 8192 procedural 224px samples (host, CPU-forced) ==="
  python -c "
import jax; jax.config.update('jax_platforms','cpu')
from clip_finegrained_alignment_tpu.cli.generate_data import main
main(['--procedural','--output-dir','/tmp/pk5data','--num-samples','8192',
      '--image-size','224','--seed','7'])"

  echo "=== pack (decode once, host) ==="
  CFA_ALLOW_HASH_TOKENIZER=1 python -c "
import jax; jax.config.update('jax_platforms','cpu')
from clip_finegrained_alignment_tpu.cli.pack_dataset import main
main(['--annotations','/tmp/pk5data/synthetic_annotations.json',
      '--output','/tmp/pk5pack','--model','ViT-B/16',
      '--loss-type','sparc'])"

  echo "=== train --packed --device-data (TPU): mb32 x accum 8, 3 epochs ==="
  CFA_ALLOW_HASH_TOKENIZER=1 \
  python -m clip_finegrained_alignment_tpu.cli.train \
    --packed /tmp/pk5pack --device-data \
    --model ViT-B/16 --loss-type sparc --optimizer adamspd \
    --batch-size 32 --grad-accum 8 --epochs 3 --lr 2e-5 \
    --experiment-name packed_b16_devdata_r5 --checkpoint-dir /tmp/pk5ckpt
} 2>&1 | tee perf/packed_rehearsal_r5.log
