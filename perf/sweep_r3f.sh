#!/bin/bash
# Round-3 sweep f:
# 1) pure-default bench reconfirmation after the quant plumbing (engine
#    signatures changed; compiled program should be identical at quant=none)
# 2) int8 quant verdict on ViT-L/14 (mb32 x 8, unstacked, no remat — the
#    222 pairs/s regime): L/14's [1024, 4096] GEMMs at S=257 are far more
#    compute-bound than B/16's, the one regime where the 2x int8 MXU rate
#    could outrun the relayout overheads measured on B/16.
set -x
cd "$(dirname "$0")/.."
{
  echo "=== default bench reconfirm (bf16, ViT-B/16 mb32x8) ==="
  python bench.py
  echo "=== ViT-L/14 bf16 (session baseline) ==="
  BENCH_MODEL=ViT-L/14 python bench.py
  echo "=== ViT-L/14 BENCH_QUANT=int8 ==="
  BENCH_QUANT=int8 BENCH_MODEL=ViT-L/14 python bench.py
  echo "=== ViT-L/14 BENCH_QUANT=switchback ==="
  BENCH_QUANT=switchback BENCH_MODEL=ViT-L/14 python bench.py
} 2>&1 | tee perf/sweep_r3f.log
