#!/bin/bash
# Round-3 sweep k: count-regime search. mb32x8 measured 502.8 (no
# remat); the OOM boundary sits between mb32 and mb128 stored — probe
# mb64 stored and mb128 remat="dots".
set -x
cd "$(dirname "$0")/.."
{
  echo "=== count B/32 mb64 x 4 (stored) ==="
  BENCH_LOSS=count BENCH_MODEL=ViT-B/32 BENCH_ACCUM=4 python bench.py 64
  echo "=== count B/32 mb128 x 4, remat=dots ==="
  BENCH_LOSS=count BENCH_MODEL=ViT-B/32 BENCH_REMAT=dots python bench.py 128
} 2>&1 | tee perf/sweep_r3k.log
