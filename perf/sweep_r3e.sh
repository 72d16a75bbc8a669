#!/bin/bash
# Round-3 sweep e: the int8 MXU path (ops/quant.py).
# 1) isolated GEMM-set microbench fwd (go/no-go vs bf16)
# 2) microbench training direction (bf16 / switchback / full int8)
# 3) end-to-end bench.py at the production regime for both modes
# Run on an idle host (no concurrent CPU work — single-core tunnel client).
set -x
cd "$(dirname "$0")/.."
{
  echo "=== int8 microbench fwd ==="
  BENCH_VARIANTS=fwd python perf/int8_microbench.py
  echo "=== int8 microbench bwd ==="
  BENCH_VARIANTS=bwd python perf/int8_microbench.py
  echo "=== bench.py BENCH_QUANT=switchback (ViT-B/16 mb32x8 defaults) ==="
  BENCH_QUANT=switchback python bench.py
  echo "=== bench.py BENCH_QUANT=int8 ==="
  BENCH_QUANT=int8 python bench.py
} 2>&1 | tee perf/sweep_r3e.log
