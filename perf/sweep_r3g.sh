#!/bin/bash
# Round-3 sweep g:
# 1) BENCH_MODEL=ViT-B/32 now auto-applies the production regime
#    (mb128 x 4, accum-unroll 2) — reconfirm it reproduces ~2370 pairs/s.
# 2) CFA_ATTN_LAYOUT=flat probe: rank-3 attention gemms (heads folded
#    into the batch dim) on B/32 and B/16 — tests whether the 34 GB/s
#    (b,h)-batched-gemm relayout copies (TRACE_ANALYSIS round 3) are
#    rank-sensitive.
set -x
cd "$(dirname "$0")/.."
{
  echo "=== ViT-B/32 new per-model defaults (mb128x4, accum-unroll 2) ==="
  BENCH_MODEL=ViT-B/32 python bench.py
  echo "=== ViT-B/32 CFA_ATTN_LAYOUT=flat ==="
  CFA_ATTN_LAYOUT=flat BENCH_MODEL=ViT-B/32 python bench.py
  echo "=== ViT-B/16 CFA_ATTN_LAYOUT=flat ==="
  CFA_ATTN_LAYOUT=flat python bench.py
} 2>&1 | tee perf/sweep_r3g.log
