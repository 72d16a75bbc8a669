#!/bin/bash
# Round-5 sweep B (take 2): Pallas attention grid tuning at CLIP's short
# sequences (VERDICT r4 item 3). Take 1 exposed a real bug: under the
# bshd default layout the kernel's auto head-group (G=6, sized by the
# long-S VMEM budget) violates Mosaic's block-tiling constraint
# (second-to-last block dim must be %8 or == H) — BENCH_PALLAS=1 had
# been broken since bshd became the default (the r2/r3 Pallas numbers
# ran bhsd). Fixed in ops/attention.py::_prepare (G snaps to a valid
# divisor); this sweep measures the three distinct geometries that
# exist post-fix:
#   1. bshd, G=H (12 vision / 8 text) — in-VMEM head reorder, widest MXU
#   2. bhsd, auto G (6 vision)        — host-side transpose, narrower
#   3. bhsd, G=12                     — host-side transpose, widest
# Prior art: auto-bhsd lost in every earlier regime (812 vs 924 r2
# stacked; 1626 vs 2369 B/32 r3) but was never measured under the
# CURRENT B/16 default (unstacked + accum-unroll 1). ~35 min/config.
cd /root/repo
LOG=/root/repo/perf/sweep_r5b.log
: > $LOG
run() { echo "=== $* ===" >> $LOG; env "$@" python bench.py >> $LOG 2>&1; }
run BENCH_PALLAS=1
run BENCH_PALLAS=1 CFA_ATTN_LAYOUT=bhsd
run BENCH_PALLAS=1 CFA_ATTN_LAYOUT=bhsd CFA_PALLAS_HEAD_GROUP=12
echo DONE >> $LOG
