#!/bin/bash
# Round-3 sweep B: remaining B/32 levers after the layout null (sweep_r3a):
#  1. fast-LN — the 16.8 ms convert_reduce (LN fp32 stats) class
#  2/3. accum-scan unroll 2/4 — pipeline the ~34 GB/s attention layout
#     copies against the next microbatch's MXU work (B/16 unstacked showed
#     unroll 1 best, but B/32's non-matmul share is 2x larger)
cd /root/repo
LOG=/root/repo/perf/sweep_r3b.log
: > $LOG
run() { echo "=== $* ===" >> $LOG; env "$@" python bench.py $BS $STEPS >> $LOG 2>&1; }
STEPS=30
BS=128; run BENCH_MODEL=ViT-B/32 BENCH_ACCUM=4 CFA_FAST_LAYERNORM=1
BS=128; run BENCH_MODEL=ViT-B/32 BENCH_ACCUM=4 BENCH_ACCUM_UNROLL=2
BS=128; run BENCH_MODEL=ViT-B/32 BENCH_ACCUM=4 BENCH_ACCUM_UNROLL=4
echo DONE >> $LOG
