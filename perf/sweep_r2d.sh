#!/bin/bash
# Round-2 sweep D (TPU idle — sweep C was polluted by a concurrent CPU
# test-suite run starving the tunnel client):
#  1. re-confirm the unroll=12/remat=0 winner
#  2. Pallas attention at the new best B/16 config
#  3. ViT-L/14@336 (S=577): XLA vs Pallas — the long-seq regime where the
#     fused kernel should win
cd /root/repo
LOG=/root/repo/perf/sweep_r2d.log
: > $LOG
run() { echo "=== $* ===" >> $LOG; env "$@" python bench.py $BS $STEPS >> $LOG 2>&1; }
STEPS=30
BS=32; run BENCH_REMAT=0 BENCH_ACCUM=8 BENCH_UNROLL=12
BS=32; run BENCH_REMAT=0 BENCH_ACCUM=8 BENCH_UNROLL=12 BENCH_PALLAS=1
STEPS=10
BS=8;  run BENCH_MODEL=ViT-L/14@336 BENCH_REMAT=dots BENCH_ACCUM=4 BENCH_UNROLL=1
BS=8;  run BENCH_MODEL=ViT-L/14@336 BENCH_REMAT=dots BENCH_ACCUM=4 BENCH_UNROLL=1 BENCH_PALLAS=1
echo DONE >> $LOG
