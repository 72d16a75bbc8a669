#!/bin/bash
# Round-2 sweep I: other model families under the unstacked regime.
cd /root/repo
LOG=/root/repo/perf/sweep_r2i.log
: > $LOG
run() { echo "=== $* ===" >> $LOG; env "$@" python bench.py $BATCH $STEPS >> $LOG 2>&1; }
BATCH=128 STEPS=20 run BENCH_MODEL=ViT-B/32 BENCH_ACCUM=4
BATCH=64 STEPS=10 run BENCH_MODEL=ViT-L/14 BENCH_ACCUM=4 BENCH_REMAT=dots
BATCH=32 STEPS=10 run BENCH_MODEL=ViT-L/14 BENCH_ACCUM=8 BENCH_REMAT=0
echo DONE >> $LOG
