#!/bin/bash
cd /root/repo
LOG=/root/repo/perf/sweep_r2b.log
: > $LOG
run() { echo "=== $* ===" >> $LOG; env "$@" python bench.py $BS $STEPS >> $LOG 2>&1; }
STEPS=30
BS=32; run BENCH_REMAT=dots BENCH_ACCUM=8 BENCH_UNROLL=12
BS=64; run BENCH_REMAT=0 BENCH_ACCUM=4 BENCH_UNROLL=12
BS=16; run BENCH_REMAT=0 BENCH_ACCUM=16 BENCH_UNROLL=12
BS=32; run BENCH_REMAT=0 BENCH_ACCUM=8 BENCH_UNROLL=4
echo DONE >> $LOG
