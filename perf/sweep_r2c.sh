#!/bin/bash
# Round-2 sweep C: unroll sweet spot + small-microbatch regime at remat=0.
cd /root/repo
LOG=/root/repo/perf/sweep_r2c.log
: > $LOG
run() { echo "=== $* ===" >> $LOG; env "$@" python bench.py $BS $STEPS >> $LOG 2>&1; }
STEPS=30
BS=32; run BENCH_REMAT=0 BENCH_ACCUM=8 BENCH_UNROLL=6
BS=32; run BENCH_REMAT=0 BENCH_ACCUM=8 BENCH_UNROLL=4
BS=32; run BENCH_REMAT=0 BENCH_ACCUM=8 BENCH_UNROLL=3
BS=16; run BENCH_REMAT=0 BENCH_ACCUM=16 BENCH_UNROLL=12
BS=32; run BENCH_REMAT=0 BENCH_ACCUM=8 BENCH_UNROLL=2
echo DONE >> $LOG
