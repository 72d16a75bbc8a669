#!/bin/bash
# Round-2 sweep H: combinations on top of the winning unstacked layout
# (992 pairs/s vs 951 stacked, BENCH_UNSTACK=1).
cd /root/repo
LOG=/root/repo/perf/sweep_r2h.log
: > $LOG
run() { echo "=== $* ===" >> $LOG; env "$@" python bench.py 32 30 >> $LOG 2>&1; }
run BENCH_UNSTACK=1 BENCH_FUSED_SPARC=1
run BENCH_UNSTACK=1 BENCH_ACCUM_UNROLL=4
run BENCH_UNSTACK=1 CFA_FAST_LAYERNORM=1
run BENCH_UNSTACK=1 BENCH_ACCUM_UNROLL=1
echo DONE >> $LOG
