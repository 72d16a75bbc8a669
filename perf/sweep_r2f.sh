#!/bin/bash
# Round-2 sweep F: confirm pure defaults (924 target), accum-scan unroll,
# and a profiler-capture attempt through the tunnel.
cd /root/repo
LOG=/root/repo/perf/sweep_r2f.log
: > $LOG
run() { echo "=== $* ===" >> $LOG; env "$@" python bench.py $BS $STEPS >> $LOG 2>&1; }
STEPS=30
BS=32; run BENCH_DEFAULTS=1            # pure defaults after the flip
BS=32; run BENCH_ACCUM_UNROLL=2
BS=32; run BENCH_ACCUM_UNROLL=8
echo "=== profile_step 32 5 ===" >> $LOG
timeout 900 python perf/profile_step.py 32 5 >> $LOG 2>&1
echo DONE >> $LOG
