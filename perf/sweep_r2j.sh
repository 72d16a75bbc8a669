#!/bin/bash
# Round-2 sweep J: ViT-B/32 regime search under the unstacked layout
# (mb128 x 4 = 2339.6 at 0.53 MFU — lower MFU than B/16's 0.63 suggests
# a better tiling exists).
cd /root/repo
LOG=/root/repo/perf/sweep_r2j.log
: > $LOG
run() { echo "=== $* ===" >> $LOG; env BENCH_MODEL=ViT-B/32 "$@" python bench.py $BATCH 20 >> $LOG 2>&1; }
BATCH=256 run BENCH_ACCUM=2
BATCH=64  run BENCH_ACCUM=8
BATCH=512 run BENCH_ACCUM=1
echo DONE >> $LOG
