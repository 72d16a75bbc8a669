#!/bin/bash
# Round-3 sweep D: complete the model table at the new bshd default.
#  1. ViT-L/14 mb32x8 (round-2 best 223.1 under bhsd)
#  2. B/16 accum-unroll 2 under bshd (unroll 1 won under bhsd; re-check)
#  3. serving-path embedder throughput under bshd (round-2: 3029 img/s)
cd /root/repo
LOG=/root/repo/perf/sweep_r3d.log
: > $LOG
run() { echo "=== $* ===" >> $LOG; env "$@" python bench.py $BS $STEPS >> $LOG 2>&1; }
STEPS=10
BS=32; run BENCH_MODEL=ViT-L/14 BENCH_ACCUM=8
STEPS=30
BS=32; run BENCH_ACCUM_UNROLL=2
echo "=== serve_bench ===" >> $LOG
python perf/serve_bench.py >> $LOG 2>&1
echo DONE >> $LOG
