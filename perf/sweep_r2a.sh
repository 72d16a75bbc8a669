#!/bin/bash
# Round-2 perf sweep A: remat / unroll / microbatch on the real chip.
cd /root/repo
LOG=/root/repo/perf/sweep_r2a.log
: > $LOG
run() {
  echo "=== $* ===" >> $LOG
  env "$@" python bench.py $BS $STEPS >> $LOG 2>&1
}
STEPS=30
BS=32; run BENCH_REMAT=dots BENCH_ACCUM=8     # re-baseline + MFU
BS=32; run BENCH_REMAT=0 BENCH_ACCUM=8        # no remat, mb32
BS=64; run BENCH_REMAT=0 BENCH_ACCUM=4        # no remat, mb64
BS=32; run BENCH_REMAT=0 BENCH_ACCUM=8 BENCH_UNROLL=12  # unrolled layers
echo "DONE" >> $LOG
