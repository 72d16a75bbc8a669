#!/bin/bash
# Round-2 sweep E: does the fused SPARC (fwd+bwd Pallas) earn its keep?
#  1. end-to-end train bench, fused SPARC only (XLA attention), best config
#  2. isolated op microbench, Pallas vs XLA, production shape
cd /root/repo
LOG=/root/repo/perf/sweep_r2e.log
: > $LOG
echo "=== BENCH_FUSED_SPARC=1 BENCH_REMAT=0 BENCH_ACCUM=8 BENCH_UNROLL=12 ===" >> $LOG
env BENCH_FUSED_SPARC=1 BENCH_REMAT=0 BENCH_ACCUM=8 BENCH_UNROLL=12 \
    python bench.py 32 30 >> $LOG 2>&1
echo "=== sparc_microbench 256 50 ===" >> $LOG
python perf/sparc_microbench.py 256 50 >> $LOG 2>&1
echo DONE >> $LOG
