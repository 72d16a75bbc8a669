#!/bin/bash
# Round-2 sweep G: probes guided by the Perfetto trace (perf/trace/...):
# convert_reduce (LN fp32 stats) = 23.6 ms/step, so retest fast-LN at the
# new default regime; fused SPARC on top of accum-unroll 2; accum-unroll 4.
cd /root/repo
LOG=/root/repo/perf/sweep_r2g.log
: > $LOG
run() { echo "=== $* ===" >> $LOG; env "$@" python bench.py 32 30 >> $LOG 2>&1; }
run CFA_FAST_LAYERNORM=1
run BENCH_FUSED_SPARC=1
run BENCH_ACCUM_UNROLL=4
echo DONE >> $LOG
