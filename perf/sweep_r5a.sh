#!/bin/bash
# Round-5 sweep A: VERDICT r4 levers on the B/16 production regime
# (unstacked + bshd + accum-unroll 1, mb32 x 8 = the 1012 pairs/s
# default).
#  1. pure default        — headline reconfirm after the round-5 model
#                           edits (fused-QKV plumbing must cost nothing
#                           when off)
#  2. CFA_FUSED_QKV=1     — one [D,3D] projection GEMM (round 1 lost in
#                           the stacked/flat regime; regime changed)
#  3. mb64 x 4            — unstacked regime never measured above mb32
#  4. fused-QKV + mb64x4  — the two combined, if either helps
cd /root/repo
LOG=/root/repo/perf/sweep_r5a.log
: > $LOG
run() { echo "=== $* ===" >> $LOG; env "$@" python bench.py >> $LOG 2>&1; }
run BENCH_NOOP=1
run CFA_FUSED_QKV=1
echo "=== mb64 x 4 ===" >> $LOG
BENCH_ACCUM=4 python bench.py 64 30 >> $LOG 2>&1
echo "=== CFA_FUSED_QKV=1 mb64 x 4 ===" >> $LOG
CFA_FUSED_QKV=1 BENCH_ACCUM=4 python bench.py 64 30 >> $LOG 2>&1
echo DONE >> $LOG
