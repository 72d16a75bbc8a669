#!/bin/bash
# Round-3 sweep C: Pallas fused attention with the NEW bshd layout
# (in-kernel head transpose) on ViT-B/32 — attacks both the 32 ms
# relayout-copy class and the 23.5 ms attention-einsum class at S=50.
# Control: XLA bshd = 2355.3 (sweep_r3a), best-so-far 2369.7 (unroll 2).
cd /root/repo
LOG=/root/repo/perf/sweep_r3c.log
: > $LOG
run() { echo "=== $* ===" >> $LOG; env "$@" python bench.py $BS $STEPS >> $LOG 2>&1; }
STEPS=30
BS=128; run BENCH_MODEL=ViT-B/32 BENCH_ACCUM=4 BENCH_PALLAS=1 BENCH_FUSED_SPARC=0
echo DONE >> $LOG
# Re-run appended: the first measurement overlapped a concurrent CPU
# pytest run (tunnel-starvation hazard, CLAUDE.md); re-measure idle.
