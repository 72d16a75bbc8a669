#!/bin/bash
# Round-3 sweep A: transpose-free attention layout (CFA_ATTN_LAYOUT=bshd)
# vs the torch-style bhsd layout. Motivated by the B/32 trace: the head
# split/merge transposes cost 32 ms of the 219 ms step (copy class at
# ~34 GB/s). Controls: round-2 numbers 2339.6 (B/32 mb128x4) and 1000.4
# (B/16 mb32x8).
cd /root/repo
LOG=/root/repo/perf/sweep_r3a.log
: > $LOG
run() { echo "=== $* ===" >> $LOG; env "$@" python bench.py $BS $STEPS >> $LOG 2>&1; }
STEPS=30
BS=128; run BENCH_MODEL=ViT-B/32 BENCH_ACCUM=4 CFA_ATTN_LAYOUT=bshd
BS=128; run BENCH_MODEL=ViT-B/32 BENCH_ACCUM=4 CFA_ATTN_LAYOUT=bhsd
BS=32;  run CFA_ATTN_LAYOUT=bshd
BS=32;  run CFA_ATTN_LAYOUT=bhsd
echo DONE >> $LOG
