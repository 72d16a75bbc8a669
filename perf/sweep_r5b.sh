#!/bin/bash
# Round-5 sweep B: Pallas attention grid tuning at CLIP's short
# sequences (VERDICT r4 item 3). The kernel's auto head-group picks
# G=6 for the ViT-B/16 vision tower (VMEM budget sized for the
# long-S backward wall, ops/attention.py::_prepare); at S=197 the
# [S,S] tiles are small enough that wider (G=12: one cell per batch
# element, max MXU fill per call) or narrower (G=2: 6x the grid
# parallelism) groups are both live alternatives. Prior art: the auto
# kernel lost end-to-end in every earlier regime (812 vs 924 r2
# stacked; 1626 vs 2369 B/32 r3), but was never measured under the
# CURRENT B/16 default (unstacked + bshd + accum-unroll 1).
# ~35 min/config: each distinct Pallas kernel adds ~5 min remote
# compile in the tunnel environment.
cd /root/repo
LOG=/root/repo/perf/sweep_r5b.log
: > $LOG
run() { echo "=== $* ===" >> $LOG; env "$@" python bench.py >> $LOG 2>&1; }
run BENCH_PALLAS=1
run BENCH_PALLAS=1 CFA_PALLAS_HEAD_GROUP=12
run BENCH_PALLAS=1 CFA_PALLAS_HEAD_GROUP=2
echo DONE >> $LOG
