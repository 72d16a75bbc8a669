#!/bin/bash
# Round-3 sweep i: does XLA flag tuning move the default regime?
# Probe: scoped-VMEM limit (deeper fusions at larger budgets — the one
# single-chip-relevant knob in the usual TPU tuning set). Also answers
# whether XLA_FLAGS propagate through the remote-compile tunnel at all:
# a changed limit that compiles differently shifts step time or HBM.
set -x
cd "$(dirname "$0")/.."
{
  echo "=== default (reference point) ==="
  python bench.py
  echo "=== scoped vmem 65536 KiB ==="
  XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536 python bench.py
  echo "=== scoped vmem 32768 KiB ==="
  XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=32768 python bench.py
} 2>&1 | tee perf/sweep_r3i.log
