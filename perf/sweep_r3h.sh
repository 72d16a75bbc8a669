#!/bin/bash
# Round-3 sweep h: complete the serving-path table (BASELINE.md recorded
# only ViT-B/16). Device-resident uint8 pixels through the fused
# on-device rescale+normalize; one batched forward per modality.
set -x
cd "$(dirname "$0")/.."
{
  echo "=== serve ViT-B/32 (batch 512) ==="
  python perf/serve_bench.py ViT-B/32 512 20
  echo "=== serve ViT-L/14 (batch 256) ==="
  python perf/serve_bench.py ViT-L/14 256 20
} 2>&1 | tee perf/sweep_r3h.log
