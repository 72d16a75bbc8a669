#!/usr/bin/env bash
# Preemption rehearsal on the real chip: start a ViT-B/32 SPARC fine-tune,
# SIGTERM it mid-epoch (the TPU-maintenance/cluster kill), and verify
#   1. the run commits an atomic <ckpt>/preempt checkpoint and exits 0;
#   2. --resume <ckpt>/preempt is step-exact (skips the completed steps
#      of the interrupted epoch) and finishes the run.
# The engine behavior is pinned bit-exactly on the CPU mesh
# (tests/test_train_engine.py::test_preempt_saves_and_resume_is_step_exact);
# this script is the hardware drill for the real SIGTERM path.
#
# Run:  bash perf/preempt_rehearsal.sh | tee perf/preempt_rehearsal.log
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${OUT:-/tmp/preempt_rehearsal}
MODEL=${MODEL:-ViT-B/32}
SAMPLES=${SAMPLES:-2048}
BATCH=${BATCH:-32}
EPOCHS=${EPOCHS:-20}        # 64 steps/epoch at 2048/32; the ~20 per-epoch
                            # orbax saves keep the run alive long enough
                            # for the signal to land mid-run
WAIT_STEPS=${WAIT_STEPS:-5} # deliver SIGTERM shortly after steps start
rm -rf "$OUT"; mkdir -p "$OUT"

echo "== stage 1: procedural dataset ($SAMPLES samples) =="
python -m clip_finegrained_alignment_tpu.cli.generate_data \
  --procedural --output-dir "$OUT/data" --num-samples "$SAMPLES" \
  --annotation-mode count --seed 11 >/dev/null
echo ok

echo "== stage 2: train $MODEL, SIGTERM after step $WAIT_STEPS =="
CFA_ALLOW_HASH_TOKENIZER=1 \
python -m clip_finegrained_alignment_tpu.cli.train \
  --annotations "$OUT/data/synthetic_annotations.json" \
  --model "$MODEL" --loss-type sparc --inverse-temperature 0.07 \
  --batch-size "$BATCH" --grad-accum 1 --epochs "$EPOCHS" \
  --experiment-name preempt --checkpoint-dir "$OUT/ckpts" \
  --save-every 1 --log-every 1 --metrics-file "$OUT/metrics.jsonl" \
  > "$OUT/train.log" 2>&1 &
PID=$!
echo "$PID" > "$OUT/train.pid"

# Wait for WAIT_STEPS optimizer steps (first one lands after the ~6 min
# remote compile), then deliver the preemption signal. Tight polling —
# the steps themselves are ~15 ms; the epoch-end orbax saves are what
# keep the process alive while the signal is in flight.
for i in $(seq 1 2400); do
  if ! kill -0 "$PID" 2>/dev/null; then
    echo "train exited before the signal — log tail:"; tail -5 "$OUT/train.log"; exit 1
  fi
  if grep -q "step $WAIT_STEPS " "$OUT/train.log"; then break; fi
  sleep 0.5
done
grep -q "step $WAIT_STEPS " "$OUT/train.log" || {
  echo "never reached step $WAIT_STEPS"; tail -5 "$OUT/train.log"; exit 1; }
echo "-- delivering SIGTERM at $(grep -o "step [0-9]* " "$OUT/train.log" | tail -1)--"
kill -TERM "$PID"
wait "$PID"; RC=$?
echo "train exit code: $RC (clean)"
[ "$RC" -eq 0 ] || exit 1
grep "preempted" "$OUT/train.log"

PRE="$OUT/ckpts/preempt/preempt"
test -f "$PRE/meta.json" || { echo "missing $PRE/meta.json"; exit 1; }
python - "$PRE" <<'EOF'
import json, sys
meta = json.load(open(sys.argv[1] + "/meta.json"))
assert meta["preempted"] is True, meta
print(f"preempt checkpoint committed: global_step={meta['global_step']} "
      f"epoch={meta['epoch']}")
EOF

echo "== stage 3: step-exact resume =="
CFA_ALLOW_HASH_TOKENIZER=1 \
python -m clip_finegrained_alignment_tpu.cli.train \
  --annotations "$OUT/data/synthetic_annotations.json" \
  --model "$MODEL" --loss-type sparc --inverse-temperature 0.07 \
  --batch-size "$BATCH" --grad-accum 1 --epochs "$EPOCHS" \
  --experiment-name preempt --checkpoint-dir "$OUT/ckpts" \
  --save-every 1 --log-every 1 --resume "$PRE" \
  > "$OUT/resume.log" 2>&1
grep "resumed from" "$OUT/resume.log"
grep -q "skipping" "$OUT/resume.log" || {
  echo "resume was not step-exact"; tail -5 "$OUT/resume.log"; exit 1; }
grep "done:" "$OUT/resume.log"
python - "$OUT" "$SAMPLES" "$BATCH" "$EPOCHS" <<'EOF'
import json, os, sys
out, samples, batch, epochs = sys.argv[1], *map(int, sys.argv[2:])
spe = samples // batch
meta = json.load(open(os.path.join(
    out, "ckpts/preempt", f"epoch_{epochs - 1}", "meta.json")))
assert meta["global_step"] == spe * epochs, \
    (meta["global_step"], spe * epochs)
print(f"resume completed the full run: global_step={meta['global_step']} "
      f"== {epochs} epochs x {spe} steps (no step lost, none repeated)")
EOF
echo "PREEMPT REHEARSAL OK"
