#!/usr/bin/env bash
# End-to-end "learn to count" demonstration on the real chip — the
# reference's thesis workflow (README.md:3-5: train on a counting
# objective) executed hermetically: procedural data generation →
# counterfactual count fine-tune (count_finetuner.py behavior) with the
# per-epoch counting eval (count_finetuner.py:153-168) → accuracy
# trajectory.
#
# The environment is zero-egress (no pretrained weights), so the model
# trains FROM RANDOM INIT on the procedural dataset; the demonstration is
# that the full TPU-native pipeline learns the counting discrimination
# end-to-end (eval accuracy: chance = 0.1 over counts 1-10). Reference
# hyperparameters where they transfer; lr/wd retuned for random init
# (the reference fine-tunes from pretrained CLIP at lr 1e-5 — from
# scratch that underfits in any demonstrable budget).
#
# Run:  bash perf/e2e_learn_to_count.sh | tee perf/e2e_learn_to_count.log
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${OUT:-/tmp/e2e_count}
SAMPLES=${SAMPLES:-2048}
EPOCHS=${EPOCHS:-30}
MODEL=${MODEL:-ViT-B/32}
LR=${LR:-1e-4}
MIN_ACC=${MIN_ACC:-0.25}
rm -rf "$OUT"; mkdir -p "$OUT"

echo "== stage 1: procedural counting dataset ($SAMPLES samples) =="
python -m clip_finegrained_alignment_tpu.cli.generate_data \
  --procedural --output-dir "$OUT/data" --num-samples "$SAMPLES" \
  --max-objects 10 --size-category small --annotation-mode count \
  --seed 7 --visualize 4

echo "== stage 2: counterfactual count fine-tune ($MODEL, random init) =="
CFA_ALLOW_HASH_TOKENIZER=1 \
python -m clip_finegrained_alignment_tpu.cli.train \
  --annotations "$OUT/data/synthetic_annotations.json" \
  --model "$MODEL" --loss-type count \
  --optimizer adamw --lr "$LR" --weight-decay 0.01 \
  --batch-size 32 --grad-accum 4 --epochs "$EPOCHS" \
  --eval-every-epoch --experiment-name e2e_count \
  --checkpoint-dir "$OUT/ckpt" --metrics-file "$OUT/metrics.jsonl" \
  --unstack-layers --remat 0 --save-every 1000

echo "== stage 3: accuracy trajectory =="
MIN_ACC="$MIN_ACC" python - "$OUT/metrics.jsonl" <<'EOF'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1])]
accs = [(r["step"], r["count_eval_accuracy"]) for r in rows
        if "count_eval_accuracy" in r]
print(f"{'step':>6}  count_eval_accuracy")
for s, a in accs:
    print(f"{s:>6}  {a:.3f}")
first, best = accs[0][1], max(a for _, a in accs)
print(f"\nexchangeable chance = 0.100 (the pre-train anchor can sit above "
      f"it: candidates differ in one token, so a count-word prior "
      f"independent of the image biases a random-init model)")
print(f"pre-train anchor = {first:.3f}; best = {best:.3f}")
import os
assert best > float(os.environ.get("MIN_ACC", "0.25")), \
    "no learning signal — demonstration FAILED"
print("learning demonstrated: counting accuracy rose well above chance")
EOF

echo "== stage 4: CountBench-fixture eval, random init vs trained =="
# Same fixed fixture for both sides (fixtures are plumbing-shaped, not the
# real benchmark — the comparison shows the TRAINING moved the protocol
# metric, not a CountBench claim).
python - "$OUT" <<'EOF'
import sys
from clip_finegrained_alignment_tpu.data import fixtures
fixtures.make_countbench_fixture(sys.argv[1] + "/cb_fixture",
                                 num_samples=200, seed=11)
EOF
BEST=$(ls -d "$OUT"/ckpt/*/best 2>/dev/null | head -1)
echo "trained checkpoint: $BEST"
for side in random trained; do
  CKPT_FLAG=""
  [ "$side" = trained ] && CKPT_FLAG="--checkpoint $BEST"
  CFA_ALLOW_HASH_TOKENIZER=1 \
  python -m clip_finegrained_alignment_tpu.cli.evaluate countbench \
    --model "$MODEL" $CKPT_FLAG \
    --dataset "$OUT/cb_fixture/countbench_fixture.json" \
    --confidence 0.2 --margin 0.01 --format word --position first \
    --output-dir "$OUT/cb_$side" | tee "$OUT/cb_$side.json"
done
python - "$OUT" <<'EOF'
import json, re, sys
out = sys.argv[1]
def metrics(p):
    txt = open(p).read()
    return json.loads(txt[txt.index("{"):])
r, t = metrics(f"{out}/cb_random.json"), metrics(f"{out}/cb_trained.json")
for k in ("accuracy", "argmax_accuracy"):
    print(f"{k}: random-init {r[k]:.3f} -> trained {t[k]:.3f}")
EOF
