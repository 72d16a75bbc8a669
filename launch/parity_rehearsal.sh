#!/usr/bin/env bash
# One-command eval-parity rehearsal (VERDICT round-1 item 10).
#
# Run this on a NETWORKED host that has both stacks available:
#   * this repo (jax)                        — the TPU-native framework
#   * /path/to/reference (torch, HF, clip)   — tpeat/clip-finegrained-alignment
#
# It downloads the real datasets + weights, runs the reference's three
# evaluation protocols and ours with the production flags
# (count-bench/launch_cb_eval.sh:16-17, vlms-are-blind/launch_eval.sh:15-17),
# and emits the +-0.5% comparison table the BASELINE.json parity contract
# asks for. The build environment itself is zero-egress, so this script is
# the packaged "press enter on the right machine" step.
#
# Usage:
#   REFERENCE=/root/reference OUT=parity_out bash launch/parity_rehearsal.sh
set -euo pipefail

REFERENCE=${REFERENCE:-/root/reference}
OUT=${OUT:-parity_rehearsal}
MODEL_CB=${MODEL_CB:-ViT-B/32}
MODEL_VB=${MODEL_VB:-ViT-L/14}
HF_CB=${HF_CB:-openai/clip-vit-base-patch32}
HF_VB=${HF_VB:-openai/clip-vit-large-patch14}
mkdir -p "$OUT"

echo "== stage 0: artifacts (HF datasets + weights + CLIP BPE vocab) =="
python - <<'EOF'
# Warm the HF caches so both stacks read the same snapshots.
from datasets import load_dataset
from transformers import CLIPModel, CLIPProcessor
import os
load_dataset("nielsr/countbench")
load_dataset("XAI/vlmsareblind", split="valid")
for name in (os.environ.get("HF_CB", "openai/clip-vit-base-patch32"),
             os.environ.get("HF_VB", "openai/clip-vit-large-patch14")):
    CLIPModel.from_pretrained(name)
    CLIPProcessor.from_pretrained(name)
EOF
if [ -z "${CLIP_BPE_PATH:-}" ]; then
  # The OpenAI CLIP BPE vocab ships inside the clip package; else download.
  CLIP_BPE_PATH=$(python - <<'EOF'
try:
    import clip, os
    print(os.path.join(os.path.dirname(clip.__file__),
                       "bpe_simple_vocab_16e6.txt.gz"))
except ImportError:
    import urllib.request, os
    url = ("https://github.com/openai/CLIP/raw/main/clip/"
           "bpe_simple_vocab_16e6.txt.gz")
    dst = os.path.abspath("bpe_simple_vocab_16e6.txt.gz")
    if not os.path.exists(dst):
        urllib.request.urlretrieve(url, dst)
    print(dst)
EOF
)
  export CLIP_BPE_PATH
fi
echo "CLIP_BPE_PATH=$CLIP_BPE_PATH"

echo "== stage 1: reference protocols (torch) =="
# Flag names per cb_eval.py:409-425 / eval.py:352-358; the vlms script has
# no --output_dir (it derives one from the model name in $PWD), so run it
# from inside $OUT/ref_vlmsblind.
ABS_OUT=$(cd "$OUT" && pwd)
( cd "$REFERENCE/count-bench" && python cb_eval.py \
    --model "$HF_CB" --confidence 0.2 --margin 0.01 \
    --number_format word --template_position first \
    --output_dir "$ABS_OUT/ref_countbench" ) \
  | tee "$OUT/ref_countbench.log"
mkdir -p "$OUT/ref_vlmsblind"
( cd "$OUT/ref_vlmsblind" && python "$REFERENCE/vlms-are-blind/eval.py" \
    --model "$HF_VB" --confidence 0.25 --margin 0.01 ) \
  | tee "$OUT/ref_vlmsblind.log"

echo "== stage 2: our protocols (jax) =="
python -m clip_finegrained_alignment_tpu.cli.evaluate countbench \
  --model "$MODEL_CB" --pretrained "$HF_CB" \
  --confidence 0.2 --margin 0.01 --format word --position first \
  --output-dir "$OUT/tpu_countbench" \
  > "$OUT/tpu_countbench.json"
python -m clip_finegrained_alignment_tpu.cli.evaluate vlmsblind \
  --model "$MODEL_VB" --pretrained "$HF_VB" \
  --confidence 0.25 --margin 0.01 \
  --output-dir "$OUT/tpu_vlmsblind" \
  > "$OUT/tpu_vlmsblind.json"

echo "== stage 3: +-0.5% comparison table =="
python - "$OUT" <<'EOF'
import glob, json, os, re, sys
import numpy as np

out = sys.argv[1]
rows = []

def add(suite, metric, ref, ours):
    ok = abs(ref - ours) <= 0.005 * max(1.0, abs(ref)) \
        if max(abs(ref), abs(ours)) > 1.0 else abs(ref - ours) <= 0.005
    rows.append((suite, metric, ref, ours, "PASS" if ok else "FAIL"))

# Reference CountBench: metrics inside the saved .npy results blob
# (cb_eval.py:466-475); fall back to grepping the log.
ref_cb = {}
for f in glob.glob(os.path.join(out, "ref_countbench", "*.npy")):
    blob = np.load(f, allow_pickle=True).item()
    ref_cb = blob.get("metrics", blob)
if not ref_cb:
    txt = open(os.path.join(out, "ref_countbench.log")).read()
    for key in ("accuracy", "argmax_accuracy", "average_confidence",
                "high_confidence_accuracy"):
        m = re.search(rf"{key}\D+([0-9.]+)", txt)
        if m:
            ref_cb[key] = float(m.group(1))
ours_cb = json.load(open(os.path.join(out, "tpu_countbench.json")))
for k in sorted(set(ref_cb) & set(ours_cb)):
    if isinstance(ref_cb[k], (int, float)) and isinstance(ours_cb[k],
                                                          (int, float)):
        add("countbench", k, float(ref_cb[k]), float(ours_cb[k]))

# Reference VLMs-are-Blind: per-task results_<task>.npy dumps
# (eval.py:403-410), written under a model-name dir inside ref_vlmsblind.
def norm(s):
    return re.sub(r"[^a-z0-9]", "", s.lower())

ours_vb = json.load(open(os.path.join(out, "tpu_vlmsblind.json")))
ours_by_norm = {norm(k): v for k, v in ours_vb.items()
                if isinstance(v, dict)}
for f in glob.glob(os.path.join(out, "ref_vlmsblind", "**", "*.npy"),
                   recursive=True):
    blob = np.load(f, allow_pickle=True).item()
    stem = os.path.basename(f).replace(".npy", "")
    stem = re.sub(r"^results_", "", stem)
    ref_acc = blob.get("metrics", {}).get("accuracy")
    task_ours = ours_by_norm.get(norm(stem), {})
    if ref_acc is not None and "accuracy" in task_ours:
        add("vlmsblind", stem, float(ref_acc),
            float(task_ours["accuracy"]))

w = max(len(r[1]) for r in rows) if rows else 10
print(f"{'suite':<12} {'metric':<{w}} {'reference':>10} {'tpu':>10}  verdict")
fails = 0
for suite, metric, ref, ours, verdict in rows:
    fails += verdict == "FAIL"
    print(f"{suite:<12} {metric:<{w}} {ref:>10.4f} {ours:>10.4f}  {verdict}")
json.dump([{"suite": s, "metric": m, "reference": r, "tpu": o,
            "verdict": v} for s, m, r, o, v in rows],
          open(os.path.join(out, "parity_table.json"), "w"), indent=2)
print(f"\n{len(rows)} comparisons, {fails} outside +-0.5% "
      f"-> {os.path.join(out, 'parity_table.json')}")
if not rows:
    # Zero extracted comparisons means a results-file glob or log-format
    # assumption broke upstream — that is a rehearsal FAILURE, not a pass.
    print("ERROR: no metric pairs extracted; refusing to report parity",
          file=sys.stderr)
    sys.exit(2)
sys.exit(1 if fails else 0)
EOF

# -- stage 4 (optional): training-surface rehearsal with the round-4/5 -----
# fast path. Gated on COCO_DIR (the synthetic generator's source data,
# gen_synthetic_data.py:127-138); everything above is eval-only parity.
# Exercises: synthetic data gen -> one-time pack (decode-free ingest) ->
# fine-tune *pretrained* CLIP with --packed --device-data --grad-cache
# (full-effective-batch negatives) -> CountBench A/B on the tuned
# checkpoint vs the zero-shot run from stage 2.
if [ -n "${COCO_DIR:-}" ]; then
  echo "== stage 4: train-surface rehearsal (COCO_DIR=$COCO_DIR) =="
  python -m clip_finegrained_alignment_tpu.cli.generate_data \
    --coco-dir "$COCO_DIR" --output-dir "$OUT/synthetic" \
    --num-samples "${N_SYNTH:-50000}" --size-category small \
    --annotation-mode count --seed 42
  python -m clip_finegrained_alignment_tpu.cli.pack_dataset \
    --annotations "$OUT/synthetic/synthetic_annotations.json" \
    --output "$OUT/synthetic_packed" --model "$MODEL_CB" --loss-type sparc
  python -m clip_finegrained_alignment_tpu.cli.train \
    --packed "$OUT/synthetic_packed" --device-data \
    --model "$MODEL_CB" --pretrained "$HF_CB" \
    --loss-type sparc --optimizer adamspd \
    --batch-size 32 --grad-accum 4 --epochs "${EPOCHS:-10}" --lr 2e-5 \
    --global-negatives --grad-cache \
    --experiment-name parity_finetune --checkpoint-dir "$OUT/ckpt"
  python -m clip_finegrained_alignment_tpu.cli.evaluate countbench \
    --model "$MODEL_CB" --checkpoint "$OUT/ckpt/parity_finetune/best" \
    --confidence 0.2 --margin 0.01 --format word --position first \
    --output-dir "$OUT/tuned_countbench" \
    > "$OUT/tuned_countbench.json"
  echo "tuned-vs-zero-shot CountBench: compare $OUT/tuned_countbench.json"
  echo "against $OUT/tpu_countbench.json"
fi
