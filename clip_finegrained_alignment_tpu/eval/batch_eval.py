"""Train-time counting accuracy + probability confusion matrix (protocol of
``/root/reference/finetune/evaluate.py:6-69``, invoked per-epoch by the
count trainer, ``count_finetuner.py:153-168``).

Per sample: cosine similarity of the image embedding against the GT caption
and each counterfactual caption, softmax over the 10 possible counts, a
probability-weighted confusion matrix normalized per true count, and argmax
accuracy.

TPU redesign: the reference loops per sample and per caption with one text
forward each (``evaluate.py:20-34`` — ~10·B serial device round-trips). Here
all B·10 captions encode in one batched text forward and similarities are
one einsum — the exact fix SURVEY.md §3.3 calls out.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLIPConfig
from ..models import clip as m

POSSIBLE_COUNTS = tuple(range(1, 11))  # evaluate.py:13


def evaluate_batch(params, cfg: CLIPConfig, batch: Dict[str, np.ndarray],
                   *, dtype=jnp.float32, filename: Optional[str] = None
                   ) -> Tuple[float, np.ndarray, List[Dict]]:
    """``batch``: pixel_values [B,S,S,3] (uint8 or normalized f32),
    input_ids [B,T] (GT captions), cf_input_ids [B,9,T], count [B],
    cf_counts [B,9]. Returns (accuracy, confusion [10,10], results)."""
    px = jnp.asarray(batch["pixel_values"])
    if px.dtype == jnp.uint8:
        from ..data.preprocess import normalize_batch
        px = normalize_batch(px.astype(jnp.float32) / 255.0)
    ids = jnp.asarray(batch["input_ids"])
    cf = jnp.asarray(batch["cf_input_ids"])
    gt_counts = np.asarray(batch["count"])
    cf_counts = np.asarray(batch["cf_counts"])
    B, N, T = cf.shape

    @jax.jit
    def sims(params, px, ids, cf):
        img = m.encode_image(params, px, cfg, dtype=dtype)        # [B, P]
        txt = m.encode_text(params, ids, cfg, dtype=dtype)        # [B, P]
        cf_txt = m.encode_text(params, cf.reshape(B * N, T), cfg,
                               dtype=dtype).reshape(B, N, -1)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        cf_txt = cf_txt / jnp.linalg.norm(cf_txt, axis=-1, keepdims=True)
        gt_sim = jnp.sum(img * txt, axis=-1)                      # [B]
        cf_sim = jnp.einsum("bd,bnd->bn", img, cf_txt)            # [B, N]
        return gt_sim, cf_sim

    gt_sim, cf_sim = jax.tree.map(np.asarray, sims(params, px, ids, cf))

    K = len(POSSIBLE_COUNTS)
    confusion = np.zeros((K, K))
    occurrences = np.zeros(K)
    results = []
    for i in range(B):
        similarities = np.zeros(K)
        similarities[int(gt_counts[i]) - 1] = gt_sim[i]
        for c, s in zip(cf_counts[i], cf_sim[i]):
            similarities[int(c) - 1] = s
        # softmax over raw cosine similarities (evaluate.py:36)
        e = np.exp(similarities - similarities.max())
        probs = e / e.sum()
        t = int(gt_counts[i]) - 1
        confusion[t] += probs
        occurrences[t] += 1
        pred = int(np.argmax(similarities)) + 1
        results.append({"true_count": int(gt_counts[i]),
                        "pred_count": pred,
                        "correct": pred == int(gt_counts[i]),
                        "similarities": similarities})
    nz = occurrences > 0
    confusion[nz] /= occurrences[nz, None]

    if filename:
        from .viz import plot_probability_confusion
        plot_probability_confusion(confusion, list(POSSIBLE_COUNTS),
                                   filename)

    accuracy = sum(r["correct"] for r in results) / max(len(results), 1)
    return accuracy, confusion, results
