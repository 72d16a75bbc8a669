"""Shared zero-shot scoring machinery for all evaluators.

The reference evaluators run serially — one CLIP forward per sample, each
with a ragged list of templates (``cb_eval.py:247-258``,
``vlms-are-blind/eval.py:240-287``, ``crop_eval.py:138-159``). On TPU that
shape churn would force a recompile per sample; here every evaluator shares
one jitted scorer over **fixed-shape padded template slots**:

    pixel_values [B, S, S, 3], template_ids [B, NT, T], template_mask [B, NT]
      → probs [B, NT]  (masked softmax over each sample's templates)

Samples with fewer than NT templates pad with masked slots (SURVEY.md §7
hard part (e)); whole datasets stream through in batches, so the eval that
took one forward per sample takes one forward per B samples.

The thresholded-correctness rule (``cb_eval.py:280-284``,
``vlms-are-blind/eval.py:276-278``) is a vectorized helper shared by both.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..config import CLIPConfig
from ..models import clip as m

NEG = -1e9


class TemplateScorer:
    """Jitted image×templates probability scorer.

    ``mesh``: optional ``jax.sharding.Mesh`` — shard the sample batch
    over its ``data`` axis and replicate params, so one eval streams
    data-parallel across every chip (the reference runs all three
    protocols on 1 GPU, serially — ``launch_cb_eval.sh``; here the same
    protocol saturates a v5e-8 with no code change in the evaluators).
    Requires ``pad_to_batch`` divisible by the data-axis size; the
    partitioner splits both tower forwards per chip and all-gathers only
    the [B, NT] probs.
    """

    def __init__(self, params, cfg: CLIPConfig, *, dtype=jnp.float32,
                 use_pallas: bool = False,
                 pad_to_batch: Optional[int] = None,
                 mesh: Optional[Mesh] = None):
        self.cfg = cfg
        # A dataset's final partial batch would otherwise trace a second
        # program shape (~6 min on the remote-compile TPU path). With
        # pad_to_batch set, short batches pad with masked slots (uniform
        # probs over NEG logits, sliced off) and reuse the one compiled
        # shape.
        self.pad_to_batch = pad_to_batch
        self._batch_sharding = None
        if mesh is not None:
            from ..parallel import mesh as pmesh
            dp = mesh.shape.get(pmesh.DATA_AXIS, 1)
            if pad_to_batch is None or pad_to_batch % dp != 0:
                raise ValueError(
                    f"mesh eval needs pad_to_batch divisible by the "
                    f"data axis ({dp}); got {pad_to_batch}")
            self._batch_sharding = pmesh.batch_sharding(mesh)
            params = jax.tree.map(
                lambda x: jax.device_put(x, pmesh.replicated(mesh)),
                params)
        self.params = params

        @jax.jit
        def score(params, pixel_values, template_ids, template_mask):
            B, NT, T = template_ids.shape
            img = m.encode_image(params, pixel_values, cfg, dtype=dtype,
                                 use_pallas=use_pallas)       # [B, P]
            txt = m.encode_text(params, template_ids.reshape(B * NT, T),
                                cfg, dtype=dtype,
                                use_pallas=use_pallas)        # [B*NT, P]
            img = img.astype(jnp.float32)
            txt = txt.astype(jnp.float32).reshape(B, NT, -1)
            img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
            txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
            scale = jnp.exp(params["logit_scale"].astype(jnp.float32))
            logits = jnp.einsum("bd,bnd->bn", img, txt) * scale
            logits = jnp.where(template_mask > 0, logits, NEG)
            return jax.nn.softmax(logits, axis=-1)

        self._score = score

    def __call__(self, pixel_values: np.ndarray, template_ids: np.ndarray,
                 template_mask: np.ndarray) -> np.ndarray:
        B = pixel_values.shape[0]
        P = self.pad_to_batch
        if P is not None and B < P:
            pixel_values = np.concatenate(
                [pixel_values,
                 np.zeros((P - B,) + pixel_values.shape[1:],
                          pixel_values.dtype)])
            template_ids = np.concatenate(
                [template_ids,
                 np.zeros((P - B,) + template_ids.shape[1:],
                          template_ids.dtype)])
            template_mask = np.concatenate(
                [template_mask,
                 np.zeros((P - B,) + template_mask.shape[1:],
                          template_mask.dtype)])
        px, ids, mask = (jnp.asarray(pixel_values),
                         jnp.asarray(template_ids),
                         jnp.asarray(template_mask))
        if self._batch_sharding is not None:
            px, ids, mask = (jax.device_put(x, self._batch_sharding)
                             for x in (px, ids, mask))
        return np.asarray(self._score(self.params, px, ids, mask))[:B]



def pad_templates(template_ids_list, pos_indices_list, max_templates: int,
                  context_length: int, pad_token_id: int = 0):
    """Ragged per-sample template sets → fixed [B, NT, T] + masks.

    ``pos_indices_list[i]`` gives the slots holding positive templates
    (arrangement — ``first`` or ``random``, ``cb_eval.py:113-123`` — is
    applied by the caller before padding, so indices are arbitrary).
    Returns (ids, valid_mask, pos_mask)."""
    B = len(template_ids_list)
    ids = np.full((B, max_templates, context_length), pad_token_id,
                  np.int32)
    valid = np.zeros((B, max_templates), np.float32)
    pos = np.zeros((B, max_templates), np.float32)
    for i, t in enumerate(template_ids_list):
        n = min(len(t), max_templates)
        ids[i, :n] = t[:n]
        valid[i, :n] = 1.0
        for j in pos_indices_list[i]:
            if j < n:
                pos[i, j] = 1.0
    return ids, valid, pos


def thresholded_decision(probs: np.ndarray, pos_mask: np.ndarray,
                         valid_mask: np.ndarray, confidence: float,
                         margin: float):
    """The reference's correctness rule, vectorized over B samples
    (``cb_eval.py:272-284``): correct iff best-positive prob >
    confidence AND > best-negative + margin AND is the global argmax.

    Returns dict with correct [B] bool, best_pos_prob [B], argmax_idx [B].
    """
    probs = np.where(valid_mask > 0, probs, -1.0)
    pos_probs = np.where(pos_mask > 0, probs, -1.0)
    neg_probs = np.where((pos_mask == 0) & (valid_mask > 0), probs, -1.0)
    best_pos = pos_probs.max(axis=-1)
    best_neg = neg_probs.max(axis=-1)
    # reference: best_neg defaults to 0.0 when there are no negatives
    best_neg = np.where(best_neg < 0, 0.0, best_neg)
    argmax_idx = probs.argmax(axis=-1)
    is_argmax = best_pos >= probs.max(axis=-1)
    correct = ((best_pos > confidence)
               & (best_pos > best_neg + margin)
               & is_argmax)
    return {"correct": correct, "confidence": best_pos,
            "argmax_idx": argmax_idx}
