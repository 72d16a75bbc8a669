"""The four training objectives as pure, jittable JAX functions.

Re-implementations (not translations) of ``/root/reference/finetune/losses.py``:
each returns the same loss dict, verified by golden-value tests against the
reference math executed in torch (``tests/test_losses.py``). All reductions
happen in fp32 regardless of compute dtype; the reference's fp64 islands
(``losses.py:53-54``) become fp32-on-TPU with documented tolerance.

Reference quirks preserved (parity mode) and fixed (documented):

* SPARC multiplies ``inverse_temperature`` into logits (``losses.py:160,180``)
  and the trainer sets it to **0.07** (``finetuner.py:312``) — so logits are
  *shrunk*, not divided by temperature. We keep the multiply.
* SPARC's global term uses CE ``reduction='sum'`` then divides by B
  (``losses.py:162-163``) — for square logits this equals the mean; kept.
* The reference's ``-inf`` mask fills NaN under fully-masked rows
  (``losses.py:186,229-230``); that never fires in the reference only because
  HF CLIP pads with ``<|endoftext|>`` (49407) while ``pad_token_id`` is 1, so
  the language mask is all-ones in practice. We use finite fills +
  ``where``-guards so real masks are safe; with the reference's all-ones mask
  the values are identical.
* ``CountLoss``'s counterfactual denominator deliberately **excludes** the
  positive (``losses.py:295-296``); kept.
* ``CLIPCountLoss.count_loss`` degenerates to 0 when each image has exactly
  one caption (group_size==1, the only shape its trainer ever feeds it); our
  grouped form generalizes to G>1 with the same math.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

_EPS = 1e-8
_NEG = -1e9  # finite stand-in for the reference's -inf fills


# ---------------------------------------------------------------------------
# Helpers
# ---------------------------------------------------------------------------

def l2_normalize(x: jax.Array, axis: int = -1,
                 eps: float = 1e-12) -> jax.Array:
    """``x / max(‖x‖, eps)`` — torch ``F.normalize`` semantics, which is
    what the reference losses call (``losses.py:151-153,221-222``): a zero
    vector normalizes to zeros, not NaN (matters for SPARC's grouped
    pooling, whose masked token rows are exactly zero).

    Implemented as ``x · rsqrt(max(Σx², eps²))`` rather than dividing by
    ``max(‖x‖, eps)``: the values are identical, but ``jnp.linalg.norm``'s
    own VJP is 0/0 = NaN at x = 0, which poisons gradients through the
    clamp (0 · NaN = NaN) — this form has clean gradients everywhere."""
    sumsq = jnp.sum(x * x, axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sumsq, eps * eps))


def softmax_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-example CE with integer labels; logits in fp32. [..., C] -> [...]."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return logz - picked


# ---------------------------------------------------------------------------
# 1. Global InfoNCE ("CustomCLIPLoss", losses.py:7-36)
# ---------------------------------------------------------------------------

def clip_loss(image_features: jax.Array, text_features: jax.Array,
              temperature: float = 0.07) -> Dict[str, jax.Array]:
    """Standard bidirectional CLIP contrastive loss."""
    img = l2_normalize(image_features.astype(jnp.float32))
    txt = l2_normalize(text_features.astype(jnp.float32))
    logits = (img @ txt.T) / temperature
    labels = jnp.arange(logits.shape[0])
    loss_i = softmax_cross_entropy(logits, labels).mean()
    loss_t = softmax_cross_entropy(logits.T, labels).mean()
    total = (loss_i + loss_t) / 2.0
    return {"clip_loss": total, "total_loss": total}


# ---------------------------------------------------------------------------
# 2. CLIP + grouped count loss ("CLIPCountLoss", losses.py:39-133)
# ---------------------------------------------------------------------------

def grouped_count_loss(ei: jax.Array, ek_groups: jax.Array,
                       temperature: float = 0.07) -> jax.Array:
    """Per-image grouped contrastive count term (losses.py:46-90).

    ei: [B, D] image embeddings (un- or pre-normalized, we normalize).
    ek_groups: [B, G, D] text embeddings; slot 0 is the positive caption,
      slots 1..G-1 the count-counterfactual negatives.

    loss_i = -log( e^{s_0/τ} / (e^{s_0/τ} + Σ_{j≥1} e^{s_j/τ}) ), mean over B.
    The reference runs this in fp64 (losses.py:53-54); fp32 here (TPU), the
    golden test bounds the difference.
    """
    ei = l2_normalize(ei.astype(jnp.float32))
    ek = l2_normalize(ek_groups.astype(jnp.float32))
    sims = jnp.einsum("bd,bgd->bg", ei, ek) / temperature        # [B, G]
    pos = sims[:, 0]
    # log(denominator) = log(e^{pos} + Σ_neg e^{neg}) computed stably.
    denom = jax.nn.logsumexp(sims, axis=-1)                      # includes pos
    return (denom - pos).mean()


def clip_count_loss(image_features: jax.Array, text_features: jax.Array,
                    count_groups: Optional[jax.Array] = None,
                    temperature: float = 0.07,
                    count_alpha: float = 0.5) -> Dict[str, jax.Array]:
    """CLIP loss over a template-expanded batch plus the grouped count term.

    image_features: [B, D]; text_features: [B*T, D] (T captions per image,
    diagonal-positive after ``repeat_interleave`` of images,
    losses.py:92-133); count_groups: [B, G, D] text embeddings for the count
    term (None → count term 0, reproducing the reference's degenerate
    group_size==1 behavior).
    """
    B = image_features.shape[0]
    expanded = text_features.shape[0]
    num_templates = expanded // B

    img = l2_normalize(image_features.astype(jnp.float32))
    txt = l2_normalize(text_features.astype(jnp.float32))
    img_expanded = jnp.repeat(img, num_templates, axis=0)        # [B*T, D]

    logits = (img_expanded @ txt.T) / temperature
    labels = jnp.arange(expanded)
    loss_i = softmax_cross_entropy(logits, labels).mean()
    loss_t = softmax_cross_entropy(logits.T, labels).mean()
    closs = (loss_i + loss_t) / 2.0

    if count_groups is not None:
        count = grouped_count_loss(img_expanded, count_groups,
                                   temperature) * count_alpha
    else:
        count = jnp.zeros((), jnp.float32)

    return {"clip_loss": closs, "count_loss": count,
            "total_loss": closs + count}


# ---------------------------------------------------------------------------
# 3. SPARC (losses.py:136-264, arXiv:2401.09865)
# ---------------------------------------------------------------------------

def pairwise_contrastive_loss(a: jax.Array, b: jax.Array,
                              inverse_temperature: float) -> jax.Array:
    """Bidirectional building block (losses.py:145-163): normalize, logits =
    a@bᵀ·inv_τ, CE(sum)/B ≡ mean for square logits."""
    a = l2_normalize(a.astype(jnp.float32))
    b = l2_normalize(b.astype(jnp.float32))
    B = a.shape[0]
    logits = (a @ b.T) * inverse_temperature
    labels = jnp.arange(B)
    return softmax_cross_entropy(logits, labels).sum() / B


def masked_pairwise_contrastive_loss(a: jax.Array, b: jax.Array,
                                     mask: jax.Array,
                                     inverse_temperature: float) -> jax.Array:
    """Token-level contrastive term (losses.py:165-197).

    a, b: [B, T, D]; mask: [B, T] (1 = valid token). Uses finite ``_NEG``
    fills + a final mask multiply, so fully-padded rows contribute exactly 0
    instead of the reference's latent NaN.
    """
    a = l2_normalize(a.astype(jnp.float32))
    b = l2_normalize(b.astype(jnp.float32))
    B, T = a.shape[0], a.shape[1]
    mask = mask.astype(jnp.float32)

    mask2d = mask[:, :, None] * mask[:, None, :]                  # [B, T, T]
    logits = jnp.einsum("btd,bsd->bts", a, b) * inverse_temperature
    logits = jnp.where(mask2d > 0, logits, _NEG)

    labels = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    per_token = softmax_cross_entropy(logits, labels)             # [B, T]
    return (per_token * mask).sum() / (mask.sum() + _EPS)


def sparc_alignment_weights(similarity: jax.Array, language_mask: jax.Array,
                            similarity_threshold: float):
    """Masked min–max normalization + thresholding + renormalization
    (losses.py:228-243). similarity: [B, T, P]; mask: [B, T].
    Returns v_align_weights [B, T, P]."""
    mask = language_mask.astype(similarity.dtype)[:, :, None]     # [B, T, 1]
    sim_masked = similarity * mask
    # Sentinel for masked rows: similarities are cosines in [-1, 1], so ±2
    # never interferes with real extrema. (A finfo.max sentinel makes
    # ``sim_max - sim_min`` overflow to -inf on fully-masked token rows,
    # which poisons the BACKWARD with NaN even though the forward stays
    # finite — the row itself is zeroed below, but the chain rule isn't.)
    big = jnp.asarray(2.0, similarity.dtype)
    sim_min = jnp.min(jnp.where(mask > 0, sim_masked, big), axis=-1,
                      keepdims=True)
    sim_max = jnp.max(jnp.where(mask > 0, sim_masked, -big), axis=-1,
                      keepdims=True)
    normalized = (sim_masked - sim_min) / (sim_max - sim_min + _EPS)
    thresholded = jnp.where(normalized < similarity_threshold,
                            jnp.zeros_like(normalized), normalized)
    # Guard masked token rows (reference NaNs here; see module docstring).
    thresholded = thresholded * mask
    weights = thresholded / jnp.clip(
        thresholded.sum(axis=-1, keepdims=True), _EPS, None)
    return weights


def sparc_loss(v_patch_embed: jax.Array, l_token_embed: jax.Array,
               language_mask: jax.Array, *,
               similarity_threshold: float = 0.5,
               global_loss_weight: float = 1.0,
               local_loss_weight: float = 1.0,
               inverse_temperature: float = 1.0,
               use_fused: bool = False) -> Dict[str, jax.Array]:
    """SPARC fine-grained patch↔token alignment loss (losses.py:199-264).

    v_patch_embed: [B, P, D] projected vision last_hidden_state;
    l_token_embed: [B, T, D] projected text last_hidden_state;
    language_mask: [B, T].

    This is the pure-XLA reference implementation; the fused Pallas kernel
    (``ops/sparc_kernel.py``) computes the local-alignment chain
    (similarity → min-max → threshold → weighted pooling) in one VMEM pass
    and is validated against this function.
    """
    v_patch_embed = v_patch_embed.astype(jnp.float32)
    l_token_embed = l_token_embed.astype(jnp.float32)
    mask = language_mask.astype(jnp.float32)

    # ---------- GLOBAL ----------
    v_embed = l2_normalize(jnp.mean(v_patch_embed, axis=1))       # [B, D]
    masked_l = l_token_embed * mask[:, :, None]
    token_counts = jnp.clip(mask.sum(axis=-1, keepdims=True), _EPS, None)
    l_embed = l2_normalize(masked_l.sum(axis=1) / token_counts)   # [B, D]

    loss_vl = pairwise_contrastive_loss(v_embed, l_embed, inverse_temperature)
    loss_lv = pairwise_contrastive_loss(l_embed, v_embed, inverse_temperature)
    global_loss = 0.5 * (loss_vl + loss_lv)

    # ---------- LOCAL ----------
    if use_fused:
        # One-VMEM-pass Pallas kernel (similarity → min-max → threshold →
        # pooling); numerically equal to the unfused chain below.
        from ..ops.sparc_kernel import fused_sparc_pooling
        l_grouped = fused_sparc_pooling(v_patch_embed, l_token_embed,
                                        mask, similarity_threshold)
    else:
        v_norm = l2_normalize(v_patch_embed)
        l_norm = l2_normalize(l_token_embed)
        similarity = jnp.einsum("btd,bpd->btp", l_norm, v_norm)   # [B, T, P]
        weights = sparc_alignment_weights(similarity, mask,
                                          similarity_threshold)
        # Language-grouped patch pooling on *unnormalized* patches (quirk,
        # losses.py:245).
        l_grouped = jnp.einsum("btp,bpd->btd", weights, v_patch_embed)

    loss_vl_local = masked_pairwise_contrastive_loss(
        l_grouped, l_token_embed, mask, inverse_temperature)
    loss_lv_local = masked_pairwise_contrastive_loss(
        l_token_embed, l_grouped, mask, inverse_temperature)
    local_loss = 0.5 * (loss_vl_local + loss_lv_local)

    total = global_loss_weight * global_loss + local_loss_weight * local_loss
    return {
        "global_loss": global_loss,
        "local_loss": local_loss,
        "total_loss": total,
        "loss_vl": loss_vl,
        "loss_lv": loss_lv,
        "loss_vl_local": loss_vl_local,
        "loss_lv_local": loss_lv_local,
    }


# ---------------------------------------------------------------------------
# 4. Counterfactual count loss ("CountLoss", losses.py:267-309)
# ---------------------------------------------------------------------------

def count_loss(img_logits: jax.Array, text_logits: jax.Array,
               ei: jax.Array, ek: jax.Array, ek_cf: jax.Array,
               temperature: float = 0.07,
               alpha: float = 1.0) -> Dict[str, jax.Array]:
    """CLIP CE on precomputed logits + counterfactual InfoNCE.

    img_logits: [B, B] logits_per_image; text_logits: [B, B];
    ei: [B, D] image embeds; ek: [B, D] positive caption embeds;
    ek_cf: [B, N_cf, D] counterfactual caption embeds.

    Quirk kept: the denominator sums **only** the counterfactual scores —
    the positive is not added (losses.py:295-296), so the term can go
    negative when the positive dominates.
    """
    B = img_logits.shape[0]
    labels = jnp.arange(B)
    closs = (softmax_cross_entropy(img_logits, labels).mean()
             + softmax_cross_entropy(text_logits, labels).mean()) / 2.0

    ei = l2_normalize(ei.astype(jnp.float32), axis=-1)
    ek = l2_normalize(ek.astype(jnp.float32), axis=-1)
    ek_cf = l2_normalize(ek_cf.astype(jnp.float32), axis=-1)

    correct = jnp.sum(ei * ek, axis=-1) / temperature             # [B]
    cf_scores = jnp.einsum("bd,bnd->bn", ei, ek_cf) / temperature  # [B, N]
    # -log( e^{pos} / Σ e^{cf} ) = logsumexp(cf) - pos
    closs_count = (jax.nn.logsumexp(cf_scores, axis=-1) - correct).mean()

    total = closs + alpha * closs_count
    return {"clip_loss": closs, "count_loss": closs_count,
            "total_loss": total}
