"""GradCache: full-effective-batch contrastive gradients at one-chunk
activation memory.

The problem (beyond-reference, but born from the reference's own training
regime): with gradient accumulation, every microbatch is its own loss
instance, so the contrastive negative pool is ``batch_size``, not
``batch_size x accum`` — the reference's ``loss / accum_steps`` scaling
(``/root/reference/finetune/finetuner.py:145,149-154``) has exactly the
same semantics, and its DDP trainer's per-rank local negatives
(``dist_finetuner.py:161-176``) make the pool smaller still. Contrastive
quality scales with the negative pool (the reason ``global_negatives``
exists, SURVEY.md §5), but enlarging the per-loss batch normally means
holding every sample's tower activations at once — the one thing a
15.75 GB chip cannot do.

GradCache (Gao et al., arXiv:2101.06983) breaks that coupling. The loss
is a function of per-sample *embeddings* only, and embeddings are tiny
compared to the activations that produced them, so:

1. **Embed** — forward every chunk under ``lax.map`` with no gradient
   bookkeeping; keep only the embeddings ([B_eff, D] / [B_eff, T, P] —
   megabytes, not the gigabytes of tower residuals).
2. **Loss** — compute the objective over the FULL effective batch from
   the cached embeddings and differentiate it *with respect to the
   embeddings*. This is dense [B_eff, B_eff] similarity math: cheap, and
   exactly the bigger negative pool we wanted.
3. **Re-forward + VJP** — ``lax.scan`` over chunks: recompute each
   chunk's forward (storing residuals for ONE chunk only) and pull the
   cached embedding cotangent back to the parameters. Chunks accumulate
   into one fp32 grad tree; XLA reuses the chunk's activation buffers
   across scan iterations.

The result is **exactly** ``d loss(full batch) / d params`` — pinned in
``tests/test_gradcache.py`` against a single-chunk oracle — at the
activation footprint of one chunk plus the embedding cache. FLOP cost is
one extra chunk forward (~1.33x a plain step, the same trade
``jax.checkpoint`` makes), bought once per step, not per layer.

Scope: ``loss_type in ("clip", "sparc")`` — the two objectives whose
inter-sample coupling is the point. (``count``/``clip_count`` pair each
sample against its own counterfactuals; accumulation already gives them
the full pool.) Composes with DP meshes in ``global_negatives`` mode
(the loss sees data-sharded embeddings and GSPMD inserts the gathers);
pipeline/sequence parallelism are rejected — PP's wavefront already
holds all microbatches in flight (``parallel/pipeline.py`` docstring),
and SP reshapes the token dim this cache indexes.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import CLIPConfig, TrainConfig
from ..models import clip as m
from ..objectives import losses as L

Batch = Dict[str, jax.Array]


def validate_gradcache(cfg: TrainConfig, mesh=None) -> None:
    """Fail fast on configs whose semantics GradCache cannot honor."""
    if cfg.loss_type not in ("clip", "sparc"):
        raise ValueError(
            f"grad_cache supports loss_type 'clip' or 'sparc', got "
            f"{cfg.loss_type!r}: the count losses pair each sample "
            "against its own counterfactuals, so accumulation already "
            "sees the full negative pool")
    if mesh is not None and not cfg.global_negatives:
        raise ValueError(
            "grad_cache on a mesh requires global_negatives=True: the "
            "whole point is ONE loss over the full effective batch, "
            "which contradicts the DDP-parity per-device local-negative "
            "semantics")
    if cfg.sequence_parallel:
        raise ValueError("grad_cache is not supported with "
                         "sequence_parallel (the token dim the embedding "
                         "cache indexes is sharded)")
    if cfg.mesh.pipe > 1:
        raise ValueError("grad_cache is not supported with pipeline "
                         "parallelism (the GPipe wavefront already holds "
                         "all microbatches in flight)")


def _chunk_embeddings(params, mb: Batch, cfg: TrainConfig,
                      model_cfg: CLIPConfig, dtype, pixel_bank=None):
    """One chunk's forward → the embedding pytree the loss needs.

    clip:  (image_embeds [b, P], text_embeds [b, P])
    sparc: (v_patch [b, S_v, P], l_token [b, T, P])
    Everything upstream of these (tower residuals) is free to be
    discarded (phase 1) or recomputed (phase 3).
    """
    if pixel_bank is not None:
        pixel_values = pixel_bank[mb["pixel_index"]]
    else:
        pixel_values = mb["pixel_values"]
    if pixel_values.dtype == jnp.uint8:
        from ..data.preprocess import normalize_batch
        pixel_values = normalize_batch(
            pixel_values.astype(jnp.float32) / 255.0)
    out = m.clip_forward(params, pixel_values, mb["input_ids"], model_cfg,
                         dtype=dtype, use_pallas=cfg.use_pallas_attention,
                         remat=cfg.remat, unroll=cfg.unroll_layers,
                         quant=cfg.quant)
    if cfg.loss_type == "sparc":
        v_patch, l_token = m.sparc_embeddings(params, out, dtype=dtype)
        return v_patch, l_token
    return out.image_embeds, out.text_embeds


def _full_batch_loss(embs, batch: Batch, cfg: TrainConfig,
                     model_cfg: CLIPConfig) -> Tuple[jax.Array, Dict]:
    """The objective over the concatenated [B_eff, ...] embeddings —
    identical math to ``objectives/losses.py`` at the bigger batch."""
    if cfg.loss_type == "sparc":
        v_patch, l_token = embs
        ids = batch["input_ids"]
        mask = (ids.reshape(-1, ids.shape[-1])
                != model_cfg.text.pad_token_id)
        losses = L.sparc_loss(
            v_patch, l_token, mask,
            similarity_threshold=cfg.similarity_threshold,
            global_loss_weight=cfg.global_loss_weight,
            local_loss_weight=cfg.local_loss_weight,
            inverse_temperature=cfg.inverse_temperature,
            use_fused=cfg.use_fused_sparc)
    else:
        img, txt = embs
        losses = L.clip_loss(img, txt)
    return losses["total_loss"], losses


def gradcache_grads(params, batch: Batch, cfg: TrainConfig,
                    model_cfg: CLIPConfig, dtype,
                    pixel_bank=None) -> Tuple[jax.Array, Dict]:
    """Drop-in for ``engine._accumulated_grads`` with full-batch
    negatives: batch leaves are [accum, B, ...]; returns (grads fp32,
    loss dict) where the loss couples all ``accum*B`` samples."""

    def embed(p, mb):
        return _chunk_embeddings(p, mb, cfg, model_cfg, dtype,
                                 pixel_bank=pixel_bank)

    # ---- Phase 1: embedding cache (no residuals survive: nothing is
    # differentiated here, so XLA frees each chunk's activations).
    embs = jax.lax.map(lambda mb: embed(params, mb), batch)
    flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), embs)

    # ---- Phase 2: full-batch loss + embedding cotangents (dense
    # similarity math on [B_eff]; grads are embedding-sized).
    (_, losses), d_flat = jax.value_and_grad(
        lambda e: _full_batch_loss(e, batch, cfg, model_cfg),
        has_aux=True)(flat)
    d_chunks = jax.tree.map(lambda g, ref: g.reshape(ref.shape),
                            d_flat, embs)

    # ---- Phase 3: chunked re-forward + VJP. One chunk's residuals live
    # at a time; the scan carry is the fp32 grad tree.
    def body(g_acc, inputs):
        mb, de = inputs
        _, vjp = jax.vjp(lambda p: embed(p, mb), params)
        (g,) = vjp(de)
        g_acc = jax.tree.map(
            lambda a, b: a + b.astype(jnp.float32), g_acc, g)
        return g_acc, None

    g0 = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
    grads, _ = jax.lax.scan(body, g0, (batch, d_chunks),
                            unroll=min(cfg.unroll_accum,
                                       jax.tree.leaves(batch)[0].shape[0]))
    return grads, losses
