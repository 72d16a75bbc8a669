"""Analytic FLOP counts for MFU metering.

Model-FLOPs utilization (MFU) = model FLOPs/sec ÷ chip peak. "Model FLOPs"
is the standard convention (PaLM appendix B / the scaling-book): forward
matmul FLOPs + 2× for backward, *excluding* rematerialization recompute
(counting remat gives HFU, hardware-FLOPs utilization, which flatters
remat-heavy configs).

Counted: every GEMM in both towers (qkv/out/mlp projections, attention
score & weighted-sum einsums, patch embedding), the SPARC projection of
both full hidden sequences, and the SPARC loss einsums. Not counted:
elementwise ops (LN, gelu, softmax — VPU work, not MXU), the optimizer
(HBM-bound, ~1% of step time), embedding lookups.

XLA's ``compiled.cost_analysis()`` would be the usual source, but through
the remote-compile tunnel used in this environment it under-reports by
~80× (measured), so the count is derived from the architecture instead.
"""

from __future__ import annotations

from ..config import CLIPConfig


def _tower_forward_flops(seq_len: int, hidden: int, intermediate: int,
                         num_layers: int) -> float:
    """Forward matmul FLOPs for one transformer tower, per sample.

    Per layer (MACs): q,k,v,out = 4·S·D²; MLP = 2·S·D·I;
    attention einsums = 2·S²·D. FLOPs = 2·MACs.
    """
    per_layer_macs = (4 * seq_len * hidden * hidden
                      + 2 * seq_len * hidden * intermediate
                      + 2 * seq_len * seq_len * hidden)
    return 2.0 * per_layer_macs * num_layers


def clip_forward_flops(cfg: CLIPConfig, *, sparc: bool = True) -> float:
    """Forward matmul FLOPs per image-text pair."""
    v, t = cfg.vision, cfg.text
    vision = _tower_forward_flops(v.seq_len, v.hidden_size,
                                  v.intermediate_size, v.num_layers)
    # Patch embedding GEMM: [num_patches, p²·3] × [p²·3, D].
    vision += 2.0 * v.num_patches * (v.patch_size ** 2 * 3) * v.hidden_size
    text = _tower_forward_flops(t.max_position_embeddings, t.hidden_size,
                                t.intermediate_size, t.num_layers)

    proj = 2.0 * (v.hidden_size + t.hidden_size) * cfg.projection_dim  # pooled
    if sparc:
        # SPARC projects the FULL hidden sequences (finetuner.py:124-128) ...
        proj += 2.0 * (v.seq_len * v.hidden_size
                       + t.max_position_embeddings * t.hidden_size) \
            * cfg.projection_dim
        # ... and the loss runs similarity + pooling + 2 masked bmms.
        T, P, D = t.max_position_embeddings, v.seq_len, cfg.projection_dim
        proj += 2.0 * (2 * T * P * D + 2 * T * T * D)
    return vision + text + proj


def sparc_train_step_flops(cfg: CLIPConfig, pairs_per_step: int) -> float:
    """Model FLOPs for one SPARC train step over ``pairs_per_step`` pairs
    (forward + 2× backward; remat recompute excluded by convention)."""
    return 3.0 * clip_forward_flops(cfg, sparc=True) * pairs_per_step


def count_train_step_flops(cfg: CLIPConfig, pairs_per_step: int,
                           n_cf: int = 9) -> float:
    """Model FLOPs for one counterfactual CountLoss train step
    (``count_finetuner.py:107-131``): the CLIP forward plus ``n_cf``
    extra text-tower passes per pair (the 9 counterfactual captions,
    batched here as one [B·n_cf, T] forward)."""
    t = cfg.text
    text = _tower_forward_flops(t.max_position_embeddings, t.hidden_size,
                                t.intermediate_size, t.num_layers) \
        + 2.0 * t.hidden_size * cfg.projection_dim
    return 3.0 * (clip_forward_flops(cfg, sparc=False) + n_cf * text) \
        * pairs_per_step
