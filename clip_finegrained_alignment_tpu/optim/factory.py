"""Optimizer construction: AdamW (decay-masked) or AdamSPD, with optional
grad clipping and warmup schedule — replaces the ``configure_optimizer``
methods copy-pasted across all three reference trainers
(``finetuner.py:59-103``, ``dist_finetuner.py:94-139``,
``count_finetuner.py:56-99``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import optax

from ..config import TrainConfig
from .adamspd import adamspd


def decay_mask(params: Any) -> Any:
    """True = apply weight decay.

    The reference's split matches parameter *names* against
    ``("ln", "bn", "bias")`` (``finetuner.py:64-68``). Against HF CLIP's
    actual names (``layer_norm1.weight``, ``pre_layrnorm.weight``, ...)
    only ``"bias"`` ever matches — so in the reference layernorm *scales do*
    get weight decay and only biases are exempt. We reproduce exactly that:
    decay every leaf except ones whose key path ends in ``bias``.
    """
    def mask_leaf(path, _):
        last = path[-1]
        key = getattr(last, "key", None) or str(last)
        return "bias" not in key
    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def stacked_layer_mask(params: Any) -> Any:
    """True for leaves living under a *stacked* ``layers`` key — the
    scan-stacked per-layer tensors (``models/clip.py::_stack_layers``)
    whose leading axis is the layer index. AdamSPD reduces its SPD
    condition/ratio per layer on these, reproducing the reference's
    per-torch-parameter semantics (``optimizers.py:146-157``).

    In the unstacked layout (``unstack_layers``) a SequenceKey follows the
    ``layers`` entry — each leaf already IS one layer's tensor, so the
    mask is False (full per-leaf reduction is the reference semantics)."""
    def mask_leaf(path, _):
        for i, p in enumerate(path):
            if getattr(p, "key", None) == "layers":
                nxt = path[i + 1] if i + 1 < len(path) else None
                return not isinstance(nxt, jax.tree_util.SequenceKey)
        return False
    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def make_schedule(cfg: TrainConfig, use_warmup: bool = False):
    """Constant LR by default (the reference defines ``warmup_steps`` but
    never builds a scheduler — config.py:10 is dead; parity = constant)."""
    if not use_warmup or cfg.warmup_steps <= 0:
        return cfg.lr
    return optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps)


def make_optimizer(cfg: TrainConfig, params: Any,
                   anchor_params: Optional[Any] = None,
                   use_warmup: bool = False) -> optax.GradientTransformation:
    """Build the full gradient-transformation chain:
    clip-by-global-norm → AdamW/AdamSPD.

    Gradient accumulation is NOT handled here — the trainer folds
    microbatches with ``lax.scan`` and calls this on the averaged grads,
    which matches the reference's accumulate-then-step semantics
    (``finetuner.py:145-154``).
    """
    lr = make_schedule(cfg, use_warmup)

    if cfg.optimizer_type == "adamspd":
        # Reference AdamSPD mode uses a single param group, no decay split
        # (``finetuner.py:81-101``).
        opt = adamspd(lr, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
                      weight_decay=cfg.weight_decay, amsgrad=cfg.amsgrad,
                      anchor_params=anchor_params,
                      stacked_mask=stacked_layer_mask(params))
    else:
        opt = optax.adamw(lr, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
                          weight_decay=cfg.weight_decay,
                          mask=decay_mask(params))

    chain = [optax.clip_by_global_norm(cfg.max_grad_norm), opt] \
        if cfg.max_grad_norm and cfg.max_grad_norm > 0 else [opt]
    return optax.chain(*chain)
