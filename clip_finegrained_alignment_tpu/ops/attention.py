"""Fused multi-head attention as a Pallas TPU kernel.

Replaces the XLA attention path in ``models/clip.py`` (which materializes
the [B, H, S, S] probability tensor in HBM — the dominant HBM traffic of
both towers) with a kernel that keeps the whole S×S tile in VMEM.

Design notes (why this is NOT a blockwise flash kernel): CLIP sequences are
tiny — 197 vision tokens (ViT-B/16 @224) and 77 text tokens — so a full
[S, S] fp32 logits tile is ≤ 256×256×4 B = 256 KB, a fraction of the
~16 MB/core VMEM. Blockwise streaming with running-max bookkeeping would
add control overhead with zero memory benefit at these shapes; the right
TPU design is one grid cell per (batch, head-group) computing exact
softmax(QKᵀ)V entirely on-chip:

    HBM traffic:  q, k, v in; out out.   (probs never touch HBM)
    MXU work:     two [S,S]×[S,D] matmuls per head.

Heads are processed in groups per grid cell so the MXU sees wider matmuls.
Sequence lengths pad to the fp32 sublane quantum (8); padded key positions
are masked with a large-negative additive bias, padded query rows are
discarded on the way out.

Backward: ``jax.custom_vjp`` whose bwd recomputes attention with the same
fused kernels (flash-style recomputation — stores only q, k, v, bias).
dq/dk/dv are computed by two further Pallas kernels sharing the grid.
Validated against the XLA path in ``tests/test_ops.py`` (fwd + grads).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._pallas_common import interpret as _interpret, vma as _vma

_NEG = -1e9


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m



# ---------------------------------------------------------------------------
# Kernels (operate on one [G, S, D] head-group per grid cell)
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    """o = softmax(q kᵀ · scale + bias) v, fp32 statistics, one (b, hg).

    bias is [S, S] shared across heads (causal/padding masks are
    head-invariant in CLIP) — 1/H the HBM traffic of a per-head bias."""
    q = q_ref[0]                                   # [G, S, D] (pre-scaled)
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # [G, S, S]
    logits = logits + bias_ref[0, 0][None]
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / s).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                dq_ref, dk_ref, dv_ref):
    """Recompute p, then dv = pᵀ do; dp = do vᵀ;
    ds = p ∘ (dp - Σ(dp∘p)); dq = ds k · scale; dk = dsᵀ q."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    logits = logits + bias_ref[0, 0][None]
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    p = e / s                                       # [G, S, S] fp32

    dv = jax.lax.dot_general(                       # pᵀ do
        p, do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(                       # do vᵀ
        do, v.astype(jnp.float32), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    row = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - row)                             # [G, S, S]
    dq = jax.lax.dot_general(                       # ds k
        ds, k.astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(                       # dsᵀ q
        ds, q.astype(jnp.float32), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------

def _prepare(q, k, v, bias, scale, head_group: int):
    """Pad S to the sublane quantum, fold scale into q, broadcast bias to
    [B, H, S, S] fp32 with -inf on padded keys. Returns padded operands and
    the grid geometry."""
    B, H, S, D = q.shape
    Sp = _round_up(S, 8)
    # head_group=0 → auto: as many heads per grid cell as VMEM allows
    # (best MXU utilization at CLIP sizes: 12 heads × [Sp, Sp] fp32
    # logits ≈ 2-3 MB). The bwd kernel holds ~3 [G, Sp, Sp] fp32
    # intermediates (p, dp, ds), so at long sequences (ViT-L/14@336,
    # Sp = 584) the group must shrink to stay inside the ~16 MB VMEM.
    if head_group > 0:
        G = head_group
        while H % G != 0:
            G //= 2
        G = max(G, 1)
    else:
        budget = 9 * 2 ** 20  # bytes for the 3 bwd intermediates
        fit = [d for d in range(1, H + 1)
               if H % d == 0 and 3 * d * Sp * Sp * 4 <= budget]
        G = max(fit) if fit else 1
    pad = Sp - S

    qs = (q * scale).astype(q.dtype)
    if pad:
        cfg = [(0, 0), (0, 0), (0, pad), (0, 0)]
        qs = jnp.pad(qs, cfg)
        k = jnp.pad(k, cfg)
        v = jnp.pad(v, cfg)

    # Bias stays [B|1, 1, Sp, Sp] — head-invariant, so the kernel loads
    # one [Sp, Sp] tile per cell instead of a per-head copy.
    full_bias = jnp.zeros((1, 1, Sp, Sp), jnp.float32)
    if bias is not None:
        full_bias = full_bias + jnp.pad(
            bias.astype(jnp.float32),
            [(0, 0), (0, 0), (0, pad), (0, pad)])
    if pad:
        key_mask = (jnp.arange(Sp) >= S)
        full_bias = full_bias + jnp.where(key_mask, _NEG, 0.0)[None, None,
                                                              None, :]
    return qs, k, v, full_bias, (B, H, S, D, Sp, G)


def _grid_specs(B, H, Sp, D, G, bias_batched):
    grid = (B, H // G)
    qkv_spec = pl.BlockSpec((1, G, Sp, D),
                            lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_index = (lambda b, h: (b, 0, 0, 0)) if bias_batched \
        else (lambda b, h: (0, 0, 0, 0))
    bias_spec = pl.BlockSpec((1, 1, Sp, Sp), bias_index,
                             memory_space=pltpu.VMEM)
    return grid, qkv_spec, bias_spec


def _fused_forward(q, k, v, bias, scale, head_group):
    qs, kp, vp, bp, (B, H, S, D, Sp, G) = _prepare(q, k, v, bias, scale,
                                                   head_group)
    grid, qkv_spec, bias_spec = _grid_specs(B, H, Sp, D, G,
                                            bp.shape[0] == B)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Sp, D), q.dtype,
                                       vma=_vma(qs, kp, vp, bp)),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Sp * Sp * D,
            bytes_accessed=4 * B * H * Sp * D * q.dtype.itemsize,
            transcendentals=B * H * Sp * Sp),
        interpret=_interpret(),
    )(qs, kp, vp, bp)
    return out[:, :, :S]


def _fused_backward(q, k, v, bias, scale, head_group, do):
    qs, kp, vp, bp, (B, H, S, D, Sp, G) = _prepare(q, k, v, bias, scale,
                                                   head_group)
    dop = jnp.pad(do, [(0, 0), (0, 0), (0, Sp - S), (0, 0)]) \
        if Sp != S else do
    grid, qkv_spec, bias_spec = _grid_specs(B, H, Sp, D, G,
                                            bp.shape[0] == B)
    dq, dk, dv = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, qkv_spec],
        out_specs=(qkv_spec, qkv_spec, qkv_spec),
        out_shape=tuple(jax.ShapeDtypeStruct((B, H, Sp, D), q.dtype,
                                             vma=_vma(qs, kp, vp, bp, dop))
                        for _ in range(3)),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * Sp * Sp * D,
            bytes_accessed=8 * B * H * Sp * D * q.dtype.itemsize,
            transcendentals=B * H * Sp * Sp),
        interpret=_interpret(),
    )(qs, kp, vp, bp, dop)
    # dq carries the folded-in scale: d(q·scale)/dq = scale.
    return (dq[:, :, :S] * scale).astype(q.dtype), \
        dk[:, :, :S], dv[:, :, :S]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_attention_vjp(q: jax.Array, k: jax.Array, v: jax.Array,
                         bias: Optional[jax.Array], scale: float,
                         head_group: int = 0) -> jax.Array:
    return _fused_forward(q, k, v, bias, scale, head_group)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    bias: Optional[jax.Array], scale: float,
                    head_group: int = 0) -> jax.Array:
    """Fused attention. q/k/v: [B, H, S, D]; bias broadcastable
    [B|1, 1, S, S] additive (causal+padding for the text tower, None for
    vision); returns [B, H, S, D].

    Differentiable w.r.t. q, k, v ONLY. The bias is stop-gradiented here
    — by declared semantics, not silently: the custom VJP computes no
    bias cotangent (our biases are data-independent masks). Differentiate
    through the XLA path (`models.clip._xla_attention`) if a trainable
    bias is ever needed."""
    if bias is not None:
        bias = jax.lax.stop_gradient(bias)
    if _interpret() and _vma(q, k, v):
        # Pallas's CPU interpreter cannot evaluate kernel bodies under
        # shard_map's vma tracking (internal block dynamic_slice mixes
        # varying and invariant values). Off-TPU inside shard_map, fall
        # back to the XLA path the kernel is numerically pinned against
        # (tests/test_ops.py). On TPU the compiled kernel runs.
        from ..models.clip import _xla_attention
        return _xla_attention(q, k, v, bias, scale)
    return _flash_attention_vjp(q, k, v, bias, scale, head_group)


def _fa_fwd(q, k, v, bias, scale, head_group):
    return _fused_forward(q, k, v, bias, scale, head_group), \
        (q, k, v, bias)


def _fa_bwd(scale, head_group, res, do):
    q, k, v, bias = res
    dq, dk, dv = _fused_backward(q, k, v, bias, scale, head_group, do)
    return dq, dk, dv, None


_flash_attention_vjp.defvjp(_fa_fwd, _fa_bwd)
