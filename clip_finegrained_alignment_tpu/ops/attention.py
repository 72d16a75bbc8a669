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

def _fwd_math(q, k, v, bias):
    """o = softmax(q kᵀ (pre-scaled) + bias) v, fp32 statistics.
    q/k/v [G, S, D]; bias [S, S] shared across heads (causal/padding
    masks are head-invariant in CLIP) — 1/H the HBM traffic of a
    per-head bias."""
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # [G, S, S]
    logits = logits + bias[None]
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / s).astype(v.dtype)
    return jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _bwd_math(q, k, v, bias, do):
    """Recompute p, then dv = pᵀ do; dp = do vᵀ;
    ds = p ∘ (dp - Σ(dp∘p)); dq = ds k; dk = dsᵀ q."""
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    logits = logits + bias[None]
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
    return dq, dk, dv


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    """One (b, head-group) cell, [B, H, S, D] operand layout."""
    o = _fwd_math(q_ref[0], k_ref[0], v_ref[0], bias_ref[0, 0])
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                dq_ref, dk_ref, dv_ref):
    dq, dk, dv = _bwd_math(q_ref[0], k_ref[0], v_ref[0], bias_ref[0, 0],
                           do_ref[0].astype(jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _fwd_kernel_bshd(q_ref, k_ref, v_ref, bias_ref, o_ref):
    """[B, S, H, D]-layout cell: the head-major reorder happens HERE, in
    VMEM, instead of as a {0,3,1,2}→{3,2,1,0} HBM relayout copy (~34 GB/s,
    32 ms/step on ViT-B/32 — perf/TRACE_ANALYSIS.md round 3). Blocks are
    [1, Sp, G, D] slices of the raw projection reshape."""
    gshape = lambda r: jnp.swapaxes(r[0], 0, 1)     # [Sp, G, D]→[G, Sp, D]
    o = _fwd_math(gshape(q_ref), gshape(k_ref), gshape(v_ref),
                  bias_ref[0, 0])
    o_ref[0] = jnp.swapaxes(o, 0, 1).astype(o_ref.dtype)


def _bwd_kernel_bshd(q_ref, k_ref, v_ref, bias_ref, do_ref,
                     dq_ref, dk_ref, dv_ref):
    gshape = lambda r: jnp.swapaxes(r[0], 0, 1)
    dq, dk, dv = _bwd_math(gshape(q_ref), gshape(k_ref), gshape(v_ref),
                           bias_ref[0, 0],
                           gshape(do_ref).astype(jnp.float32))
    dq_ref[0] = jnp.swapaxes(dq, 0, 1).astype(dq_ref.dtype)
    dk_ref[0] = jnp.swapaxes(dk, 0, 1).astype(dk_ref.dtype)
    dv_ref[0] = jnp.swapaxes(dv, 0, 1).astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------

def _prepare(q, k, v, bias, scale, head_group: int, layout: str = "bhsd"):
    """Pad S to the sublane quantum, fold scale into q, broadcast bias to
    [1|B, 1, S, S] fp32 with -inf on padded keys. Returns padded operands
    and the grid geometry. ``layout``: "bhsd" = [B, H, S, D] operands,
    "bshd" = [B, S, H, D] (the raw projection reshape — no host-side
    transpose)."""
    if layout == "bshd":
        B, S, H, D = q.shape
    else:
        B, H, S, D = q.shape
    Sp = _round_up(S, 8)
    # head_group=0 → auto: as many heads per grid cell as VMEM allows
    # (best MXU utilization at CLIP sizes: 12 heads × [Sp, Sp] fp32
    # logits ≈ 2-3 MB). The bwd kernel holds ~3 [G, Sp, Sp] fp32
    # intermediates (p, dp, ds), so at long sequences (ViT-L/14@336,
    # Sp = 584) the group must shrink to stay inside the ~16 MB VMEM.
    #
    # bshd block shapes are [1, Sp, G, D]: Mosaic requires the
    # second-to-last block dim divisible by 8 or equal to the array dim,
    # so valid G are exactly {H} ∪ {divisors of H that are multiples of
    # 8} — for CLIP's 12- and 8-head towers that collapses to G = H
    # (caught as a lowering error in perf/sweep_r5b.log round 5; the
    # bhsd layout blocks [1, G, Sp, D] carry no such constraint).
    divisors = [d for d in range(1, H + 1) if H % d == 0
                and (layout != "bshd" or d == H or d % 8 == 0)]
    if head_group > 0:
        # Snap an explicit request to the nearest valid divisor below it.
        G = max([d for d in divisors if d <= head_group]
                or [min(divisors)])
    else:
        # Budget the dominant VMEM residents of the bwd grid cell: the 3
        # [G, Sp, Sp] fp32 intermediates (p, dp, ds), the shared [Sp, Sp]
        # fp32 bias tile (head-invariant, one per cell), and the 7
        # [G, Sp, D] operand/output tiles (q, k, v, do, dq, dk, dv —
        # counted at 4 B/elem, conservative for bf16 inputs). 9 MiB of
        # the ~16 MiB VMEM leaves headroom for double-buffering and
        # scratch the compiler adds.
        budget = 9 * 2 ** 20
        fit = [d for d in divisors
               if (3 * d * Sp * Sp * 4 + Sp * Sp * 4
                   + 7 * d * Sp * D * 4) <= budget]
        # No fitting valid group (bshd at long S): take the smallest
        # valid one and let the compiler's real VMEM accounting decide —
        # the 9 MiB heuristic is conservative against the 16 MiB core.
        G = max(fit) if fit else min(divisors)
    pad = Sp - S

    qs = (q * scale).astype(q.dtype)
    if pad:
        cfg = [(0, 0), (0, pad), (0, 0), (0, 0)] if layout == "bshd" \
            else [(0, 0), (0, 0), (0, pad), (0, 0)]
        qs = jnp.pad(qs, cfg)
        k = jnp.pad(k, cfg)
        v = jnp.pad(v, cfg)

    # Bias stays [B|1, 1, Sp, Sp] — head-invariant, so the kernel loads
    # one [Sp, Sp] tile per cell instead of a per-head copy. Broadcast
    # forms ([B|1, 1, 1, S] padding masks) are expanded here.
    full_bias = jnp.zeros((1, 1, Sp, Sp), jnp.float32)
    if bias is not None:
        bias = jnp.broadcast_to(bias.astype(jnp.float32),
                                (bias.shape[0], 1, S, S))
        full_bias = full_bias + jnp.pad(
            bias, [(0, 0), (0, 0), (0, pad), (0, pad)])
    if pad:
        key_mask = (jnp.arange(Sp) >= S)
        full_bias = full_bias + jnp.where(key_mask, _NEG, 0.0)[None, None,
                                                              None, :]
    return qs, k, v, full_bias, (B, H, S, D, Sp, G)


def _grid_specs(B, H, Sp, D, G, bias_batched, layout="bhsd"):
    grid = (B, H // G)
    if layout == "bshd":
        qkv_spec = pl.BlockSpec((1, Sp, G, D),
                                lambda b, h: (b, 0, h, 0),
                                memory_space=pltpu.VMEM)
    else:
        qkv_spec = pl.BlockSpec((1, G, Sp, D),
                                lambda b, h: (b, h, 0, 0),
                                memory_space=pltpu.VMEM)
    bias_index = (lambda b, h: (b, 0, 0, 0)) if bias_batched \
        else (lambda b, h: (0, 0, 0, 0))
    bias_spec = pl.BlockSpec((1, 1, Sp, Sp), bias_index,
                             memory_space=pltpu.VMEM)
    return grid, qkv_spec, bias_spec


def _padded_shape(B, H, Sp, D, layout):
    return (B, Sp, H, D) if layout == "bshd" else (B, H, Sp, D)


def _unpad(x, S, layout):
    return x[:, :S] if layout == "bshd" else x[:, :, :S]


def _fused_forward(q, k, v, bias, scale, head_group, layout="bhsd"):
    qs, kp, vp, bp, (B, H, S, D, Sp, G) = _prepare(q, k, v, bias, scale,
                                                   head_group, layout)
    grid, qkv_spec, bias_spec = _grid_specs(B, H, Sp, D, G,
                                            bp.shape[0] == B, layout)
    out = pl.pallas_call(
        _fwd_kernel_bshd if layout == "bshd" else _fwd_kernel,
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(_padded_shape(B, H, Sp, D, layout),
                                       q.dtype,
                                       vma=_vma(qs, kp, vp, bp)),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Sp * Sp * D,
            bytes_accessed=4 * B * H * Sp * D * q.dtype.itemsize,
            transcendentals=B * H * Sp * Sp),
        interpret=_interpret(),
    )(qs, kp, vp, bp)
    return _unpad(out, S, layout)


def _fused_backward(q, k, v, bias, scale, head_group, do, layout="bhsd"):
    qs, kp, vp, bp, (B, H, S, D, Sp, G) = _prepare(q, k, v, bias, scale,
                                                   head_group, layout)
    if Sp != S:
        cfg = [(0, 0), (0, Sp - S), (0, 0), (0, 0)] if layout == "bshd" \
            else [(0, 0), (0, 0), (0, Sp - S), (0, 0)]
        dop = jnp.pad(do, cfg)
    else:
        dop = do
    grid, qkv_spec, bias_spec = _grid_specs(B, H, Sp, D, G,
                                            bp.shape[0] == B, layout)
    dq, dk, dv = pl.pallas_call(
        _bwd_kernel_bshd if layout == "bshd" else _bwd_kernel,
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, qkv_spec],
        out_specs=(qkv_spec, qkv_spec, qkv_spec),
        out_shape=tuple(jax.ShapeDtypeStruct(
            _padded_shape(B, H, Sp, D, layout), q.dtype,
            vma=_vma(qs, kp, vp, bp, dop))
            for _ in range(3)),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * Sp * Sp * D,
            bytes_accessed=8 * B * H * Sp * D * q.dtype.itemsize,
            transcendentals=B * H * Sp * Sp),
        interpret=_interpret(),
    )(qs, kp, vp, bp, dop)
    # dq carries the folded-in scale: d(q·scale)/dq = scale.
    return (_unpad(dq, S, layout) * scale).astype(q.dtype), \
        _unpad(dk, S, layout), _unpad(dv, S, layout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_attention_vjp(q: jax.Array, k: jax.Array, v: jax.Array,
                         bias: Optional[jax.Array], scale: float,
                         head_group: int = 0,
                         layout: str = "bhsd") -> jax.Array:
    return _fused_forward(q, k, v, bias, scale, head_group, layout)


def _bshd_geometry_feasible(H: int, S: int, D: int) -> bool:
    """Whether ANY bshd head-group both satisfies Mosaic block tiling
    (G == H or G % 8 == 0 — see :func:`_prepare`) and fits VMEM. The
    compiler double-buffers the block operands, so the backward cell
    budget is ~2x the resident estimate; at ViT-B/16's (H=12, Sp=200)
    the only valid group G=12 needs ~22 MB against the 16 MB core
    (measured lowering failure, perf/sweep_r5b.log round 5) — bshd is
    structurally infeasible there and the wrapper transposes to the
    unconstrained bhsd kernel instead."""
    Sp = _round_up(S, 8)
    divisors = [d for d in range(1, H + 1) if H % d == 0
                and (d == H or d % 8 == 0)]
    g = min(divisors)
    est = 2 * (3 * g * Sp * Sp * 4 + Sp * Sp * 4 + 7 * g * Sp * D * 4)
    return est <= 15 * 2 ** 20


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    bias: Optional[jax.Array], scale: float,
                    head_group: int = 0,
                    layout: str = "bhsd") -> jax.Array:
    """Fused attention. q/k/v: [B, H, S, D] (``layout="bhsd"``, default)
    or [B, S, H, D] (``layout="bshd"`` — the raw projection reshape, no
    host-side head transpose; the reorder happens in VMEM inside the
    kernel, avoiding the ~34 GB/s HBM relayout copies the XLA path pays,
    perf/TRACE_ANALYSIS.md round 3). bias broadcastable [B|1, 1, S, S]
    additive (causal+padding for the text tower, None for vision);
    returns the input layout.

    Differentiable w.r.t. q, k, v ONLY. The bias is stop-gradiented here
    — by declared semantics, not silently: the custom VJP computes no
    bias cotangent (our biases are data-independent masks). Differentiate
    through the XLA path (`models.clip._xla_attention`) if a trainable
    bias is ever needed."""
    if bias is not None:
        bias = jax.lax.stop_gradient(bias)
    if layout == "bshd" and not _bshd_geometry_feasible(
            q.shape[2], q.shape[1], q.shape[3]):
        # No bshd head-group is both tile-valid and VMEM-feasible at this
        # shape: route through the unconstrained bhsd kernel. The
        # explicit transposes are exactly what the bshd kernel exists to
        # avoid, but a slower kernel beats an uncompilable one.
        out = flash_attention(jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                              jnp.swapaxes(v, 1, 2), bias, scale,
                              head_group, "bhsd")
        return jnp.swapaxes(out, 1, 2)
    if _interpret() and _vma(q, k, v):
        # Pallas's CPU interpreter cannot evaluate kernel bodies under
        # shard_map's vma tracking (internal block dynamic_slice mixes
        # varying and invariant values). Off-TPU inside shard_map, fall
        # back to the XLA path the kernel is numerically pinned against
        # (tests/test_ops.py). On TPU the compiled kernel runs.
        from ..models.clip import _xla_attention, _xla_attention_bshd
        if layout == "bshd":
            return _xla_attention_bshd(q, k, v, bias, scale)
        return _xla_attention(q, k, v, bias, scale)
    return _flash_attention_vjp(q, k, v, bias, scale, head_group, layout)


def _fa_fwd(q, k, v, bias, scale, head_group, layout):
    return _fused_forward(q, k, v, bias, scale, head_group, layout), \
        (q, k, v, bias)


def _fa_bwd(scale, head_group, layout, res, do):
    q, k, v, bias = res
    dq, dk, dv = _fused_backward(q, k, v, bias, scale, head_group, do,
                                 layout)
    return dq, dk, dv, None


_flash_attention_vjp.defvjp(_fa_fwd, _fa_bwd)
