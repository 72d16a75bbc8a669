"""Fused SPARC local-alignment Pallas kernel.

The SPARC local term chains five ops per batch element
(``/root/reference/finetune/losses.py:221-245``; pure-XLA re-implementation
in ``objectives/losses.py``):

    l_norm = normalize(l_token)          [T, D]
    v_norm = normalize(v_patch)          [P, D]
    sim    = l_norm @ v_normᵀ            [T, P]
    w      = renorm(threshold(minmax(sim, mask)))   [T, P]
    out    = w @ v_patch                 [T, D]   (unnormalized patches —
                                                   the reference quirk)

Left to XLA this materializes sim and w in HBM between fusions; this kernel
(the BASELINE.json north-star "similarity → min-max → threshold → pooling in
one kernel") runs the whole chain per batch element inside VMEM — HBM sees
only v_patch, l_token, mask in and the pooled [T, D] out. At CLIP shapes
(T=77, P≤197, D=512) every intermediate fits VMEM with room to spare, so
the grid is simply (B,).

Backward: a second fused Pallas kernel that recomputes the forward chain
in VMEM and emits dv/dl directly (flash-style recompute — residuals are
just the inputs; no [T, P] tensor ever reaches HBM in either direction).
The hand-derived VJP mirrors the XLA chain's autodiff semantics exactly:
min/max cotangents split evenly among ties, the ``clip(·, EPS)`` and
``max(Σx², eps²)`` guards gate their branches, and thresholded entries
pass no gradient. Validated against ``jax.vjp`` of the unfused chain in
``tests/test_ops.py`` (random + edge cases).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._pallas_common import interpret as _interpret, vma as _vma

_EPS = 1e-8  # matches objectives/losses.py


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _sparc_kernel(v_ref, l_ref, mask_ref, o_ref, *, threshold: float,
                  num_patches: int):
    """One batch element: v [Pp, D], l [Tp, D], mask [Tp, 1] → out [Tp, D].

    The mask ships as [B, Tp, 1] so its block's trailing dims equal the
    array's (the Pallas TPU tiling rule: last two block dims divisible by
    (8, 128) or equal to the full array dims)."""
    v = v_ref[0].astype(jnp.float32)                      # [Pp, D]
    l = l_ref[0].astype(jnp.float32)                      # [Tp, D]
    mask = mask_ref[0]                                    # [Tp, 1] f32
    Tp = l.shape[0]
    Pp = v.shape[0]

    # x·rsqrt(max(Σx², eps²)) — EXACTLY objectives.losses.l2_normalize
    # (torch F.normalize semantics, eps=1e-12): zero rows (incl. padding)
    # normalize to zeros, and rows with 0 < ‖x‖ < eps divide by eps, not
    # their true norm. The backward kernel recomputes with the same guard
    # — fwd and bwd must describe the same function.
    NEPS = jnp.float32(1e-12 * 1e-12)
    v_sq = jnp.sum(v * v, axis=-1, keepdims=True)
    l_sq = jnp.sum(l * l, axis=-1, keepdims=True)
    v_norm = v * jax.lax.rsqrt(jnp.maximum(v_sq, NEPS))
    l_norm = l * jax.lax.rsqrt(jnp.maximum(l_sq, NEPS))

    sim = jax.lax.dot_general(                            # [Tp, Pp]
        l_norm, v_norm, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    tmask = mask                                          # [Tp, 1]
    col_valid = (jax.lax.broadcasted_iota(jnp.int32, (Tp, Pp), 1)
                 < num_patches)
    sim_masked = sim * tmask
    # ±2 sentinel (cosines live in [-1, 1]); a finfo.max sentinel
    # overflows sim_max - sim_min to -inf on masked rows and NaNs the
    # backward — see objectives/losses.py::sparc_alignment_weights.
    big = jnp.float32(2.0)
    consider = (tmask > 0) & col_valid
    sim_min = jnp.min(jnp.where(consider, sim_masked, big), axis=-1,
                      keepdims=True)
    sim_max = jnp.max(jnp.where(consider, sim_masked, -big), axis=-1,
                      keepdims=True)
    normalized = (sim_masked - sim_min) / (sim_max - sim_min + _EPS)
    thresholded = jnp.where(normalized < threshold, 0.0, normalized)
    thresholded = jnp.where(consider, thresholded * tmask, 0.0)
    denom = jnp.clip(jnp.sum(thresholded, axis=-1, keepdims=True),
                     _EPS, None)
    w = thresholded / denom                               # [Tp, Pp]

    o_ref[0] = jax.lax.dot_general(                       # [Tp, D]
        w, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _sparc_bwd_kernel(v_ref, l_ref, mask_ref, g_ref, dv_ref, dl_ref, *,
                      threshold: float, num_patches: int):
    """Fused backward for one batch element: recompute the forward chain
    in VMEM, then run the hand-derived VJP. v [Pp, D], l [Tp, D],
    mask [Tp, 1], g [Tp, D] (cotangent of the pooled output) →
    dv [Pp, D], dl [Tp, D].

    Matches jax.vjp of the unfused chain term-for-term:
      * ``l2_normalize`` = x·rsqrt(max(Σx², eps²)): the max gates the
        through-norm term (zero rows pass dvn·rsqrt only),
      * min/max reductions split their cotangent evenly among ties,
      * ``where(z < τ)`` passes no gradient below threshold,
      * ``clip(Σt, EPS)`` gates the denominator term.

    Tie-point convention: the eps gates here are strict inequalities
    (``denom_raw > _EPS``, ``v_sq > NEPS``), whereas ``jax.vjp`` of the
    XLA chain's ``jnp.maximum``/``jnp.clip`` splits the cotangent 50/50
    at an *exact* tie (x == eps). The subgradients differ only on that
    measure-zero boundary — inputs whose row-sum lands exactly on the
    eps never occur in training data, and everywhere else the VJP
    matches the chain term-for-term (pinned by tests/test_ops.py).
    """
    NEPS = jnp.float32(1e-12 * 1e-12)  # l2_normalize eps²
    v = v_ref[0].astype(jnp.float32)                      # [Pp, D]
    l = l_ref[0].astype(jnp.float32)                      # [Tp, D]
    mask = mask_ref[0]                                    # [Tp, 1] f32
    g = g_ref[0].astype(jnp.float32)                      # [Tp, D]
    Tp, Pp = l.shape[0], v.shape[0]

    # ---- forward recompute (identical to _sparc_kernel) ----
    v_sq = jnp.sum(v * v, axis=-1, keepdims=True)
    l_sq = jnp.sum(l * l, axis=-1, keepdims=True)
    rv = jax.lax.rsqrt(jnp.maximum(v_sq, NEPS))
    rl = jax.lax.rsqrt(jnp.maximum(l_sq, NEPS))
    v_norm = v * rv
    l_norm = l * rl

    sim = jax.lax.dot_general(
        l_norm, v_norm, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # [Tp, Pp]
    col_valid = (jax.lax.broadcasted_iota(jnp.int32, (Tp, Pp), 1)
                 < num_patches)
    sm = sim * mask
    big = jnp.float32(2.0)
    consider = (mask > 0) & col_valid
    mn = jnp.min(jnp.where(consider, sm, big), axis=-1, keepdims=True)
    mx = jnp.max(jnp.where(consider, sm, -big), axis=-1, keepdims=True)
    s = mx - mn + _EPS
    z = (sm - mn) / s
    thr = jnp.where(z < threshold, 0.0, z)
    t = jnp.where(consider, thr * mask, 0.0)
    denom_raw = jnp.sum(t, axis=-1, keepdims=True)
    denom = jnp.maximum(denom_raw, _EPS)
    w = t / denom                                         # [Tp, Pp]

    # ---- VJP ----
    # out = w @ v  (unnormalized patches)
    dw = jax.lax.dot_general(                             # g vᵀ [Tp, Pp]
        g, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dv = jax.lax.dot_general(                             # wᵀ g [Pp, D]
        w, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # w = t / clip(Σt, EPS): denominator branch gated on raw > EPS.
    active = (denom_raw > _EPS).astype(jnp.float32)
    dt = dw / denom - active * jnp.sum(dw * t, axis=-1,
                                       keepdims=True) / (denom * denom)
    # t = where(consider, thr·mask, 0); thr = where(z < τ, 0, z).
    dz = jnp.where((z < threshold) | ~consider, 0.0, dt * mask)
    # z = (sm - mn)/s with s = mx - mn + EPS:
    #   ∂z/∂mn = (z - 1)/s, ∂z/∂mx = -z/s.
    dsm = dz / s
    a = jnp.sum(dz * (z - 1.0), axis=-1, keepdims=True) / s  # → mn
    b = jnp.sum(dz * (-z), axis=-1, keepdims=True) / s       # → mx
    eq_mn = consider & (sm == mn)
    eq_mx = consider & (sm == mx)
    n_mn = jnp.maximum(jnp.sum(eq_mn.astype(jnp.float32), axis=-1,
                               keepdims=True), 1.0)
    n_mx = jnp.maximum(jnp.sum(eq_mx.astype(jnp.float32), axis=-1,
                               keepdims=True), 1.0)
    dsm = dsm + jnp.where(eq_mn, a / n_mn, 0.0) \
        + jnp.where(eq_mx, b / n_mx, 0.0)
    # sm = sim · mask (row-broadcast 0/1)
    dsim = dsm * mask                                     # [Tp, Pp]

    # sim = l_norm @ v_normᵀ
    dl_norm = jax.lax.dot_general(                        # dsim vn [Tp, D]
        dsim, v_norm, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dv_norm = jax.lax.dot_general(                        # dsimᵀ ln [Pp, D]
        dsim, l_norm, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # x_norm = x·rsqrt(max(Σx², eps²)): through-norm term gated on the max.
    act_v = (v_sq > NEPS).astype(jnp.float32)
    act_l = (l_sq > NEPS).astype(jnp.float32)
    dv = dv + dv_norm * rv \
        - v * jnp.sum(dv_norm * v, axis=-1, keepdims=True) \
        * (rv * rv * rv) * act_v
    dl = dl_norm * rl \
        - l * jnp.sum(dl_norm * l, axis=-1, keepdims=True) \
        * (rl * rl * rl) * act_l

    dv_ref[0] = dv.astype(dv_ref.dtype)
    dl_ref[0] = dl.astype(dl_ref.dtype)



def _fused_forward(v_patch, l_token, mask, threshold):
    B, P, D = v_patch.shape
    T = l_token.shape[1]
    Pp, Tp = _round_up(P, 8), _round_up(T, 8)
    v = jnp.pad(v_patch.astype(jnp.float32),
                [(0, 0), (0, Pp - P), (0, 0)])
    l = jnp.pad(l_token.astype(jnp.float32),
                [(0, 0), (0, Tp - T), (0, 0)])
    m = jnp.pad(mask.astype(jnp.float32),
                [(0, 0), (0, Tp - T)])[..., None]          # [B, Tp, 1]

    out = pl.pallas_call(
        functools.partial(_sparc_kernel, threshold=float(threshold),
                          num_patches=P),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Pp, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Tp, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tp, D), jnp.float32,
                                       vma=_vma(v, l, m)),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Tp * Pp * D,
            bytes_accessed=4 * B * (Pp * D + 2 * Tp * D),
            transcendentals=0),
        interpret=_interpret(),
    )(v, l, m)
    return out[:, :T]


def _reference_chain(v_patch, l_token, mask, threshold):
    """The pure-XLA chain (objectives/losses.py) the kernels are pinned
    against in tests (fwd values and bwd cotangents)."""
    from ..objectives.losses import l2_normalize, sparc_alignment_weights
    v32 = v_patch.astype(jnp.float32)
    l32 = l_token.astype(jnp.float32)
    sim = jnp.einsum("btd,bpd->btp", l2_normalize(l32), l2_normalize(v32))
    w = sparc_alignment_weights(sim, mask, threshold)
    return jnp.einsum("btp,bpd->btd", w, v32)


def _fused_backward(v_patch, l_token, mask, threshold, g):
    B, P, D = v_patch.shape
    T = l_token.shape[1]
    Pp, Tp = _round_up(P, 8), _round_up(T, 8)
    v = jnp.pad(v_patch.astype(jnp.float32),
                [(0, 0), (0, Pp - P), (0, 0)])
    l = jnp.pad(l_token.astype(jnp.float32),
                [(0, 0), (0, Tp - T), (0, 0)])
    m = jnp.pad(mask.astype(jnp.float32),
                [(0, 0), (0, Tp - T)])[..., None]
    gp = jnp.pad(g.astype(jnp.float32), [(0, 0), (0, Tp - T), (0, 0)])

    dv, dl = pl.pallas_call(
        functools.partial(_sparc_bwd_kernel, threshold=float(threshold),
                          num_patches=P),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Pp, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Pp, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Pp, D), jnp.float32,
                                 vma=_vma(v, l, m, gp)),
            jax.ShapeDtypeStruct((B, Tp, D), jnp.float32,
                                 vma=_vma(v, l, m, gp)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * B * Tp * Pp * D,
            bytes_accessed=4 * B * (2 * Pp * D + 3 * Tp * D),
            transcendentals=0),
        interpret=_interpret(),
    )(v, l, m, gp)
    return (dv[:, :P].astype(v_patch.dtype),
            dl[:, :T].astype(l_token.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_sparc_pooling_vjp(v_patch: jax.Array, l_token: jax.Array,
                             mask: jax.Array, threshold: float) -> jax.Array:
    return _fused_forward(v_patch, l_token, mask, threshold)


def fused_sparc_pooling(v_patch: jax.Array, l_token: jax.Array,
                        mask: jax.Array, threshold: float) -> jax.Array:
    """Language-grouped patch pooling, fused. v_patch [B, P, D] projected
    patch embeddings (unnormalized), l_token [B, T, D], mask [B, T] →
    [B, T, D] fp32. Numerically equal to the unfused chain in
    ``objectives/losses.py`` (validated in ``tests/test_ops.py``).

    Differentiable w.r.t. v_patch and l_token; the mask is
    stop-gradiented by declared semantics (the VJP computes no mask
    cotangent — masks are data-independent)."""
    if _interpret() and _vma(v_patch, l_token, mask):
        # Pallas's CPU interpreter cannot evaluate kernel bodies under
        # shard_map's vma tracking; off-TPU inside shard_map (the
        # DDP-parity train path on the CPU test mesh), fall back to the
        # unfused XLA chain the kernels are numerically pinned against
        # (tests/test_ops.py). On TPU the compiled kernels run.
        return _reference_chain(v_patch, l_token,
                                jax.lax.stop_gradient(mask), threshold)
    return _fused_sparc_pooling_vjp(v_patch, l_token,
                                    jax.lax.stop_gradient(mask), threshold)


def _fsp_fwd(v_patch, l_token, mask, threshold):
    return _fused_forward(v_patch, l_token, mask, threshold), \
        (v_patch, l_token, mask)


def _fsp_bwd(threshold, res, g):
    v_patch, l_token, mask = res
    dv, dl = _fused_backward(v_patch, l_token, mask, threshold, g)
    return dv, dl, None


_fused_sparc_pooling_vjp.defvjp(_fsp_fwd, _fsp_bwd)
