"""Sequence/context parallelism over the ``model`` mesh axis.

The reference has no sequence parallelism and none is needed for parity —
text is fixed at 77 tokens and ViT-B/32 has 50 patches (SURVEY.md §2.2/§5:
"absent, and structurally unnecessary"). This module is the fourth
parallelism family (after DP, Megatron TP, GPipe PP) for the same reason
the blockwise flash kernel exists (``ops/flash_attention.py``): so sequence
scaling is a mesh axis, not a rewrite, when a long-context variant
(ViT-L/14@336's 577 tokens and beyond) outgrows one chip's activation
memory.

Two cooperating pieces, both reusing the ``model`` mesh axis (sequence
parallelism shards *within-model* work, exactly the axis TP owns — the two
are therefore mutually exclusive, selected by ``TrainConfig
.sequence_parallel``; params stay replicated over the axis):

* **GSPMD context parallelism** (:func:`seq_sharding`): the encoder
  constrains its [B, S, D] activations to ``P(data, model)`` — every
  per-token op (layernorm, MLP, projections) runs on S/sp tokens per chip
  and the partitioner inserts the attention KV all-gather over ICI. No
  manual collectives; uneven S (197 = 196 + CLS) is handled by GSPMD
  padding.
* **Ring attention** (:func:`ring_attention`): the manual-collective
  alternative for genuinely long sequences — KV blocks rotate around the
  ``model`` ring via single-hop ``ppermute`` while each chip accumulates
  its local queries' online softmax (the same running max/normalizer
  recurrence as the blockwise kernel), so KV never materializes gathered
  and communication overlaps compute. Implemented as a ``shard_map``
  manual only over ``model`` (``data`` stays in auto mode, like
  ``parallel/pipeline.py``); reverse-mode AD transposes the ``ppermute``
  into the reverse rotation, giving the ring backward for free.

Math is identical to full attention (online softmax is an exact
reassociation) — pinned against the XLA path and single-device training
oracles in ``tests/test_sequence_parallel.py`` and the ``dryrun_multichip``
SP passes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .mesh import DATA_AXIS, MODEL_AXIS

_NEG = -1e9


class SeqParallelSpec(NamedTuple):
    """Runtime sequence-parallel parameters threaded through the model
    functions (like ``parallel.pipeline.PipelineSpec``)."""
    mesh: Mesh
    ring: bool = False


def seq_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [B, S, ...] activations: batch on ``data``, tokens on
    ``model``, trailing dims replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


def gathered_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for tower outputs handed back to the (replicated-over-
    ``model``) pooling/loss math: batch on ``data`` only."""
    return NamedSharding(mesh, P(DATA_AXIS))


def constrain_tokens(x: jax.Array, seq: Optional[SeqParallelSpec]):
    """Pin a [B, S, ...] activation's token dim onto the ``model`` axis."""
    if seq is None:
        return x
    return jax.lax.with_sharding_constraint(x, seq_sharding(seq.mesh))


def gather_tokens(x: jax.Array, seq: Optional[SeqParallelSpec]):
    """Re-replicate the token dim over ``model`` (one all-gather per tower
    output) so pooling/projections/losses see ordinary replicated math."""
    if seq is None:
        return x
    return jax.lax.with_sharding_constraint(x, gathered_sharding(seq.mesh))


# ---------------------------------------------------------------------------
# Ring attention
# ---------------------------------------------------------------------------

def _online_softmax_step(q, k_cur, v_cur, b_blk, carry):
    """One KV block of the running-softmax recurrence (fp32 statistics).

    q [B, Sq, H, D] (pre-scaled); k_cur/v_cur [B, Sk, H, D];
    b_blk [Bb, 1, Sq, Sk] or None; carry (m, l, acc) with
    m/l [B, H, Sq, 1] fp32 and acc [B, H, Sq, D] fp32."""
    m_prev, l_prev, acc = carry
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k_cur,
                   preferred_element_type=jnp.float32)
    if b_blk is not None:
        s = s + b_blk.astype(jnp.float32)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc * alpha + jnp.einsum(
        "bhqk,bkhd->bhqd", p.astype(v_cur.dtype), v_cur,
        preferred_element_type=jnp.float32)
    return m_new, l_new, acc


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   bias: Optional[jax.Array], scale: float,
                   mesh: Mesh) -> jax.Array:
    """Sequence-sharded attention with ppermute'd KV rotation.

    q, k, v: [B, S, H, D] (bshd layout) — global arrays whose token dim
    this function shards over the ``model`` axis; bias: [B or 1, 1, S, S]
    additive mask or None (stop-gradiented, as in ``ops/attention.py`` —
    biases here are data-independent masks). Returns [B, S, H, D].

    Each of the ``n`` ring steps computes the local queries' scores
    against one KV block (the one currently resident) and folds it into
    the running max/normalizer/accumulator; KV then hops to the next
    chip. Communication per step is one [B, S/n, H, D] pair over a
    single ICI hop, fully overlappable with the block's einsums. AD of
    the scan transposes the ``ppermute`` into the reverse rotation —
    the standard ring-attention backward.
    """
    n = mesh.shape[MODEL_AXIS]
    if bias is not None:
        bias = jax.lax.stop_gradient(bias)
    if n == 1:
        from ..models.clip import _xla_attention_bshd
        return _xla_attention_bshd(q, k, v, bias, scale)

    B, S, H, D = q.shape
    Sp = ((S + n - 1) // n) * n
    if Sp != S:
        pad = [(0, 0), (0, Sp - S), (0, 0), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        # Padded key columns must never win the softmax; padded query
        # rows compute garbage that the final slice drops.
        if bias is None:
            bias = jnp.zeros((1, 1, Sp, Sp), jnp.float32)
        else:
            bias = jnp.pad(bias.astype(jnp.float32),
                           [(0, 0), (0, 0), (0, Sp - S), (0, Sp - S)])
        bias = bias + jnp.where(jnp.arange(Sp) >= S, _NEG,
                                0.0)[None, None, None, :]
    Sl = Sp // n
    perm = [(p, (p + 1) % n) for p in range(n)]

    def body(q, k, v, bias):
        # Local shapes: q/k/v [B, Sl, H, D]; bias [Bb, 1, Sl, Sp] (all
        # key columns, local query rows) or None.
        i = jax.lax.axis_index(MODEL_AXIS)
        qs = q * scale

        def step(carry, j):
            m, l, acc, k_cur, v_cur = carry
            if bias is None:
                b_blk = None
            else:
                src = (i - j) % n
                b_blk = jax.lax.dynamic_slice_in_dim(
                    bias, src * Sl, Sl, axis=3)
            m, l, acc = _online_softmax_step(qs, k_cur, v_cur, b_blk,
                                             (m, l, acc))
            k_nxt = jax.lax.ppermute(k_cur, MODEL_AXIS, perm)
            v_nxt = jax.lax.ppermute(v_cur, MODEL_AXIS, perm)
            return (m, l, acc, k_nxt, v_nxt), None

        # Zero inits are device-invariant constants; the carry mixes them
        # with the varying k/v, so mark them varying over the manual axis
        # (the shard_map vma type system — see train/engine.py).
        def vary(x):
            return jax.lax.pcast(x, MODEL_AXIS, to="varying")

        m0 = vary(jnp.full((B, H, Sl, 1), _NEG, jnp.float32))
        l0 = vary(jnp.zeros((B, H, Sl, 1), jnp.float32))
        acc0 = vary(jnp.zeros((B, H, Sl, D), jnp.float32))
        (m, l, acc, _, _), _ = jax.lax.scan(
            step, (m0, l0, acc0, k, v), jnp.arange(n))
        o = acc / l                                   # [B, H, Sl, D]
        return o.transpose(0, 2, 1, 3).astype(q.dtype)

    if bias is None:
        def body2(q, k, v):
            return body(q, k, v, None)
        out = shard_map(body2, mesh=mesh, axis_names={MODEL_AXIS},
                        in_specs=(P(None, MODEL_AXIS),) * 3,
                        out_specs=P(None, MODEL_AXIS))(q, k, v)
    else:
        out = shard_map(body, mesh=mesh, axis_names={MODEL_AXIS},
                        in_specs=(P(None, MODEL_AXIS),) * 3
                        + (P(None, None, MODEL_AXIS, None),),
                        out_specs=P(None, MODEL_AXIS))(q, k, v, bias)
    return out[:, :S]
