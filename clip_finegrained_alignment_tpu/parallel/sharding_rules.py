"""Parameter sharding rules: DP replication, tensor parallelism, ZeRO-1,
and FSDP/ZeRO-3.

The reference has exactly one strategy — DDP data parallelism
(SURVEY.md §2.2) — which maps to replicated params and a batch-sharded
``data`` axis. This module adds the standard Megatron-style 2D extension
over the ``model`` mesh axis so larger towers (ViT-L/14 and beyond) scale
past one chip's HBM without a rewrite:

* attention q/k/v kernels ``[L, D, D]``: output (head) dim sharded —
  column-parallel; ``out`` kernel input dim sharded — row-parallel.
* MLP ``fc1 [L, D, F]``: F sharded (column-parallel); ``fc2 [L, F, D]``:
  F sharded (row-parallel).
* embeddings, layernorms, projections, logit_scale: replicated.

With ``jax.jit`` + these ``NamedSharding``s the XLA partitioner inserts the
(all-gather/reduce-scatter) collectives over ICI; no manual communication
code. Biases of column-parallel layers are sharded to match; row-parallel
biases stay replicated (added after the partial-sum reduction).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS, PIPE_AXIS

# Pytree key-path suffix → PartitionSpec for the stacked [L, ...] layer
# params. None → replicated.
_LAYER_RULES = {
    ("q", "kernel"): P(None, None, MODEL_AXIS),
    ("q", "bias"): P(None, MODEL_AXIS),
    ("k", "kernel"): P(None, None, MODEL_AXIS),
    ("k", "bias"): P(None, MODEL_AXIS),
    ("v", "kernel"): P(None, None, MODEL_AXIS),
    ("v", "bias"): P(None, MODEL_AXIS),
    ("out", "kernel"): P(None, MODEL_AXIS, None),
    ("out", "bias"): P(),
    ("fc1", "kernel"): P(None, None, MODEL_AXIS),
    ("fc1", "bias"): P(None, MODEL_AXIS),
    ("fc2", "kernel"): P(None, MODEL_AXIS, None),
    ("fc2", "bias"): P(),
}


def _spec_for_path(path) -> P:
    keys = tuple(getattr(k, "key", None) or str(k) for k in path)
    if len(keys) >= 2:
        tail = (keys[-2], keys[-1])
        if tail in _LAYER_RULES and "layers" in keys:
            return _LAYER_RULES[tail]
    return P()


def param_specs(params: Any) -> Any:
    """PartitionSpec pytree for a CLIP param tree (TP over ``model``,
    replicated over ``data``)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _spec_for_path(path), params)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for device_put / jit in_shardings."""
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec),
                        param_specs(params))


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Lay out a param tree onto the mesh per the rules. With
    ``model=1`` every spec degenerates to replication — the pure-DP
    parity layout."""
    sh = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, sh)


# ---------------------------------------------------------------------------
# Composed base layouts (TP weight dims + pipeline stage dim)
# ---------------------------------------------------------------------------

def _base_spec(path, shape, tp: int, pp: int) -> P:
    """The non-data layout of one params-shaped leaf: TP Megatron dims
    (``tp > 1``) and/or the pipeline stage dim (``pp > 1``, stacked layer
    leaves sharded on L — parallel/pipeline.py). Both at once is the
    composed TP x PP layout, e.g. fc1 kernel [L, D, F] →
    ``P('pipe', None, 'model')``."""
    spec = list(_spec_for_path(path)) if tp > 1 else []
    if pp > 1 and shape:
        keys = tuple(getattr(k, "key", None) or str(k) for k in path)
        if "layers" in keys and shape[0] % pp == 0 and shape[0] >= pp:
            if not spec:
                spec = [PIPE_AXIS]
            elif spec[0] is None:
                spec[0] = PIPE_AXIS
    return P(*spec)


def composed_param_specs(params: Any, mesh: Mesh,
                         megatron_base: bool = True) -> Any:
    """PartitionSpec pytree for the composed TP x PP base layout: Megatron
    weight-dim sharding over ``model`` (when the mesh has one and it is
    the TP axis) plus stage sharding of the stacked layer dim over
    ``pipe``. With one of the axes at size 1 this degenerates to the
    plain TP or plain pipeline layout.

    ``megatron_base=False`` (the SP+PP layout: params replicated over
    ``model`` because the axis shards tokens) exists only for symmetry
    with ``_data_axis_specs`` — the engine rejects SP composed with PP
    upstream (``train/engine.py::make_train_step``), so no runtime path
    reaches it."""
    tp = mesh.shape.get(MODEL_AXIS, 1) if megatron_base else 1
    pp = mesh.shape.get(PIPE_AXIS, 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _base_spec(path, getattr(leaf, "shape", None),
                                      tp, pp), params)


def composed_param_shardings(params: Any, mesh: Mesh,
                             megatron_base: bool = True) -> Any:
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec),
                        composed_param_specs(params, mesh, megatron_base))


def shard_params_composed(params: Any, mesh: Mesh) -> Any:
    """Lay a (stacked-layout) param tree onto the mesh with the composed
    TP x PP layout."""
    return jax.tree.map(jax.device_put, params,
                        composed_param_shardings(params, mesh))


# ---------------------------------------------------------------------------
# Data-axis sharding of params-shaped trees (shared by ZeRO-1 and FSDP)
# ---------------------------------------------------------------------------

def _data_axis_specs(tree: Any, mesh: Mesh,
                     megatron_base: bool = True) -> Any:
    """PartitionSpec pytree sharding every leaf of a params-shaped tree
    over ``data``, on top of whatever TP/PP base layout applies.

    Per leaf: shard the largest dim divisible by ``dp`` that the TP rules
    (active only when ``model > 1``) and the pipeline stage dim (active
    only when ``pipe > 1``) leave unsharded; leaves with no such dim
    (scalars, small embeddings, the step counter) stay replicated.

    ``megatron_base=False``: a ``model`` axis present in the mesh is NOT
    the Megatron TP axis (it is the sequence axis,
    ``TrainConfig.sequence_parallel``) — params-shaped leaves stay
    replicated over it and only ``data`` (+ ``pipe``) shard.
    """
    dp = mesh.shape.get(DATA_AXIS, 1)
    tp = mesh.shape.get(MODEL_AXIS, 1) if megatron_base else 1
    pp = mesh.shape.get(PIPE_AXIS, 1)

    def base_spec(path, shape):
        return _base_spec(path, shape, tp, pp)

    def spec_for(path, leaf):
        shape = getattr(leaf, "shape", None)
        if dp == 1 or shape is None or len(shape) == 0:
            return base_spec(path, shape) if (tp > 1 or pp > 1) else P()
        base = base_spec(path, shape)
        spec = list(base) + [None] * (len(shape) - len(base))
        best = None
        for i, s in enumerate(shape):
            if spec[i] is None and s % dp == 0 and s >= dp:
                if best is None or s > shape[best]:
                    best = i
        if best is not None:
            spec[best] = DATA_AXIS
        return P(*spec)

    return jax.tree_util.tree_map_with_path(spec_for, tree)


def zero1_opt_specs(opt_state: Any, mesh: Mesh,
                    megatron_base: bool = True) -> Any:
    """PartitionSpec pytree sharding optimizer-state leaves over ``data``.

    The reference replicates optimizer state on every rank (DDP keeps a
    full Adam copy per GPU, ``dist_finetuner.py:57``); AdamSPD quadruples
    that (mu, nu, anchors + master params — 6.9 GB for ViT-L/14,
    BASELINE.md). ZeRO-1 shards each state leaf over the ``data`` axis:
    the jitted step's elementwise optimizer math then runs on 1/dp of
    every tensor per chip and XLA inserts the ICI collectives that
    re-assemble the (replicated) updated params — no manual
    reduce-scatter/all-gather code, exactly the partitioner's job.
    AdamSPD's per-tensor SPD norms become cross-device reductions the
    partitioner also handles (pinned vs the replicated oracle in
    tests/test_train_engine.py).
    """
    return _data_axis_specs(opt_state, mesh, megatron_base)


# ---------------------------------------------------------------------------
# FSDP / ZeRO-3: parameter sharding over the data axis
# ---------------------------------------------------------------------------

def fsdp_param_specs(params: Any, mesh: Mesh,
                     megatron_base: bool = True) -> Any:
    """PartitionSpec pytree sharding *parameters* over ``data`` — the
    ZeRO-3/FSDP layout, one step past ZeRO-1.

    Between steps each chip stores 1/dp of every weight (and, since optax
    states are ``zeros_like``/copies of params, 1/dp of the mu/nu/anchor
    buffers too — ZeRO-1 is subsumed). Inside the jitted step the
    partitioner inserts the per-use all-gather that re-assembles each
    weight right before its matmul and a reduce-scatter of its gradient —
    the FSDP schedule, emitted by GSPMD from nothing but these
    ``NamedSharding``s. Compute cost: one extra param-tree all-gather
    per forward (+ its transpose), ~0.6 GB/step for ViT-B/16 — same order
    as ZeRO-1's update gather (docs/SCALING.md); the win is params
    dropping 1/dp per chip, on the axis that is already there (no TP
    divisibility constraints on the model dims).

    Composes with TP (Megatron dims claimed first) and with the pipeline
    stage dim. Identical math to the replicated layout — pinned vs the
    replicated oracle in tests/test_train_engine.py.
    """
    return _data_axis_specs(params, mesh, megatron_base)


def fsdp_param_shardings(params: Any, mesh: Mesh,
                         megatron_base: bool = True) -> Any:
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec),
                        fsdp_param_specs(params, mesh, megatron_base))


def shard_params_fsdp(params: Any, mesh: Mesh) -> Any:
    """Lay a param tree onto the mesh FSDP-style (data-axis sharded)."""
    return jax.tree.map(jax.device_put, params,
                        fsdp_param_shardings(params, mesh))


def zero1_opt_shardings(opt_state: Any, mesh: Mesh,
                        megatron_base: bool = True) -> Any:
    """NamedSharding pytree for jit in/out_shardings + device_put."""
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec),
                        zero1_opt_specs(opt_state, mesh, megatron_base))


def shard_opt_state(opt_state: Any, mesh: Mesh) -> Any:
    """Re-lay an optimizer state onto the mesh ZeRO-1 style."""
    sh = zero1_opt_shardings(opt_state, mesh)
    return jax.tree.map(jax.device_put, opt_state, sh)


def validate_tp_divisibility(params: Any, mesh: Mesh) -> None:
    """Check every sharded dim divides by the ``model`` axis size before
    XLA produces an inscrutable partitioning error."""
    tp = mesh.shape[MODEL_AXIS]
    if tp == 1:
        return
    problems = []

    def check(path, leaf):
        spec = _spec_for_path(path)
        for dim, axis in enumerate(spec):
            if axis == MODEL_AXIS and leaf.shape[dim] % tp != 0:
                problems.append(
                    f"{jax.tree_util.keystr(path)}: dim {dim} size "
                    f"{leaf.shape[dim]} not divisible by model={tp}")

    jax.tree_util.tree_map_with_path(check, params)
    if problems:
        raise ValueError("tensor-parallel divisibility failures:\n  "
                         + "\n  ".join(problems[:10]))
