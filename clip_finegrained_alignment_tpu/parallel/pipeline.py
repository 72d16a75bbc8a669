"""GPipe-style pipeline parallelism over the stacked encoder layers.

The reference has no pipeline parallelism (SURVEY.md §2.2 — DDP is its only
strategy); this is a beyond-reference scaling axis, the third leg of the
mesh (``data`` = DP, ``model`` = Megatron TP, ``pipe`` = this module). It
exists for the same reason the TP axis does (BASELINE.md "ViT-L/14 scaling
story"): towers past ViT-L/14 outgrow one chip's 15.75 GB HBM — with
``pipe=K`` each stage holds 1/K of every encoder layer's params, grads AND
optimizer state (AdamSPD's 4x fp32 buffers included), at the cost of a
(K-1)/(M+K-1) bubble instead of TP's per-layer collectives.

Design (TPU-first):

* The scan-stacked ``[L, ...]`` layer trees (``models/clip.py``) are sharded
  on the layer dim over ``pipe`` — stage ``s`` physically holds layers
  ``[s·L/K, (s+1)·L/K)``. No parameter reshuffling, no per-stage module
  classes: the stage split IS a ``PartitionSpec('pipe', ...)``.
* The schedule is a ``shard_map`` manual only over the ``pipe`` axis
  (``axis_names={'pipe'}``): the ``data``/``model`` axes stay in auto mode,
  so DP batch sharding (and its gradient collectives) keep riding the
  partitioner unchanged. Inside, a ``lax.scan`` over ``M + K - 1`` ticks
  runs the classic GPipe wavefront: stage 0 injects microbatch ``t``,
  stage ``s`` processes microbatch ``t - s``, activations hop stage→stage+1
  via single-ICI-hop ``ppermute`` (stages are mesh neighbors —
  ``mesh.make_mesh`` puts ``pipe`` minor).
* Only the encoder-layer stack is pipelined. Embeddings, final layernorms,
  pooling, projections and the loss run in the surrounding jit program
  (replicated over ``pipe``), so their gradients need no special-casing —
  the partitioner sees ordinary replicated math.
* The backward schedule is ``jax.grad`` of the forward scan: AD transposes
  the ``ppermute`` into the reverse hop and replays the wavefront backward
  (activations of each tick are stored, or rematerialized per the model's
  ``remat`` policy which wraps the layer body inside the stage function).
* Math is identical to the unpipelined encoder (the microbatch split only
  reorders fp32 accumulation) — pinned in ``tests/test_pipeline.py``
  against single-device oracles, and in ``__graft_entry__.py``'s
  dp2xpp4 dry-run.

Activation memory (measured from XLA's buffer assignment —
``perf/pp_activation_report.py``, pinned in
``tests/test_pipeline_memory.py``): per-stage temp allocation for the pp4
train step is **2.3x below** the unpipelined step at the same batch (each
stage stores residuals for its own L/K layers only), per-layer remat
reaches inside the stages for another **3.9x** (``jax.checkpoint`` wraps
the layer body inside ``stage_fn``), and at fixed global batch raising the
microbatch count M does **not** raise temp (the all-M in-flight storage
totals ~activations(B) regardless of the split; measured, it shrinks).
The linear term is in B at fixed microbatch size — GPipe keeps every
microbatch's stage inputs resident between the forward and reverse
wavefronts. A 1F1B schedule would NOT remove that term here: 1F1B's
<=K-in-flight bound requires the loss to decompose over microbatches so
each microbatch's backward can run early, and every loss in this framework
is contrastive over the FULL batch (global-negatives InfoNCE/SPARC couple
all B samples — ``objectives/losses.py``; reference
``finetune/losses.py:14-36,215-252``), so d(loss)/d(embedding) exists only
after all M microbatches' embeddings are materialized. Under that
constraint, AD-of-the-wavefront + per-layer checkpoint (store layer
inputs, recompute the rest backward) is already the memory-optimal
schedule; the numbers above quantify it.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .mesh import PIPE_AXIS


class PipelineSpec(NamedTuple):
    """Runtime pipeline parameters threaded through the model functions."""
    mesh: Mesh
    num_micro: int


def default_num_micro(num_stages: int, configured: int = 0) -> int:
    """GPipe microbatch count: the configured value, or 2x the stage count
    (bubble fraction (K-1)/(2K+K-1) = ~1/3; raise M to shrink it further
    at the cost of smaller per-stage matmuls)."""
    return configured if configured > 0 else 2 * num_stages


# ---------------------------------------------------------------------------
# Parameter layout
# ---------------------------------------------------------------------------

def _is_layer_leaf_path(path) -> bool:
    keys = tuple(getattr(k, "key", None) or str(k) for k in path)
    return "layers" in keys


def pipeline_param_specs(params: Any) -> Any:
    """PartitionSpec pytree: stacked ``layers`` leaves sharded on the layer
    dim over ``pipe``; everything else replicated."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: P(PIPE_AXIS) if _is_layer_leaf_path(path)
        else P(), params)


def pipeline_param_shardings(params: Any, mesh: Mesh) -> Any:
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec),
                        pipeline_param_specs(params))


def shard_params_pipeline(params: Any, mesh: Mesh) -> Any:
    """Lay a (stacked-layout) param tree onto the mesh with encoder layers
    stage-sharded over ``pipe``."""
    return jax.tree.map(jax.device_put, params,
                        pipeline_param_shardings(params, mesh))


def validate_pipe_divisibility(model_cfg, mesh_cfg, batch_size: int,
                               num_micro: int = 0) -> None:
    """Fail fast (instead of an inscrutable partitioner error) when the
    stage count doesn't divide both towers' layer counts, or the microbatch
    split doesn't divide the per-step batch."""
    k = mesh_cfg.pipe
    if k <= 1:
        return
    m = default_num_micro(k, num_micro)
    problems = []
    for tower, n in (("vision", model_cfg.vision.num_layers),
                     ("text", model_cfg.text.num_layers)):
        if n % k != 0:
            problems.append(f"{tower} tower: {n} layers not divisible by "
                            f"pipe={k}")
    if batch_size % m != 0:
        problems.append(f"batch_size {batch_size} not divisible by "
                        f"pipeline_microbatches {m}")
    if problems:
        raise ValueError("pipeline divisibility failures:\n  "
                         + "\n  ".join(problems))


# ---------------------------------------------------------------------------
# The schedule
# ---------------------------------------------------------------------------

def pipeline_encoder(stage_fn: Callable, layers_stacked: Any, x: jax.Array,
                     bias: Optional[jax.Array], *, mesh: Mesh,
                     num_micro: int) -> jax.Array:
    """Run ``stage_fn(local_layers, h, bias_mb)`` as a K-stage GPipe
    pipeline over the ``pipe`` mesh axis.

    ``stage_fn`` applies a contiguous chunk of encoder layers (the caller
    closes over num_heads/eps/dtype/remat — see ``models/clip.py::encoder``);
    ``layers_stacked`` is the full ``[L, ...]`` tree, placed with
    ``pipeline_param_shardings`` so each stage receives its ``[L/K, ...]``
    slice. ``x``: ``[B, S, D]`` activations (replicated over ``pipe``;
    ``data`` sharding of B stays in auto mode). ``bias``: ``None``, a
    broadcast ``[1, ...]`` bias, or a per-sample ``[B, ...]`` bias that is
    microbatched in lockstep with ``x``.
    """
    K = mesh.shape[PIPE_AXIS]
    M = num_micro
    B = x.shape[0]
    if B % M != 0:
        raise ValueError(f"batch {B} not divisible by num_micro {M}")
    per_sample_bias = bias is not None and bias.shape[0] == B

    def body(local_layers, x, bias):
        stage = jax.lax.axis_index(PIPE_AXIS)
        xb = x.reshape((M, B // M) + x.shape[1:])
        # pcast through fp32: AD transposes this invariant→varying
        # broadcast into a psum of the activation cotangent over
        # ``pipe``, and XLA:CPU's all-reduce lowering check-fails on
        # bf16 operands (same bug as the output broadcast below). The
        # round-trip is a no-op for the forward values.
        xb = jax.lax.pcast(xb.astype(jnp.float32), PIPE_AXIS,
                           to='varying').astype(x.dtype)
        if per_sample_bias:
            bb = bias.reshape((M, B // M) + bias.shape[1:])

        def tick(carry, t):
            state, outputs = carry
            # Stage s processes microbatch (t - s); stage 0 injects fresh
            # input, later stages consume the ppermute'd carry. Clamped
            # indices feed garbage microbatches through the drain ticks —
            # their outputs are never written (see idx below).
            mb_idx = jnp.clip(t - stage, 0, M - 1)
            inject = jax.lax.dynamic_index_in_dim(
                xb, jnp.clip(t, 0, M - 1), keepdims=False)
            h = jnp.where(stage == 0, inject, state)
            if bias is None:
                b_mb = None
            elif per_sample_bias:
                b_mb = jax.lax.dynamic_index_in_dim(bb, mb_idx,
                                                    keepdims=False)
            else:
                b_mb = bias
            y = stage_fn(local_layers, h, b_mb)
            # Only the last stage's writes are kept (psum mask below);
            # earlier garbage writes at clamped idx 0 are overwritten by
            # the first real one at t = K - 1.
            idx = jnp.clip(t - (K - 1), 0, M - 1)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, y, idx, 0)
            state = jax.lax.ppermute(
                y, PIPE_AXIS, [(i, i + 1) for i in range(K - 1)])
            return (state, outputs), None

        state0 = jnp.zeros_like(xb[0])
        out0 = jnp.zeros_like(xb)
        (_, outputs), _ = jax.lax.scan(
            tick, (state0, out0), jnp.arange(M + K - 1))
        # One-to-all broadcast of the last stage's outputs (psum of a
        # masked value); makes the result pipe-invariant so the
        # surrounding program (final LN, pooling, projections, loss)
        # runs as ordinary replicated math. The psum runs in fp32: exact
        # either way (each element has exactly one nonzero contributor),
        # and XLA:CPU's all-reduce lowering check-fails outright on
        # bf16 operands ("Invalid binary instruction opcode copy",
        # hlo_instruction.cc:1585) — which is also the 8-virtual-device
        # surface the driver dry-runs this path on.
        masked = jnp.where(stage == K - 1, outputs, jnp.zeros_like(outputs))
        outputs = jax.lax.psum(
            masked.astype(jnp.float32), PIPE_AXIS).astype(outputs.dtype)
        return outputs.reshape(x.shape)

    if bias is None:
        def body2(local_layers, x):
            return body(local_layers, x, None)
        return shard_map(body2, mesh=mesh, axis_names={PIPE_AXIS},
                         in_specs=(P(PIPE_AXIS), P()),
                         out_specs=P())(layers_stacked, x)
    return shard_map(body, mesh=mesh, axis_names={PIPE_AXIS},
                     in_specs=(P(PIPE_AXIS), P(), P()),
                     out_specs=P())(layers_stacked, x, bias)
