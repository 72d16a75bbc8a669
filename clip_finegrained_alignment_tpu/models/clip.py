"""TPU-native CLIP dual-tower model in pure-functional JAX.

Replaces the reference's HF ``transformers.CLIPModel`` substrate
(``/root/reference/finetune/finetuner.py:5,30``) and the OpenAI ``clip``
package (``/root/reference/finetune/count_finetuner.py:8,29``) with one
implementation designed for XLA:TPU:

* Params are a plain pytree (nested dicts of ``jnp.ndarray``) — trivially
  shardable with ``jax.sharding``, checkpointable with orbax, and importable
  from HF torch state dicts (see ``hf_import.py``).
* Encoder layers are **stacked** on a leading axis and executed with
  ``jax.lax.scan`` — one compiled layer body instead of L unrolled copies
  (faster compiles, identical math, XLA pipelines the layers).
* The patch "convolution" is a single reshape + matmul (non-overlapping
  stride ⇒ exact) so the embedding rides the MXU as one large GEMM instead
  of a conv.
* Precision policy: params fp32, compute optionally bf16, layernorms and
  softmax statistics always fp32 (replaces torch AMP + GradScaler,
  ``/root/reference/finetune/finetuner.py:51,119``).
* Optional Pallas flash-attention path (``ops/attention.py``) for both
  towers, enabled per-call.

Semantics match HF ``CLIPModel`` (quick-GELU MLP, pre-LN blocks, causal text
mask, EOS-token pooling, CLS pooling + post-LN for vision, learned
``logit_scale``) so checkpoints and eval protocols are interchangeable.
"""

from __future__ import annotations

import os
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import CLIPConfig, TextConfig, VisionConfig

Params = Dict[str, Any]

# Large negative for additive attention bias; avoids -inf NaN propagation in
# fully-masked rows (the reference hits the same issue and relies on
# masked_fill + CE 'none' reduction, losses.py:186-196).
_NEG_INF = -1e9


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def _init_linear(key, d_in, d_out, dtype=jnp.float32):
    k1, _ = jax.random.split(key)
    scale = d_in ** -0.5
    return {
        "kernel": (jax.random.normal(k1, (d_in, d_out)) * scale).astype(dtype),
        "bias": jnp.zeros((d_out,), dtype),
    }


def _init_layernorm(d, dtype=jnp.float32):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def _init_encoder_layer(key, d, d_ff, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    return {
        "ln1": _init_layernorm(d, dtype),
        "q": _init_linear(ks[0], d, d, dtype),
        "k": _init_linear(ks[1], d, d, dtype),
        "v": _init_linear(ks[2], d, d, dtype),
        "out": _init_linear(ks[3], d, d, dtype),
        "ln2": _init_layernorm(d, dtype),
        "fc1": _init_linear(ks[4], d, d_ff, dtype),
        "fc2": _init_linear(ks[5], d_ff, d, dtype),
    }


def _stack_layers(layers):
    """Stack a list of identically-shaped layer pytrees on a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layers)


def unstack_layers(params: "Params") -> "Params":
    """Convert both towers' scan-stacked ``layers`` trees ([L, ...] leaves)
    into tuples of L per-layer trees.

    Perf-layout alternative (``TrainConfig.unstack_layers``): with per-layer
    leaves as separate jit arguments, the backward writes each layer's
    weight grads into its own buffer instead of dynamic-update-slicing into
    the stacked [L, ...] buffer (the 69 ms/step fusion class in
    ``perf/TRACE_ANALYSIS.md``), and the forward reads plain parameters
    instead of slices. Identical math (``tests/test_model_parity.py``);
    checkpoints stay in the stacked format (``stack_layers`` at the save
    boundary)."""
    out = dict(params)
    for tower in ("vision", "text"):
        t = dict(params[tower])
        layers = t["layers"]
        if isinstance(layers, (list, tuple)):   # already unstacked
            continue
        num = jax.tree.leaves(layers)[0].shape[0]
        t["layers"] = tuple(
            jax.tree.map(lambda x, i=i: x[i], layers) for i in range(num))
        out[tower] = t
    return out


def stack_layers(params: "Params") -> "Params":
    """Inverse of :func:`unstack_layers` (the checkpoint-format layout)."""
    out = dict(params)
    for tower in ("vision", "text"):
        t = dict(params[tower])
        if isinstance(t["layers"], (list, tuple)):
            t["layers"] = _stack_layers(list(t["layers"]))
            out[tower] = t
    return out


def init_clip_params(key: jax.Array, cfg: CLIPConfig,
                     dtype=jnp.float32) -> Params:
    """Random-init a full CLIP parameter pytree."""
    kv, kt, kvp, ktp, kvl, ktl = jax.random.split(key, 6)
    v, t = cfg.vision, cfg.text

    patch_dim = v.patch_size * v.patch_size * 3
    vision = {
        "patch_embedding": {
            "kernel": (jax.random.normal(kvl, (patch_dim, v.hidden_size))
                       * patch_dim ** -0.5).astype(dtype),
        },
        "class_embedding": (jax.random.normal(kv, (v.hidden_size,))
                            * v.hidden_size ** -0.5).astype(dtype),
        "position_embedding": (jax.random.normal(
            jax.random.fold_in(kv, 1), (v.seq_len, v.hidden_size)) * 0.02
        ).astype(dtype),
        "pre_layernorm": _init_layernorm(v.hidden_size, dtype),
        "post_layernorm": _init_layernorm(v.hidden_size, dtype),
        "layers": _stack_layers([
            _init_encoder_layer(jax.random.fold_in(kv, 100 + i),
                                v.hidden_size, v.intermediate_size, dtype)
            for i in range(v.num_layers)
        ]),
    }
    text = {
        "token_embedding": (jax.random.normal(kt, (t.vocab_size, t.hidden_size))
                            * 0.02).astype(dtype),
        "position_embedding": (jax.random.normal(
            jax.random.fold_in(kt, 1),
            (t.max_position_embeddings, t.hidden_size)) * 0.02).astype(dtype),
        "final_layernorm": _init_layernorm(t.hidden_size, dtype),
        "layers": _stack_layers([
            _init_encoder_layer(jax.random.fold_in(kt, 100 + i),
                                t.hidden_size, t.intermediate_size, dtype)
            for i in range(t.num_layers)
        ]),
    }
    return {
        "vision": vision,
        "text": text,
        "visual_projection": {
            "kernel": (jax.random.normal(kvp, (v.hidden_size, cfg.projection_dim))
                       * v.hidden_size ** -0.5).astype(dtype)},
        "text_projection": {
            "kernel": (jax.random.normal(ktp, (t.hidden_size, cfg.projection_dim))
                       * t.hidden_size ** -0.5).astype(dtype)},
        "logit_scale": jnp.asarray(cfg.logit_scale_init, dtype),
    }


# ---------------------------------------------------------------------------
# Primitive ops
# ---------------------------------------------------------------------------

def quick_gelu(x):
    """HF CLIP activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def _fast_ln() -> bool:
    # Read at trace time (not import time) so setting the env var after
    # import works; tracing happens once per compile, so this is free.
    return os.environ.get("CFA_FAST_LAYERNORM", "0") == "1"


def layer_norm(p, x, eps):
    """LayerNorm with fp32 statistics (default policy). The env-gated fast
    path keeps everything in the compute dtype — measured as a perf
    experiment, not the default (mean/var of 768-dim bf16 rows lose real
    precision)."""
    dtype = x.dtype
    xs = x if _fast_ln() else x.astype(jnp.float32)
    mean = jnp.mean(xs, axis=-1, keepdims=True)
    var = jnp.var(xs, axis=-1, keepdims=True)
    y = (xs - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(y.dtype) + p["bias"].astype(y.dtype)
    return y.astype(dtype)


def linear(p, x, dtype=None):
    kernel = p["kernel"]
    if dtype is not None:
        kernel = kernel.astype(dtype)
        x = x.astype(dtype)
    y = x @ kernel
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def _linear_fn(quant: str):
    """The projection-GEMM implementation for a ``TrainConfig.quant`` mode:
    exact bf16 (default) or the dynamic-int8 MXU path (``ops/quant.py``,
    2x peak on v5e). Applied to the encoder-layer projections and the
    patch embedding — ~95% of model FLOPs; loss-facing projections and
    the [S,S] attention einsums stay exact."""
    if quant == "none":
        return linear
    from ..ops.quant import quant_linear
    return lambda p, x, dtype=None: quant_linear(p, x, dtype, quant)


# Attention score precision. Default: scores/softmax in the compute dtype
# — under bf16 this halves the [B, H, S, S] logits/probs HBM traffic, the
# dominant attention cost (+13% train throughput measured on v5e; CLIP's
# trained logit range ±~30 is safely inside bf16, and eval paths run the
# model in fp32 anyway so benchmark numerics are unaffected). This is a
# documented deviation from torch-autocast numerics (which always runs
# softmax in fp32); set CFA_ATTENTION_PROBS_FP32=1 — read at trace time,
# so it works even when set after import — to force fp32 scores under
# bf16 compute (exact HF-forward numerics at bf16).
def _fp32_probs() -> bool:
    return os.environ.get("CFA_ATTENTION_PROBS_FP32", "0") == "1"


def _xla_attention(q, k, v, bias, scale):
    """Reference XLA attention path.

    q,k,v: [B, H, S, Dh]; bias: broadcastable to [B, H, Sq, Sk] or None.
    """
    acc = jnp.float32 if (_fp32_probs() or q.dtype == jnp.float32) \
        else q.dtype
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                        preferred_element_type=acc)
    if bias is not None:
        logits = logits + bias.astype(acc)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


# Attention memory layout (CFA_ATTN_LAYOUT, read at trace time; default
# "bshd"). Motivation: the B/32 trace shows the [B, H, S, Dh] head
# split/merge as {0,3,1,2}→{3,2,1,0} relayout copies at ~34 GB/s — 32 ms
# of a 217 ms step (perf/TRACE_ANALYSIS.md). "bshd" phrases the
# score/weighted-sum einsums directly on the [B, S, H, Dh] projection
# output (split/merge become free reshapes). Measured (perf/sweep_r3a.log):
# B/32 par (2355.3 vs 2355.5 pairs/s — XLA's layout assignment materializes
# the head-major relayout for the (b, h)-batched gemms either way), B/16
# +1.1% (1012.1 vs 1001.2). Par-or-better on both ⇒ default. "bhsd" keeps
# the torch-style explicit transposes (what the Pallas kernel path always
# uses internally); "flat" additionally folds (B, H) into one rank-3 gemm
# batch dim (_xla_attention_flat) — measured SLOWER on both models
# (B/32 2306 vs 2377, B/16 971 vs 1012; perf/sweep_r3g.log): the explicit
# transposes cost more than the layout copies they replace. Forward math
# is bit-identical across layouts (CPU-checked; grads differ at fp32
# rounding).
def _attn_layout() -> str:
    return os.environ.get("CFA_ATTN_LAYOUT", "bshd")


# Fused QKV projection (CFA_FUSED_QKV=1, read at trace time; default off).
# Concatenates the three [D, D] projection kernels into one [D, 3D] GEMM
# at trace time — params/checkpoints/TP sharding stay untouched, XLA sees
# a concat (one extra HBM pass over 3 layer-kernels per step) feeding a
# single M x 3D matmul instead of three M x D dispatches. Round 1
# measured the variant SLOWER in the stacked/flat-batch regime (605 vs
# 676 pairs/s, BASELINE.md); this re-test exists because the production
# regime changed underneath it (unstacked layers + bshd layout +
# microbatched accum) — see BASELINE.md round 5 for the verdict.
def _fused_qkv() -> bool:
    return os.environ.get("CFA_FUSED_QKV", "0") == "1"


# Pallas attention grid tuning (CFA_PALLAS_HEAD_GROUP, trace-time).
# 0 = the kernel's VMEM-budget auto choice (ops/attention.py::_prepare);
# an explicit value sets heads-per-grid-cell directly, probing whether
# the auto group (sized for the long-S bwd VMEM wall) is right at CLIP's
# short sequences (S=197/77) where many small cells vs few wide ones is
# a live trade.
def _pallas_head_group() -> int:
    return int(os.environ.get("CFA_PALLAS_HEAD_GROUP", "0"))


def _xla_attention_bshd(q, k, v, bias, scale):
    """Transpose-free attention: q,k,v [B, S, H, Dh] straight from the
    projection reshape; returns [B, Sq, H, Dh]."""
    acc = jnp.float32 if (_fp32_probs() or q.dtype == jnp.float32) \
        else q.dtype
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                        preferred_element_type=acc)
    if bias is not None:
        logits = logits + bias.astype(acc)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _xla_attention_flat(q, k, v, bias, scale):
    """Rank-3 attention: heads folded into the gemm batch dim. q,k,v
    [B, H, S, Dh] → [B·H, S, Dh] so the score / weighted-sum contractions
    are plain rank-3 batched gemms — a different HLO from the rank-4
    einsum phrasings (which XLA canonicalizes to one program,
    perf/sweep_r3a.log), probing whether the (b, h)-batch gemm layout
    assignment behind the 34 GB/s relayout copies
    (perf/TRACE_ANALYSIS.md round 3) is rank-sensitive. The bias add +
    softmax round-trip through the rank-4 view (free reshapes: B, H are
    leading contiguous dims). Returns [B, H, Sq, Dh]."""
    B, H, S, Dh = q.shape
    acc = jnp.float32 if (_fp32_probs() or q.dtype == jnp.float32) \
        else q.dtype
    qf = (q * scale).reshape(B * H, S, Dh)
    kf = k.reshape(B * H, S, Dh)
    vf = v.reshape(B * H, S, Dh)
    logits = jnp.einsum("bqd,bkd->bqk", qf, kf,
                        preferred_element_type=acc)
    if bias is not None:
        logits = (logits.reshape(B, H, S, S)
                  + bias.astype(acc)).reshape(B * H, S, S)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bqk,bkd->bqd", probs, vf).reshape(B, H, S, Dh)


def attention(layer_p, x, bias, num_heads, *, dtype, use_pallas=False,
              quant="none", seq=None):
    """Multi-head self-attention with HF CLIP parameterization.

    ``seq`` (a ``parallel.sequence.SeqParallelSpec``) marks the token dim
    as sharded over the ``model`` mesh axis; with ``seq.ring`` the scores
    are computed by the manual ring-attention collective instead of the
    partitioner's KV all-gather."""
    B, S, D = x.shape
    head_dim = D // num_heads
    scale = head_dim ** -0.5
    lin = _linear_fn(quant)

    if seq is not None and seq.ring:
        # Ring attention consumes/produces the bshd layout natively.
        from ..parallel.sequence import ring_attention

        def heads(y):
            return y.reshape(B, S, num_heads, head_dim)
        q = heads(lin(layer_p["q"], x, dtype))
        k = heads(lin(layer_p["k"], x, dtype))
        v = heads(lin(layer_p["v"], x, dtype))
        out = ring_attention(q, k, v, bias, scale, seq.mesh)
        return lin(layer_p["out"], out.reshape(B, S, D), dtype)

    if _attn_layout() == "bshd":
        def heads(y):
            return y.reshape(B, S, num_heads, head_dim)
        if _fused_qkv() and quant == "none":
            w = jnp.concatenate([layer_p[n]["kernel"] for n in "qkv"],
                                axis=1)
            b = jnp.concatenate([layer_p[n]["bias"] for n in "qkv"])
            qkv = linear({"kernel": w, "bias": b}, x, dtype)
            q, k, v = (heads(y) for y in jnp.split(qkv, 3, axis=-1))
        else:
            q = heads(lin(layer_p["q"], x, dtype))
            k = heads(lin(layer_p["k"], x, dtype))
            v = heads(lin(layer_p["v"], x, dtype))
        if use_pallas:
            from ..ops.attention import flash_attention
            out = flash_attention(q, k, v, bias, scale,
                                  head_group=_pallas_head_group(),
                                  layout="bshd")
        else:
            out = _xla_attention_bshd(q, k, v, bias, scale)
        return lin(layer_p["out"], out.reshape(B, S, D), dtype)

    def split_heads(y):
        return y.reshape(B, S, num_heads, head_dim).transpose(0, 2, 1, 3)

    q = split_heads(lin(layer_p["q"], x, dtype))
    k = split_heads(lin(layer_p["k"], x, dtype))
    v = split_heads(lin(layer_p["v"], x, dtype))

    if use_pallas:
        from ..ops.attention import flash_attention
        out = flash_attention(q, k, v, bias, scale,
                              head_group=_pallas_head_group())
    elif _attn_layout() == "flat":
        out = _xla_attention_flat(q, k, v, bias, scale)
    else:
        out = _xla_attention(q, k, v, bias, scale)

    out = out.transpose(0, 2, 1, 3).reshape(B, S, D)
    return lin(layer_p["out"], out, dtype)


def encoder(params_stacked, x, bias, num_heads, eps, *, dtype,
            use_pallas=False, remat=False, unroll=1, quant="none",
            pipeline=None, seq=None):
    """Pre-LN transformer encoder over stacked layer params via lax.scan.

    ``remat=True`` wraps the layer body in ``jax.checkpoint`` so backward
    recomputes activations layer-by-layer instead of storing them — the
    standard TPU memory/FLOPs trade that keeps big batches inside HBM
    (replaces nothing in the reference; torch keeps all activations).

    ``unroll`` is forwarded to ``lax.scan`` — unrolling the layer loop lets
    XLA overlap weight prefetch with compute across layer boundaries at the
    cost of a larger program (perf knob, identical math).

    ``pipeline`` (a ``parallel.pipeline.PipelineSpec``) runs the layer
    stack as a GPipe pipeline over the mesh's ``pipe`` axis: each stage
    holds (and applies) its ``[L/K, ...]`` slice of the stacked params;
    this function body — scan/remat/unroll and all — becomes the per-stage
    chunk. Identical math (``tests/test_pipeline.py``).

    ``seq`` (a ``parallel.sequence.SeqParallelSpec``) runs the stack
    sequence-parallel: activations constrained to ``P(data, model)`` so
    per-token math runs on S/sp tokens per chip and the partitioner (or
    the ring collective, ``seq.ring``) handles attention's cross-token
    reach. Identical math (``tests/test_sequence_parallel.py``).
    """

    lin = _linear_fn(quant)
    if seq is not None:
        from ..parallel.sequence import constrain_tokens
        x = constrain_tokens(x, seq)

    def make_body(b):
        def body(h, layer_p):
            r = h
            h = layer_norm(layer_p["ln1"], h, eps)
            h = attention(layer_p, h, b, num_heads, dtype=dtype,
                          use_pallas=use_pallas, quant=quant, seq=seq)
            h = r + h
            r = h
            h = layer_norm(layer_p["ln2"], h, eps)
            h = quick_gelu(lin(layer_p["fc1"], h, dtype))
            h = lin(layer_p["fc2"], h, dtype)
            h = r + h
            if seq is not None:
                h = constrain_tokens(h, seq)
            return h, None

        if remat:
            # remat=True → recompute everything (min memory); remat="dots"
            # → save the weight-matmul outputs (qkv/out/fc projections)
            # and recompute only elementwise/attention — ~40% less
            # backward recompute for ~2x the activation footprint.
            policy = (jax.checkpoint_policies
                      .dots_with_no_batch_dims_saveable
                      if remat == "dots" else None)
            body = jax.checkpoint(body, prevent_cse=False, policy=policy)
        return body

    if pipeline is not None:
        from ..parallel.pipeline import pipeline_encoder

        # The stage chunk is this same scan body, rebuilt around the bias
        # slice travelling with each microbatch's activations.
        def stage_fn(local_layers, h, b_mb):
            out, _ = jax.lax.scan(make_body(b_mb), h, local_layers,
                                  unroll=unroll)
            return out

        return pipeline_encoder(stage_fn, params_stacked, x, bias,
                                mesh=pipeline.mesh,
                                num_micro=pipeline.num_micro)

    body = make_body(bias)
    if isinstance(params_stacked, (list, tuple)):
        # Unstacked per-layer trees (``unstack_layers``): straight-line
        # loop — each layer's params are separate jit arguments, so grads
        # get their own output buffers (no stacked-buffer update-slices)
        # and ``unroll`` is moot.
        for layer_p in params_stacked:
            x, _ = body(x, layer_p)
        return x
    out, _ = jax.lax.scan(body, x, params_stacked, unroll=unroll)
    return out


# ---------------------------------------------------------------------------
# Towers
# ---------------------------------------------------------------------------

class TowerOutput(NamedTuple):
    last_hidden_state: jax.Array  # [B, S, D] (vision: pre post-LN, as HF)
    pooled: jax.Array             # [B, D]


def patchify(pixel_values: jax.Array, patch_size: int) -> jax.Array:
    """[B, H, W, 3] NHWC → [B, num_patches, patch_size²·3].

    Exactly equivalent to HF's stride-``patch_size`` Conv2d because patches
    don't overlap; flattening order is (row-in-patch, col-in-patch, channel),
    matched by the kernel layout produced in ``hf_import.py``.
    """
    B, H, W, C = pixel_values.shape
    p = patch_size
    x = pixel_values.reshape(B, H // p, p, W // p, p, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)           # [B, h, w, p, p, C]
    return x.reshape(B, (H // p) * (W // p), p * p * C)


def vision_tower(params: Params, pixel_values: jax.Array, cfg: VisionConfig,
                 *, dtype=jnp.float32, use_pallas=False,
                 remat=False, unroll=1, quant="none",
                 pipeline=None, seq=None) -> TowerOutput:
    """ViT image tower. ``pixel_values``: [B, H, W, 3] NHWC, normalized."""
    p = params
    x = patchify(pixel_values.astype(dtype), cfg.patch_size)
    x = _linear_fn(quant)(p["patch_embedding"], x, dtype)   # [B, N, D]
    cls = jnp.broadcast_to(p["class_embedding"].astype(dtype),
                           (x.shape[0], 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["position_embedding"].astype(dtype)[None]
    x = layer_norm(p["pre_layernorm"], x, cfg.layer_norm_eps)
    x = encoder(p["layers"], x, None, cfg.num_heads, cfg.layer_norm_eps,
                dtype=dtype, use_pallas=use_pallas, remat=remat,
                unroll=unroll, quant=quant, pipeline=pipeline, seq=seq)
    if seq is not None:
        from ..parallel.sequence import gather_tokens
        x = gather_tokens(x, seq)
    pooled = layer_norm(p["post_layernorm"], x[:, 0], cfg.layer_norm_eps)
    return TowerOutput(last_hidden_state=x, pooled=pooled)


def _text_attention_bias(input_ids, attention_mask, seq_len):
    """Causal + optional padding additive bias, fp32 [B or 1, 1, S, S]."""
    causal = jnp.triu(jnp.full((seq_len, seq_len), _NEG_INF, jnp.float32), k=1)
    bias = causal[None, None]
    if attention_mask is not None:
        pad = (1.0 - attention_mask.astype(jnp.float32)) * _NEG_INF
        bias = bias + pad[:, None, None, :]
    return bias


def text_tower(params: Params, input_ids: jax.Array, cfg: TextConfig,
               *, attention_mask: Optional[jax.Array] = None,
               dtype=jnp.float32, use_pallas=False,
               remat=False, unroll=1, quant="none",
               pipeline=None, seq=None) -> TowerOutput:
    """Text transformer tower. ``input_ids``: [B, T] int32.

    Pooling follows HF: hidden state at the **first EOS token** position.
    The trainer path passes no attention_mask, matching the reference
    (``/root/reference/finetune/finetuner.py:121`` calls
    ``model(pixel_values, input_ids)`` only); pad tokens still see the
    causal mask.
    """
    p = params
    B, T = input_ids.shape
    x = p["token_embedding"].astype(dtype)[input_ids]
    x = x + p["position_embedding"].astype(dtype)[None, :T]
    bias = _text_attention_bias(input_ids, attention_mask, T)
    x = encoder(p["layers"], x, bias, cfg.num_heads, cfg.layer_norm_eps,
                dtype=dtype, use_pallas=use_pallas, remat=remat,
                unroll=unroll, quant=quant, pipeline=pipeline, seq=seq)
    if seq is not None:
        from ..parallel.sequence import gather_tokens
        x = gather_tokens(x, seq)
    x = layer_norm(p["final_layernorm"], x, cfg.layer_norm_eps)
    eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32),
                         axis=-1)
    pooled = x[jnp.arange(B), eos_pos]
    return TowerOutput(last_hidden_state=x, pooled=pooled)


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

class CLIPOutput(NamedTuple):
    """Mirrors the HF ``CLIPOutput`` fields the reference consumes
    (``/root/reference/finetune/finetuner.py:121-142``). As in HF
    ``CLIPModel.forward`` (and unlike ``get_image_features``), the
    ``*_embeds`` fields are **L2-normalized**."""
    image_embeds: jax.Array            # [B, P] projected + L2-normalized
    text_embeds: jax.Array             # [B, P]
    logits_per_image: jax.Array        # [B, Bt]
    logits_per_text: jax.Array         # [Bt, B]
    vision_last_hidden_state: jax.Array  # [B, S_v, D_v]
    text_last_hidden_state: jax.Array    # [B, T, D_t]
    vision_pooled: jax.Array
    text_pooled: jax.Array


def encode_image(params: Params, pixel_values: jax.Array, cfg: CLIPConfig,
                 *, dtype=jnp.float32, use_pallas=False,
                 remat=False, unroll=1, quant="none",
                 pipeline=None, seq=None) -> jax.Array:
    """Projected image embedding (un-normalized), as HF ``get_image_features``
    / OpenAI ``model.encode_image`` (``count_finetuner.py:107``)."""
    out = vision_tower(params["vision"], pixel_values, cfg.vision,
                       dtype=dtype, use_pallas=use_pallas, remat=remat,
                       unroll=unroll, quant=quant, pipeline=pipeline,
                       seq=seq)
    return linear(params["visual_projection"], out.pooled, dtype)


def encode_text(params: Params, input_ids: jax.Array, cfg: CLIPConfig,
                *, attention_mask=None, dtype=jnp.float32,
                use_pallas=False, remat=False, unroll=1,
                quant="none", pipeline=None, seq=None) -> jax.Array:
    """Projected text embedding (un-normalized)."""
    out = text_tower(params["text"], input_ids, cfg.text,
                     attention_mask=attention_mask, dtype=dtype,
                     use_pallas=use_pallas, remat=remat, unroll=unroll,
                     quant=quant, pipeline=pipeline, seq=seq)
    return linear(params["text_projection"], out.pooled, dtype)


def clip_forward(params: Params, pixel_values: jax.Array,
                 input_ids: jax.Array, cfg: CLIPConfig, *,
                 attention_mask: Optional[jax.Array] = None,
                 dtype=jnp.float32, use_pallas=False,
                 remat=False, unroll=1, quant="none",
                 pipeline=None, seq=None) -> CLIPOutput:
    """Full dual-tower forward returning everything any reference loss needs
    in one pass (the reference re-encodes for some paths, e.g.
    ``count_finetuner.py:107-123``; here one forward serves all)."""
    v = vision_tower(params["vision"], pixel_values, cfg.vision,
                     dtype=dtype, use_pallas=use_pallas, remat=remat,
                     unroll=unroll, quant=quant, pipeline=pipeline,
                     seq=seq)
    t = text_tower(params["text"], input_ids, cfg.text,
                   attention_mask=attention_mask, dtype=dtype,
                   use_pallas=use_pallas, remat=remat, unroll=unroll,
                   quant=quant, pipeline=pipeline, seq=seq)
    image_embeds = linear(params["visual_projection"], v.pooled, dtype)
    text_embeds = linear(params["text_projection"], t.pooled, dtype)

    # Normalization + logits in fp32 (loss-facing).
    ie = image_embeds.astype(jnp.float32)
    te = text_embeds.astype(jnp.float32)
    ie_n = ie / jnp.linalg.norm(ie, axis=-1, keepdims=True)
    te_n = te / jnp.linalg.norm(te, axis=-1, keepdims=True)
    scale = jnp.exp(params["logit_scale"].astype(jnp.float32))
    logits_per_text = (te_n @ ie_n.T) * scale
    return CLIPOutput(
        image_embeds=ie_n,
        text_embeds=te_n,
        logits_per_image=logits_per_text.T,
        logits_per_text=logits_per_text,
        vision_last_hidden_state=v.last_hidden_state,
        text_last_hidden_state=t.last_hidden_state,
        vision_pooled=v.pooled,
        text_pooled=t.pooled,
    )


def sparc_embeddings(params: Params, out: CLIPOutput, *, dtype=jnp.float32):
    """Project both towers' full hidden sequences into the shared space —
    the SPARC input path (``/root/reference/finetune/finetuner.py:124-128``).
    Returns (v_patch_embed [B,S_v,P], l_token_embed [B,T,P])."""
    v = linear(params["visual_projection"], out.vision_last_hidden_state, dtype)
    l = linear(params["text_projection"], out.text_last_hidden_state, dtype)
    return v, l


def num_params(params: Params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))
