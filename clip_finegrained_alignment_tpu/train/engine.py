"""The single SPMD training engine.

One jitted ``train_step`` over a device mesh subsumes all three reference
trainers (``/root/reference/finetune/finetuner.py`` single-GPU,
``dist_finetuner.py`` DDP/NCCL, ``count_finetuner.py`` counting variant):
the single-device/multi-device split disappears because the same program
runs on 1 chip or a v5e-8 — only the mesh changes.

Design (TPU-first, not a translation):

* **Gradient accumulation** is a ``jax.lax.scan`` over a leading microbatch
  axis inside the step (the reference's ``global_step % accum`` bookkeeping,
  ``finetuner.py:149-154``, is host control flow it no longer needs).
* **Data parallelism** comes in two modes:
    - ``global_negatives=True``: plain ``jax.jit`` over a batch sharded on
      the ``data`` mesh axis; the contrastive loss sees the **global** batch
      and XLA inserts the embedding all-gathers over ICI (the SURVEY.md §5
      upgrade — larger negative sets).
    - ``global_negatives=False`` (parity): ``shard_map`` computes the loss
      per-device on the **local** batch — exactly the reference's DDP
      semantics where each rank's InfoNCE uses only its own 32 samples
      (``dist_finetuner.py:161-176``) — then ``pmean``s the gradients (the
      DDP backward allreduce, over ICI instead of NCCL).
* **Mixed precision**: towers run in bf16 (``PrecisionConfig``), losses and
  the optimizer in fp32. No GradScaler (bf16 needs none).
* Gradient clipping + AdamW/AdamSPD live in the optax chain
  (``optim/factory.py``); the optimizer update happens *outside* shard_map
  on replicated params, so AdamSPD's full-tensor norms need no collectives.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import CLIPConfig, TrainConfig
from ..core.precision import compute_dtype
from ..models import clip as m
from ..objectives import losses as L
from ..optim.factory import make_optimizer
from ..parallel import mesh as pmesh

Batch = Dict[str, jax.Array]


# ---------------------------------------------------------------------------
# Loss dispatch (the reference's criterion-select, finetuner.py:32-40)
# ---------------------------------------------------------------------------

def compute_loss(params, batch: Batch, cfg: TrainConfig,
                 model_cfg: CLIPConfig, *, dtype,
                 pipeline=None, seq=None,
                 pixel_bank=None) -> Tuple[jax.Array, Dict]:
    """Forward + objective for one microbatch. Returns (total_loss, loss_dict).

    Batch contract (all fixed-shape, jit-friendly):
      pixel_values [B, H, W, 3] f32 (normalized), input_ids [B, T] i32,
      optional cf_input_ids [B, N_cf, T] (counterfactual captions for
      ``loss_type='count'``, the count_finetuner path),
      optional group_input_ids [B, G, T] (grouped count captions for
      ``loss_type='clip_count'``; absent → degenerate group_size==1, the only
      shape the reference trainer ever feeds, losses.py:120-124).
    With a ``pixel_bank`` (the HBM-resident dataset cache,
    ``data/packed.py``), ``pixel_values`` is replaced by
    ``pixel_index [B] i32`` and the batch's pixels are gathered from the
    bank ON DEVICE — the host ships 4 bytes/sample instead of S·S·3.
    """
    if pixel_bank is not None:
        pixel_values = pixel_bank[batch["pixel_index"]]
    else:
        pixel_values = batch["pixel_values"]
    if pixel_values.dtype == jnp.uint8:
        # Fused on-device rescale+normalize (north-star input pipeline):
        # loaders ship compact uint8 over PCIe; the arithmetic runs on the
        # VPU inside this jitted step.
        from ..data.preprocess import normalize_batch
        pixel_values = normalize_batch(
            pixel_values.astype(jnp.float32) / 255.0)
    input_ids = batch["input_ids"]
    use_pallas = cfg.use_pallas_attention

    out = m.clip_forward(params, pixel_values, input_ids, model_cfg,
                         dtype=dtype, use_pallas=use_pallas,
                         remat=cfg.remat, unroll=cfg.unroll_layers,
                         quant=cfg.quant, pipeline=pipeline, seq=seq)

    if cfg.loss_type == "sparc":
        # Project full hidden sequences into the shared space
        # (finetuner.py:124-128); mask = tokens != pad (finetuner.py:114-116).
        v_patch, l_token = m.sparc_embeddings(params, out, dtype=dtype)
        mask = (input_ids != model_cfg.text.pad_token_id)
        losses = L.sparc_loss(
            v_patch, l_token, mask,
            similarity_threshold=cfg.similarity_threshold,
            global_loss_weight=cfg.global_loss_weight,
            local_loss_weight=cfg.local_loss_weight,
            inverse_temperature=cfg.inverse_temperature,
            use_fused=cfg.use_fused_sparc)
    elif cfg.loss_type == "count":
        # Counterfactual CountLoss (count_finetuner.py:107-131): the
        # reference encodes each sample's 9 cf captions in a Python loop
        # (:110-114); here it is one [B*N_cf] batched text forward.
        cf = batch["cf_input_ids"]
        B, N, T = cf.shape
        ek_cf = m.encode_text(params, cf.reshape(B * N, T), model_cfg,
                              dtype=dtype, use_pallas=use_pallas,
                              remat=cfg.remat, unroll=cfg.unroll_layers,
                              quant=cfg.quant, pipeline=pipeline,
                              seq=seq).reshape(B, N, -1)
        losses = L.count_loss(
            out.logits_per_image, out.logits_per_text,
            out.image_embeds, out.text_embeds, ek_cf,
            alpha=cfg.count_alpha)
    elif cfg.loss_type == "clip_count":
        group = batch.get("group_input_ids")
        if group is not None:
            B, G, T = group.shape
            ek = m.encode_text(params, group.reshape(B * G, T), model_cfg,
                               dtype=dtype, use_pallas=use_pallas,
                               remat=cfg.remat, unroll=cfg.unroll_layers,
                               quant=cfg.quant, pipeline=pipeline,
                               seq=seq).reshape(B, G, -1)
        else:
            ek = None
        losses = L.clip_count_loss(out.image_embeds, out.text_embeds, ek,
                                   count_alpha=cfg.count_alpha)
    else:  # "clip"
        losses = L.clip_loss(out.image_embeds, out.text_embeds)

    return losses["total_loss"], losses


# ---------------------------------------------------------------------------
# Train step factory
# ---------------------------------------------------------------------------

def _accumulated_grads(params, batch: Batch, cfg: TrainConfig,
                       model_cfg: CLIPConfig, dtype, vary_axis=None,
                       pipeline=None, seq=None, pixel_bank=None):
    """Scan over the leading accumulation axis; returns (grads, loss_dict)
    averaged over microbatches (≡ reference's loss/accum scaling,
    finetuner.py:145). ``vary_axis``: when called inside shard_map, the mesh
    axis to mark the zero-initialized scan carry as varying over (the new
    shard_map type system distinguishes device-invariant from
    device-varying values)."""
    grad_fn = jax.value_and_grad(
        lambda p, mb: compute_loss(p, mb, cfg, model_cfg, dtype=dtype,
                                   pipeline=pipeline, seq=seq,
                                   pixel_bank=pixel_bank),
        has_aux=True)

    accum = jax.tree.leaves(batch)[0].shape[0]

    def body(carry, mb):
        g_acc, l_acc = carry
        (_, losses), grads = grad_fn(params, mb)
        g_acc = jax.tree.map(jnp.add, g_acc, grads)
        l_acc = jax.tree.map(jnp.add, l_acc, losses)
        return (g_acc, l_acc), None

    g0 = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
    # Trace one microbatch shape to get the loss-dict structure.
    l0 = jax.eval_shape(
        lambda p, mb: grad_fn(p, mb)[0][1],
        params, jax.tree.map(lambda x: x[0], batch))
    l0 = jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.float32), l0)

    if vary_axis is not None:
        g0 = jax.tree.map(lambda x: jax.lax.pcast(x, vary_axis, to='varying'), g0)
        l0 = jax.tree.map(lambda x: jax.lax.pcast(x, vary_axis, to='varying'), l0)

    (grads, losses), _ = jax.lax.scan(
        body, (g0, l0), batch, length=accum,
        unroll=min(cfg.unroll_accum, accum))
    inv = 1.0 / accum
    grads = jax.tree.map(lambda g: g * inv, grads)
    losses = jax.tree.map(lambda l: l * inv, losses)
    return grads, losses


def make_train_step(cfg: TrainConfig, model_cfg: CLIPConfig,
                    optimizer: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None,
                    opt_shardings=None, param_shardings=None,
                    pixel_bank=None) -> Callable:
    """Build the jitted ``train_step(params, opt_state, batch)``.

    ``batch`` leaves are [accum, B, ...] where B is the **global** batch; on a
    mesh, B is sharded over the ``data`` axis. ``opt_shardings``: optional
    NamedSharding pytree for the optimizer state (the ZeRO-1 layout,
    ``parallel/sharding_rules.py::zero1_opt_shardings``); None = replicated.
    ``param_shardings``: optional NamedSharding pytree pinning the param
    layout across steps (the FSDP layout,
    ``sharding_rules.py::fsdp_param_shardings``); None = replicated
    (or caller-placed for TP/PP).

    ``pixel_bank``: optional uint8 ``[N, S, S, 3]`` HBM-resident dataset
    cache (``data/packed.py``). When set, batches carry
    ``pixel_index [accum, B] i32`` instead of ``pixel_values`` and the
    step gathers its pixels from the bank on device — per-step host →
    device traffic drops from S·S·3 to 4 bytes per sample (the fix for
    ingest-bandwidth-bound hosts; BASELINE.md packed-ingest rehearsal).
    The bank is an ordinary (non-donated) operand of the jitted step,
    replicated over the mesh; it is NOT closed over, so it is never baked
    into the executable as a constant.
    """
    dtype = compute_dtype(cfg)
    use_bank = pixel_bank is not None
    if use_bank:
        bank_arr = pixel_bank if isinstance(pixel_bank, jax.Array) \
            else jnp.asarray(np.ascontiguousarray(pixel_bank))

    tp = mesh.shape.get(pmesh.MODEL_AXIS, 1) if mesh is not None else 1
    pp = mesh.shape.get(pmesh.PIPE_AXIS, 1) if mesh is not None else 1
    pipeline = None
    if pp > 1:
        from ..parallel.pipeline import PipelineSpec, default_num_micro
        if not cfg.global_negatives:
            raise ValueError(
                "pipeline parallelism (mesh.pipe > 1) requires "
                "global_negatives=True: the DDP-parity shard_map path "
                "assumes replicated params")
        if tp > 1 and cfg.sequence_parallel:
            raise ValueError("sequence parallelism composed with pipeline "
                             "parallelism is not supported")
        # tp > 1 without sequence_parallel composes: the pipeline
        # shard_map is manual only over ``pipe`` (parallel/pipeline.py),
        # so the Megatron weight-dim shardings on the ``model`` axis stay
        # in auto mode and GSPMD partitions the per-stage layer math
        # exactly as it does unpipelined (the composed layout is
        # sharding_rules.py::composed_param_specs; pinned vs the
        # single-device oracle in tests/test_pipeline.py).
        if cfg.unstack_layers:
            raise ValueError("pipeline parallelism requires the stacked "
                             "layer layout (unstack_layers=False): stages "
                             "are shards of the stacked [L, ...] leaves")
        pipeline = PipelineSpec(
            mesh=mesh,
            num_micro=default_num_micro(pp, cfg.pipeline_microbatches))

    seq = None
    if cfg.sequence_parallel and mesh is not None:
        # Context parallelism (parallel/sequence.py): the ``model`` axis
        # shards the token dim of activations; params stay replicated
        # over it (the Trainer skips the Megatron layout). With no mesh
        # the config degenerates to the ordinary single-device step (the
        # oracle the SP tests pin against).
        from ..parallel.sequence import SeqParallelSpec
        if tp <= 1:
            raise ValueError(
                "sequence_parallel needs mesh.model > 1 (the model axis "
                "is the sequence axis)")
        if not cfg.global_negatives:
            raise ValueError(
                "sequence parallelism requires global_negatives=True: "
                "the DDP-parity shard_map path assumes replicated "
                "single-device math")
        if pp > 1:
            raise ValueError("sequence parallelism composed with pipeline "
                             "parallelism is not supported")
        if cfg.use_pallas_attention:
            raise ValueError("sequence parallelism and the Pallas "
                             "attention kernels are mutually exclusive "
                             "(GSPMD cannot partition the custom call "
                             "over the token dim; use sp_ring instead)")
        seq = SeqParallelSpec(mesh=mesh, ring=cfg.sp_ring)

    if cfg.fsdp:
        if not cfg.global_negatives:
            raise ValueError(
                "fsdp requires global_negatives=True: the DDP-parity "
                "shard_map path assumes replicated params")
        if cfg.zero1:
            raise ValueError("fsdp subsumes zero1 (optimizer state "
                             "inherits the data-sharded param layout); "
                             "enable only one")
        if cfg.unstack_layers:
            raise ValueError("fsdp requires the stacked layer layout "
                             "(unstack_layers=False)")

    if cfg.grad_cache:
        # GradCache (train/gradcache.py): one loss over the FULL
        # batch x accum effective batch at one-chunk activation memory.
        # Replaces the accumulation scan's mean-of-chunk-losses with the
        # full-pool objective; rejects parity/PP/SP compositions.
        from .gradcache import gradcache_grads, validate_gradcache
        validate_gradcache(cfg, mesh)

        def grads_and_metrics(params, batch, bank=None):
            return gradcache_grads(params, batch, cfg, model_cfg, dtype,
                                   pixel_bank=bank)
    else:
        def grads_and_metrics(params, batch, bank=None):
            return _accumulated_grads(params, batch, cfg, model_cfg, dtype,
                                      pipeline=pipeline, seq=seq,
                                      pixel_bank=bank)

    if mesh is not None and not cfg.global_negatives:
        if tp > 1:
            raise ValueError(
                "tensor parallelism (mesh.model > 1) requires "
                "global_negatives=True: the DDP-parity shard_map path "
                "assumes replicated params")
        # Parity mode: per-device local-batch loss + gradient pmean — the
        # exact DDP semantics (dist_finetuner.py:57 allreduce; local
        # negatives :161-176).
        batch_spec = P(None, pmesh.DATA_AXIS)

        def sharded_grads(params, batch, bank=None):
            # Mark the replicated params device-VARYING before
            # differentiating: each device then owns a true replica (the
            # DDP picture) and AD yields per-device *local* grads, making
            # the pmean below a genuine allreduce-average
            # (dist_finetuner.py:57). Differentiating wrt the *invariant*
            # params instead would let shard_map's AD insert an implicit
            # psum (transpose of the pvary broadcast), after which pmean
            # is an identity on the cross-device SUM — training with
            # grads n_devices x too large. Pinned against a per-shard
            # oracle in tests/test_train_engine.py and __graft_entry__.py.
            params = jax.tree.map(
                lambda p: jax.lax.pcast(p, pmesh.DATA_AXIS, to='varying'), params)
            grads, losses = _accumulated_grads(params, batch, cfg,
                                               model_cfg, dtype,
                                               vary_axis=pmesh.DATA_AXIS,
                                               pixel_bank=bank)
            grads = jax.lax.pmean(grads, pmesh.DATA_AXIS)
            losses = jax.lax.pmean(losses, pmesh.DATA_AXIS)
            return grads, losses

        if use_bank:
            # The bank stays replicated (in_spec P()); per-shard batches
            # carry GLOBAL indices, each device gathers its own rows.
            grads_and_metrics = shard_map(
                sharded_grads, mesh=mesh,
                in_specs=(P(), batch_spec, P()),
                out_specs=(P(), P()))
        else:
            _sg = shard_map(
                lambda p, b: sharded_grads(p, b), mesh=mesh,
                in_specs=(P(), batch_spec),
                out_specs=(P(), P()))

            def grads_and_metrics(params, batch, bank=None):
                return _sg(params, batch)

    def train_step(params, opt_state, batch, bank=None):
        grads, losses = grads_and_metrics(params, batch, bank)
        gnorm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(losses)
        metrics["grad_norm"] = gnorm
        return params, opt_state, metrics

    def _finish(jitted, bank_on_mesh=None):
        """Bind the (device-put) bank as a fixed trailing operand so every
        existing call site keeps the (params, opt_state, batch) shape."""
        if not use_bank:
            return jitted
        bank_dev = bank_arr if bank_on_mesh is None \
            else jax.device_put(bank_arr, bank_on_mesh)
        return lambda params, opt_state, batch: jitted(
            params, opt_state, batch, bank_dev)

    if mesh is not None:
        bsh = pmesh.batch_sharding(mesh, accum_axis=True)
        repl = pmesh.replicated(mesh)
        bank_sh = repl if use_bank else None
        if tp > 1 or pp > 1:
            # TP/PP: params/opt_state keep whatever layout the caller
            # placed them with (parallel/sharding_rules.py Megatron specs,
            # or parallel/pipeline.py stage-sharded [L, ...] leaves);
            # in_shardings=None ⇒ follow the argument placements and let
            # the partitioner insert the ICI collectives. With ZeRO-1 the
            # opt-state layout is pinned explicitly so donation can't
            # silently re-replicate it. (Steady-state layouts across steps
            # are checked in tests: the partitioner propagates the input
            # placements to the updated params/opt-state outputs.)
            return _finish(jax.jit(
                train_step,
                in_shardings=(param_shardings, opt_shardings, bsh)
                + ((bank_sh,) if use_bank else ()),
                out_shardings=(param_shardings, opt_shardings, None)
                if (opt_shardings is not None
                    or param_shardings is not None) else None,
                donate_argnums=(0, 1)), bank_on_mesh=bank_sh)
        # FSDP passes BOTH pytrees (the opt layout is derived from the
        # actual state leaves in Trainer, since optax states inherit the
        # fsdp param placement at init); ZeRO-1 passes opt_shardings only.
        psh = param_shardings if param_shardings is not None else repl
        osh = opt_shardings if opt_shardings is not None else repl
        return _finish(jax.jit(
            train_step,
            in_shardings=(psh, osh, bsh)
            + ((bank_sh,) if use_bank else ()),
            out_shardings=(psh, osh, repl),
            donate_argnums=(0, 1)), bank_on_mesh=bank_sh)
    return _finish(jax.jit(train_step, donate_argnums=(0, 1)))


def _map_param_trees(fn, tree):
    """Apply ``fn`` to every params-shaped subtree inside an optax state
    (mu/nu/nu_max/anchor in AdamSPDState are all params-like). Used to keep
    checkpoints in the canonical stacked-layers format regardless of the
    runtime layout (``TrainConfig.unstack_layers``)."""
    def is_param_tree(x):
        return isinstance(x, dict) and "vision" in x and "text" in x
    return jax.tree.map(lambda x: fn(x) if is_param_tree(x) else x,
                        tree, is_leaf=is_param_tree)


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------

class Trainer:
    """Epoch-loop engine with best/periodic checkpointing — the role of
    ``CLIPFineTuner.train`` (``finetuner.py:191-223``), mesh-aware from the
    start so it equally replaces ``DistributedCLIPFineTuner``."""

    def __init__(self, cfg: TrainConfig, params=None,
                 mesh: Optional[Mesh] = None,
                 checkpoint_manager=None, pixel_bank=None):
        self.cfg = cfg
        self.model_cfg = cfg.model_config()
        self.mesh = mesh if mesh is not None else pmesh.make_mesh(cfg.mesh) \
            if cfg.mesh.num_devices > 1 else None

        if params is None:
            params = m.init_clip_params(jax.random.key(cfg.seed),
                                        self.model_cfg)
        # Lay params out on the mesh first so everything derived from
        # them (anchor deepcopy, optimizer zeros) inherits the layout.
        if self.mesh is None:
            self.params = params
        elif cfg.mesh.model > 1 and not cfg.sequence_parallel:
            from ..parallel.sharding_rules import (shard_params,
                                                   shard_params_composed,
                                                   validate_tp_divisibility)
            validate_tp_divisibility(params, self.mesh)
            if cfg.mesh.pipe > 1:
                # Composed TP x PP: Megatron weight dims over ``model``
                # AND the stacked layer dim over ``pipe``
                # (sharding_rules.py::composed_param_specs).
                from ..parallel.pipeline import validate_pipe_divisibility
                validate_pipe_divisibility(self.model_cfg, cfg.mesh,
                                           cfg.batch_size,
                                           cfg.pipeline_microbatches)
                self.params = shard_params_composed(params, self.mesh)
            else:
                self.params = shard_params(params, self.mesh)
        elif cfg.mesh.pipe > 1:
            from ..parallel.pipeline import (shard_params_pipeline,
                                             validate_pipe_divisibility)
            validate_pipe_divisibility(self.model_cfg, cfg.mesh,
                                       cfg.batch_size,
                                       cfg.pipeline_microbatches)
            self.params = shard_params_pipeline(params, self.mesh)
        else:
            self.params = pmesh.replicate(params, self.mesh)
        self._param_shardings = None
        if cfg.fsdp and self.mesh is not None \
                and self.mesh.shape.get(pmesh.DATA_AXIS, 1) > 1:
            # FSDP/ZeRO-3: re-lay params data-axis-sharded (on top of any
            # TP/PP base layout — the specs compose,
            # sharding_rules.py::fsdp_param_specs); the anchor deepcopy
            # and optimizer zeros below inherit it, which IS the ZeRO-3
            # state picture.
            from ..parallel.sharding_rules import fsdp_param_shardings
            self._param_shardings = fsdp_param_shardings(
                params, self.mesh,
                megatron_base=not cfg.sequence_parallel)
            self.params = jax.tree.map(jax.device_put, self.params,
                                       self._param_shardings)
        if cfg.unstack_layers:
            if cfg.mesh.model > 1 and not cfg.sequence_parallel:
                raise ValueError("unstack_layers is not supported with "
                                 "tensor parallelism (mesh.model > 1)")
            # Perf layout (models/clip.py::unstack_layers): per-layer jit
            # arguments; anchors/optimizer state built below inherit it.
            self.params = m.unstack_layers(self.params)
        # AdamSPD anchors = the pretrained weights at construction time
        # (the deepcopy at finetuner.py:86).
        anchor = jax.tree.map(jnp.copy, self.params) \
            if cfg.optimizer_type == "adamspd" else None
        self.optimizer = make_optimizer(cfg, self.params,
                                        anchor_params=anchor)
        # optax init is zeros_like/copies of params ⇒ optimizer state
        # inherits the param shardings.
        self.opt_state = self.optimizer.init(self.params)
        self._opt_shardings = None
        if cfg.zero1 and self.mesh is not None \
                and self.mesh.shape.get(pmesh.DATA_AXIS, 1) > 1:
            # ZeRO-1: re-lay the optimizer state sharded over the data
            # axis (upgrade over the reference's per-rank full Adam copy,
            # dist_finetuner.py:57; AdamSPD quadruples that state).
            from ..parallel.sharding_rules import zero1_opt_shardings
            self._opt_shardings = zero1_opt_shardings(
                self.opt_state, self.mesh,
                megatron_base=not cfg.sequence_parallel)
            self.opt_state = jax.tree.map(jax.device_put, self.opt_state,
                                          self._opt_shardings)
        elif self._param_shardings is not None:
            # FSDP: the state layout is the same data-axis rule the params
            # got (optax states are params-shaped), pinned explicitly so
            # donation across steps can't silently re-replicate it — and
            # so optax-internal scalars (e.g. ``count``, created on the
            # default device by init) land on the mesh.
            from ..parallel.sharding_rules import zero1_opt_shardings
            self._opt_shardings = zero1_opt_shardings(
                self.opt_state, self.mesh,
                megatron_base=not cfg.sequence_parallel)
            self.opt_state = jax.tree.map(jax.device_put, self.opt_state,
                                          self._opt_shardings)
        self.train_step = make_train_step(
            cfg, self.model_cfg, self.optimizer, self.mesh,
            opt_shardings=self._opt_shardings,
            param_shardings=self._param_shardings,
            pixel_bank=pixel_bank)
        self.global_step = 0
        self.best_loss = float("inf")
        self.preempt_requested = False
        self.checkpoint_manager = checkpoint_manager

    # ------------------------------------------------------------------
    def _device_batch(self, batch: Dict[str, np.ndarray]) -> Batch:
        """Host batch [accum*B, ...] → device [accum, B, ...], sharded."""
        a = self.cfg.gradient_accumulation_steps

        def fold(x):
            x = np.asarray(x)
            return x.reshape((a, x.shape[0] // a) + x.shape[1:])

        batch = {k: fold(v) for k, v in batch.items()}
        if self.mesh is not None:
            batch = pmesh.shard_batch(batch, self.mesh, accum_axis=True)
        return batch

    # ------------------------------------------------------------------
    # Checkpoint-format conversion: checkpoints always store the stacked
    # layout so they are interchangeable across the unstack_layers knob
    # (and readable by the eval CLIs, which build stacked `like` trees).
    def to_checkpoint_format(self):
        """(params, opt_state) in the canonical stacked-layers layout."""
        if not self.cfg.unstack_layers:
            return self.params, self.opt_state
        return (m.stack_layers(self.params),
                _map_param_trees(m.stack_layers, self.opt_state))

    def from_checkpoint_format(self, params, opt_state) -> None:
        """Install restored (stacked-layout) state as the runtime layout."""
        if self.cfg.unstack_layers:
            params = m.unstack_layers(params)
            opt_state = _map_param_trees(m.unstack_layers, opt_state)
        if self._param_shardings is not None:
            # FSDP runtime layout: restored params go back onto the
            # data-sharded placement the jitted step expects.
            params = jax.tree.map(jax.device_put, params,
                                  self._param_shardings)
        if self._opt_shardings is not None:
            # ZeRO-1/FSDP runtime layout: restored state (whatever layout
            # the checkpoint was written/read with) goes back onto the
            # data-sharded placement the jitted step expects.
            opt_state = jax.tree.map(jax.device_put, opt_state,
                                     self._opt_shardings)
        if self.mesh is not None:
            # TP/PP (and replicated-mesh) layouts have no explicit
            # sharding pytrees — the jitted step relies on the arrays'
            # own placements. Restored leaves come back COMMITTED to
            # wherever orbax put them (optax scalars like ``count`` land
            # committed on device 0, where eager ``init`` created their
            # uncommitted ``like``), which then conflicts with the
            # mesh-placed params inside jit. Re-place every leaf onto the
            # live runtime placement: mesh layouts are kept, anything
            # single-device goes mesh-replicated.
            def _reland(x, cur):
                sh = getattr(cur, "sharding", None)
                if sh is None or len(sh.device_set) \
                        < int(self.mesh.devices.size):
                    sh = pmesh.replicated(self.mesh)
                return jax.device_put(x, sh)

            if self._param_shardings is None:
                params = jax.tree.map(_reland, params, self.params)
            if self._opt_shardings is None:
                opt_state = jax.tree.map(_reland, opt_state,
                                         self.opt_state)
        self.params, self.opt_state = params, opt_state

    def step(self, batch: Dict[str, np.ndarray]) -> Dict[str, float]:
        """One optimizer step on one [accum*B] host batch."""
        dev_batch = self._device_batch(batch)
        self.params, self.opt_state, metrics = self.train_step(
            self.params, self.opt_state, dev_batch)
        self.global_step += 1
        return metrics

    def request_preempt(self) -> None:
        """Ask the training loop to stop at the next step boundary and
        write an emergency checkpoint (async-signal-safe: sets a flag).

        The reference has no preemption story at all — a SIGTERM'd run
        loses everything since its last epoch-end save and recovery is
        a manual ``--resume`` (SURVEY §5 "recovery is manual"). TPU
        pods get maintenance-event preemptions routinely, so the engine
        treats it as a first-class event: ``train`` finishes the
        in-flight step, saves ``<ckpt>/preempt``, and returns with
        ``preempted=True``. ``install_preemption_handler`` wires this
        to SIGTERM."""
        self.preempt_requested = True

    def _save_preempt(self, epoch: int, avg_loss: float) -> None:
        if self.checkpoint_manager is None:
            return
        ck_params, ck_opt = self.to_checkpoint_format()
        self.checkpoint_manager.save_preempt(
            epoch=epoch, params=ck_params, opt_state=ck_opt,
            global_step=self.global_step, best_loss=self.best_loss,
            avg_loss=avg_loss, config=self.cfg)

    def train(self, batches: Callable[[int], Iterable[Dict[str, np.ndarray]]],
              num_epochs: int, start_epoch: int = 0,
              log_fn: Optional[Callable[[str], None]] = print
              ) -> Dict[str, Any]:
        """``batches(epoch)`` yields host batches of ``effective_batch_size``.

        Checkpoint policy mirrors the reference: save ``best`` on new
        best epoch-avg loss (finetuner.py:215-218) and periodic every
        ``save_every`` epochs (:220-223 hardcodes 5; we honor the config
        field the reference defines but ignores). A pending
        ``request_preempt`` is honored at the next step boundary: one
        emergency save to ``preempt/``, then return with
        ``preempted=True`` (resume is step-exact — the CLI skips the
        completed steps of the interrupted epoch)."""
        history = []
        for epoch in range(start_epoch, num_epochs):
            t0 = time.perf_counter()
            # The epoch loss total stays ON DEVICE: fetching the loss
            # every step (`float(...)`) costs one full host round-trip
            # per step, which serializes the device behind the host/
            # tunnel latency — measured 177 pairs/s vs the 1012 device
            # rate through the remote tunnel (BASELINE.md packed-ingest
            # rehearsal). Steps enqueue back-to-back; the host syncs
            # only at `log_every` boundaries, preemption, and epoch end.
            total, count = None, 0
            for batch in batches(epoch):
                metrics = self.step(batch)
                loss = metrics["total_loss"]
                total = loss if total is None else total + loss
                count += 1
                if log_fn and count % max(1, self.cfg.log_every) == 0:
                    log_fn(f"epoch {epoch} step {self.global_step} "
                           f"loss {float(metrics['total_loss']):.4f} "
                           f"gnorm {float(metrics['grad_norm']):.3f}")
                if self.preempt_requested:
                    avg = float(total) / max(count, 1)
                    self._save_preempt(epoch, avg)
                    if log_fn:
                        log_fn(f"preempted at epoch {epoch} step "
                               f"{self.global_step}: emergency "
                               f"checkpoint saved")
                    return {"history": history,
                            "best_loss": self.best_loss,
                            "global_step": self.global_step,
                            "preempted": True}
            avg = float(total) / max(count, 1) if count else 0.0
            dt = time.perf_counter() - t0
            pairs = count * self.cfg.effective_batch_size
            history.append({"epoch": epoch, "avg_loss": avg,
                            "seconds": dt,
                            "pairs_per_sec": pairs / dt if dt > 0 else 0.0})
            if log_fn:
                log_fn(f"epoch {epoch} avg_loss {avg:.4f} "
                       f"({pairs / dt:.1f} pairs/s)" if dt > 0 else
                       f"epoch {epoch} avg_loss {avg:.4f}")

            is_best = avg < self.best_loss
            if is_best:
                self.best_loss = avg
            if self.checkpoint_manager is not None:
                ck_params, ck_opt = self.to_checkpoint_format()
                self.checkpoint_manager.save(
                    epoch=epoch, params=ck_params,
                    opt_state=ck_opt, global_step=self.global_step,
                    best_loss=self.best_loss, avg_loss=avg, is_best=is_best,
                    config=self.cfg)
        return {"history": history, "best_loss": self.best_loss,
                "global_step": self.global_step, "preempted": False}


def install_preemption_handler(trainer: "Trainer",
                               signals=None) -> None:
    """Route SIGTERM (the cluster/TPU-maintenance kill signal) to
    ``trainer.request_preempt()`` so a preempted run checkpoints and
    exits cleanly instead of dying mid-step. Chain-calls any previously
    installed handler. Main-thread only (CPython signal rule)."""
    import signal as _signal
    if signals is None:
        signals = (_signal.SIGTERM,)
    for sig in signals:
        prev = _signal.getsignal(sig)

        def handler(signum, frame, _prev=prev):
            trainer.request_preempt()
            if callable(_prev) and _prev not in (
                    _signal.SIG_IGN, _signal.SIG_DFL):
                _prev(signum, frame)

        _signal.signal(sig, handler)
