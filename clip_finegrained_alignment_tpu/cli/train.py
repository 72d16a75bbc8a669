"""Training CLI — one entry point replacing all three reference mains
(``finetune/finetuner.py:276-344``, ``finetune/dist_finetuner.py:349-417``,
``finetune/count_finetuner.py:237-276``): the loss/optimizer switch picks
the behavior, the mesh picks the scale (1 chip or a pod slice — no
torchrun/NCCL split; multi-host just runs this same script per host after
``jax.distributed.initialize``).

Example::

    python -m clip_finegrained_alignment_tpu.cli.train \
        --annotations data/synthetic/synthetic_annotations.json \
        --loss-type sparc --optimizer adamspd --epochs 10 \
        --experiment-name sparc_spd_b32
"""

from __future__ import annotations

import argparse
import os
import warnings

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    # Reference flag surface (finetuner.py:277-288 + count_finetuner
    # :239-247), unified.
    p.add_argument("--annotations", default=None,
                   help="synthetic_annotations.json path")
    p.add_argument("--packed", default=None, metavar="DIR",
                   help="packed dataset directory (cli.pack_dataset) "
                        "instead of --annotations: decode-free ingest — "
                        "one memcpy per batch instead of per-sample image "
                        "decode (data/packed.py; the reference re-decodes "
                        "every epoch, finetuner.py:334)")
    p.add_argument("--device-data", action="store_true",
                   help="with --packed: place the whole uint8 pixel array "
                        "in device HBM once and gather batches by index "
                        "ON DEVICE — per-step host→device traffic drops "
                        "from S*S*3 to 4 bytes/sample (for "
                        "ingest-bandwidth-bound hosts; needs the pack to "
                        "fit HBM alongside the model, e.g. 50k 224px "
                        "samples = 7.5 GB)")
    p.add_argument("--model", default="ViT-B/32",
                   help="ViT-B/32 | ViT-B/16 | ViT-L/14 | tiny")
    p.add_argument("--loss-type", default="sparc",
                   choices=["clip", "sparc", "count", "clip_count"])
    p.add_argument("--optimizer", default="adamw",
                   choices=["adamw", "adamspd"])
    p.add_argument("--amsgrad", action="store_true",
                   help="amsgrad moment maxima for AdamSPD "
                        "(optimizers.py:131-135; config.py:27)")
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--grad-accum", type=int, default=4)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--weight-decay", type=float, default=0.1)
    p.add_argument("--count-alpha", type=float, default=1.0)
    p.add_argument("--inverse-temperature", type=float, default=0.07)
    p.add_argument("--similarity-threshold", type=float, default=0.5)
    p.add_argument("--experiment-name", default="clip_finetune")
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--resume", nargs="?", const=True, default=False,
                   metavar="STEP_DIR",
                   help="resume from the best checkpoint if present, or "
                        "from an explicit orbax step directory (the "
                        "reference's --resume <path> semantics, "
                        "finetuner.py:286,339-342)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--save-every", type=int, default=5)
    p.add_argument("--log-every", type=int, default=10,
                   help="print a loss line every N optimizer steps")
    # TPU-native knobs.
    p.add_argument("--no-amp", action="store_true",
                   help="full fp32 (use_amp=False)")
    p.add_argument("--pallas", action="store_true",
                   help="fused Pallas attention + SPARC kernels")
    p.add_argument("--fused-sparc", action="store_true",
                   help="fused SPARC fwd+bwd Pallas kernels only (the "
                        "measured winner; XLA attention stays — "
                        "BASELINE.md round 2)")
    p.add_argument("--unroll-layers", type=int, default=1,
                   help="lax.scan unroll for the encoder layers "
                        "(12 measured fastest on v5e; identical math)")
    p.add_argument("--unroll-accum", type=int, default=1,
                   help="lax.scan unroll for the grad-accumulation loop")
    p.add_argument("--unstack-layers", action="store_true",
                   help="per-layer param leaves instead of the scan-stacked "
                        "layout (perf knob, identical math; checkpoints "
                        "stay stacked)")
    p.add_argument("--remat", default="dots",
                   choices=["0", "1", "dots"],
                   help="rematerialization policy (0 = store activations "
                        "— fastest when the batch fits HBM)")
    p.add_argument("--global-negatives", action="store_true",
                   help="contrastive loss over the global batch "
                        "(all-gather over ICI) instead of DDP-parity "
                        "local negatives")
    p.add_argument("--grad-cache", action="store_true",
                   help="GradCache: ONE contrastive loss over the full "
                        "batch-size x grad-accum effective batch at "
                        "one-chunk activation memory (embed -> loss on "
                        "the cache -> chunked re-forward VJP; "
                        "train/gradcache.py). clip/sparc losses only")
    p.add_argument("--zero1", action="store_true",
                   help="shard optimizer state (AdamSPD mu/nu/anchors) "
                        "over the data axis, ZeRO-1 style — ~1/n_devices "
                        "optimizer memory per chip, identical math")
    p.add_argument("--fsdp", action="store_true",
                   help="shard PARAMS over the data axis, FSDP/ZeRO-3 "
                        "style — params AND optimizer state drop "
                        "~1/n_devices per chip; GSPMD inserts the "
                        "per-use weight all-gather + gradient "
                        "reduce-scatter over ICI. Subsumes --zero1; "
                        "requires --global-negatives; identical math")
    p.add_argument("--model-parallel", type=int, default=1,
                   help="Megatron-style tensor-parallel degree (the "
                        "'model' mesh axis; devices = data x model). "
                        "Requires --global-negatives; composes with "
                        "--zero1 and --pipeline-parallel (3D "
                        "DP x TP x PP). For models whose AdamSPD state "
                        "overflows one chip's HBM (ViT-L/14: 8.6 GB) — "
                        "see BASELINE.md 'ViT-L/14 scaling story'")
    p.add_argument("--pipeline-parallel", type=int, default=1,
                   help="GPipe pipeline-parallel degree (the 'pipe' mesh "
                        "axis; devices = data x model x pipe). Encoder "
                        "layers stage-shard over it (params, grads AND "
                        "optimizer state scale 1/K per stage — "
                        "parallel/pipeline.py). Requires "
                        "--global-negatives and the stacked layer layout; "
                        "must divide both towers' layer counts; composes "
                        "with --model-parallel (3D DP x TP x PP)")
    p.add_argument("--pipeline-microbatches", type=int, default=0,
                   help="GPipe microbatches per train microbatch "
                        "(0 = auto: 2x the stage count). Must divide "
                        "--batch-size")
    p.add_argument("--sequence-parallel", type=int, default=1,
                   help="context-parallel degree (reuses the 'model' mesh "
                        "axis for the TOKEN dim of activations; params "
                        "stay replicated over it — parallel/sequence.py). "
                        "Long-context insurance for variants past "
                        "ViT-L/14@336's 577 tokens; identical math. "
                        "Requires --global-negatives; mutually exclusive "
                        "with --model-parallel/--pipeline-parallel; "
                        "composes with --zero1/--fsdp")
    p.add_argument("--sp-ring", action="store_true",
                   help="with --sequence-parallel: manual ring attention "
                        "(single-hop ppermute'd KV rotation + online "
                        "softmax, comm overlapped with compute) instead "
                        "of the partitioner's KV all-gather")
    p.add_argument("--quant", default="none",
                   choices=["none", "switchback", "int8"],
                   help="dynamic-int8 MXU path for the encoder projection "
                        "GEMMs (2x bf16 peak on v5e; ops/quant.py). "
                        "switchback = int8 fwd+dgrad, exact wgrad "
                        "(arXiv:2304.13013); int8 = all three matmuls. "
                        "Bounded numerics change — not a parity mode")
    p.add_argument("--pretrained", default=None,
                   help="HF model name or reference .pt checkpoint to "
                        "initialize from (default: random init when "
                        "offline)")
    p.add_argument("--import-optimizer-state", action="store_true",
                   help="with --pretrained <reference .pt>: also restore "
                        "the torch optimizer state (AdamSPD or AdamW per "
                        "--optimizer: Adam moments, step count, SPD "
                        "anchors) and global_step — a "
                        "TRUE mid-run migration of a reference fine-tune. "
                        "Without it the moments reset and SPD re-anchors "
                        "at the mid-run weights (a silent semantics "
                        "change; optim/interop.py)")
    p.add_argument("--bpe-path", default=None,
                   help="CLIP BPE vocab (bpe_simple_vocab_16e6.txt.gz or "
                        "an HF tokenizer dir). Required unless "
                        "$CLIP_BPE_PATH is set or "
                        "CFA_ALLOW_HASH_TOKENIZER=1 opts into the "
                        "hermetic hash tokenizer")
    p.add_argument("--eval-every-epoch", action="store_true",
                   help="run the counting batch-eval after each epoch "
                        "(count_finetuner.py:153-168 behavior)")
    p.add_argument("--metrics-file", default=None)
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler (Perfetto) trace of steps "
                        "2-4 into this directory")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import jax

    from ..core.xla_flags import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    from ..config import MeshConfig, TrainConfig
    from ..data.datasets import (CounterfactualCaptionDataset,
                                 CountingDataPipeline,
                                 SyntheticCaptionDataset)
    from ..data.tokenizer import load_tokenizer
    from ..eval.batch_eval import evaluate_batch
    from ..parallel import mesh as pmesh
    from ..train.checkpoint import CheckpointManager
    from ..train.engine import Trainer
    from ..utils import MetricsLogger, ThroughputMeter

    pmesh.distributed_init()

    cfg = TrainConfig(
        lr=args.lr, batch_size=args.batch_size,
        gradient_accumulation_steps=args.grad_accum,
        max_epochs=args.epochs, weight_decay=args.weight_decay,
        use_amp=not args.no_amp, clip_model=args.model,
        experiment_name=args.experiment_name, loss_type=args.loss_type,
        similarity_threshold=args.similarity_threshold,
        inverse_temperature=args.inverse_temperature,
        optimizer_type=args.optimizer, amsgrad=args.amsgrad,
        count_alpha=args.count_alpha,
        seed=args.seed, use_pallas_attention=args.pallas,
        use_fused_sparc=args.pallas or args.fused_sparc,
        unroll_layers=args.unroll_layers, unroll_accum=args.unroll_accum,
        unstack_layers=args.unstack_layers, quant=args.quant,
        remat={"0": False, "1": True, "dots": "dots"}[args.remat],
        global_negatives=args.global_negatives, zero1=args.zero1,
        fsdp=args.fsdp, grad_cache=args.grad_cache,
        checkpoint_dir=args.checkpoint_dir, save_every=args.save_every,
        log_every=args.log_every,
        pipeline_microbatches=args.pipeline_microbatches,
        sequence_parallel=args.sequence_parallel > 1,
        sp_ring=args.sp_ring,
        mesh=MeshConfig(
            data=jax.device_count()
            // (args.model_parallel * args.pipeline_parallel
                * args.sequence_parallel),
            model=max(args.model_parallel, args.sequence_parallel),
            pipe=args.pipeline_parallel))
    if args.sequence_parallel > 1 and (args.model_parallel > 1
                                       or args.pipeline_parallel > 1):
        raise SystemExit("--sequence-parallel cannot be combined with "
                         "--model-parallel or --pipeline-parallel (the "
                         "model axis is either the TP or the sequence "
                         "axis; train/engine.py)")
    if (args.model_parallel * args.pipeline_parallel
            * args.sequence_parallel > 1):
        if jax.device_count() % (args.model_parallel
                                 * args.pipeline_parallel
                                 * args.sequence_parallel) != 0:
            raise SystemExit(
                f"--model-parallel {args.model_parallel} x "
                f"--pipeline-parallel {args.pipeline_parallel} x "
                f"--sequence-parallel {args.sequence_parallel} must "
                f"divide the device count ({jax.device_count()})")
        if not args.global_negatives:
            raise SystemExit(
                "--model-parallel/--pipeline-parallel/"
                "--sequence-parallel > 1 require "
                "--global-negatives: the DDP-parity shard_map path "
                "assumes replicated params (train/engine.py)")
        if args.unstack_layers and args.sequence_parallel == 1:
            raise SystemExit(
                "--model-parallel/--pipeline-parallel > 1 are "
                "incompatible with --unstack-layers (the sharding rules "
                "address the stacked [L, ...] layout)")
    if cfg.batch_size % cfg.mesh.data != 0:
        raise SystemExit(
            f"--batch-size {cfg.batch_size} must be divisible by the "
            f"data-parallel degree ({cfg.mesh.data} devices)")
    cfg.print_config()
    model_cfg = cfg.model_config()

    # ---------------- data ----------------
    mode = "counterfactual" if args.loss_type == "count" else "standard"
    if bool(args.packed) == bool(args.annotations):
        raise SystemExit("pass exactly one of --annotations / --packed")
    if args.device_data and not args.packed:
        raise SystemExit("--device-data requires --packed")
    if args.packed:
        # Decode-free ingest: host preprocessing already ran once at pack
        # time (cli.pack_dataset); the per-batch host cost is one memcpy.
        from ..data.packed import PackedDataPipeline
        pipeline = PackedDataPipeline(
            args.packed, cfg.effective_batch_size, seed=cfg.seed,
            expect_mode=mode,
            expect_image_size=model_cfg.vision.image_size,
            expect_context_length=model_cfg.text.max_position_embeddings,
            index_only=args.device_data)
        print(f"packed dataset: {pipeline._num_samples()} samples, "
              f"{pipeline.steps_per_epoch()} steps/epoch"
              + (f", {pipeline.pixel_bank_bytes() / 1e9:.2f} GB "
                 "device-resident pixel bank" if args.device_data else ""))
    else:
        ds_cls = CounterfactualCaptionDataset if mode == "counterfactual" \
            else SyntheticCaptionDataset
        dataset = ds_cls(args.annotations)
        tokenizer = load_tokenizer(args.bpe_path)
        from ..data.tokenizer import HashTokenizer
        if isinstance(tokenizer, HashTokenizer) and \
                tokenizer.vocab_size != model_cfg.text.vocab_size:
            tokenizer = HashTokenizer(
                vocab_size=model_cfg.text.vocab_size,
                bos_token_id=model_cfg.text.bos_token_id,
                eos_token_id=model_cfg.text.eos_token_id,
                pad_token_id=model_cfg.text.pad_token_id)
        pipeline = CountingDataPipeline(
            dataset, cfg.effective_batch_size, mode=mode,
            image_size=model_cfg.vision.image_size,
            context_length=model_cfg.text.max_position_embeddings,
            tokenizer=tokenizer, seed=cfg.seed)
        print(f"dataset: {len(dataset)} samples, "
              f"{pipeline.steps_per_epoch()} steps/epoch")

    # ---------------- params ----------------
    params, ref_meta = None, {}
    if args.pretrained:
        from ..models import hf_import
        if args.pretrained.endswith((".pt", ".pth", ".bin")):
            params, ref_meta = hf_import.load_reference_checkpoint(
                args.pretrained, model_cfg)
            print(f"loaded reference checkpoint (step "
                  f"{ref_meta.get('global_step')})")
        else:
            params, _ = hf_import.load_hf_clip(args.pretrained)
            print(f"loaded HF weights: {args.pretrained}")

    # ---------------- engine ----------------
    mesh = pmesh.make_mesh(cfg.mesh) if jax.device_count() > 1 else None
    ckpt_dir = os.path.join(args.checkpoint_dir, args.experiment_name)
    manager = CheckpointManager(ckpt_dir, save_every=cfg.save_every)
    trainer = Trainer(cfg, params=params, mesh=mesh,
                      checkpoint_manager=manager,
                      pixel_bank=pipeline.pixel_bank()
                      if args.device_data else None)

    # Resume source: bare --resume = <ckpt-dir>/<exp>/best; --resume
    # <path> = an explicit orbax step dir (the reference's resume-by-path,
    # finetuner.py:286).
    if args.resume and args.import_optimizer_state:
        raise SystemExit("--resume and --import-optimizer-state both "
                         "restore optimizer state — pick one source")
    resume_dir, resume_step = None, None
    if isinstance(args.resume, str):
        path = os.path.abspath(args.resume.rstrip("/"))
        if not os.path.isdir(path):
            raise SystemExit(f"--resume {args.resume}: no such "
                             "checkpoint directory")
        resume_dir, resume_step = os.path.dirname(path), \
            os.path.basename(path)
    elif args.resume and os.path.isdir(os.path.join(ckpt_dir, "best")):
        resume_dir, resume_step = os.path.abspath(ckpt_dir), "best"

    start_epoch = 0
    resume_skip = 0
    if resume_step is not None:
        # Checkpoints always store the stacked-layers layout (engine.py
        # to_checkpoint_format), so `like` must too.
        ck_params, ck_opt = trainer.to_checkpoint_format()
        like = {"params": ck_params, "opt_state": ck_opt}
        src = manager if resume_dir == os.path.abspath(ckpt_dir) else \
            CheckpointManager(resume_dir, save_every=cfg.save_every)
        state, meta = src.restore(resume_step, like=like, config=cfg)
        trainer.from_checkpoint_format(state["params"], state["opt_state"])
        trainer.global_step = meta.get("global_step", 0)
        trainer.best_loss = meta.get("best_loss", float("inf"))
        # start epoch from global_step, as finetuner.py:339-342
        spe = max(1, pipeline.steps_per_epoch())
        start_epoch = trainer.global_step // spe
        # Mid-epoch (preemption) checkpoint: resume is step-exact — the
        # deterministic pipeline replays the interrupted epoch and the
        # already-applied leading steps are skipped, not re-trained.
        resume_skip = trainer.global_step % spe
        print(f"resumed from {resume_dir}/{resume_step} at epoch "
              f"{start_epoch}"
              + (f" (skipping {resume_skip} completed steps)"
                 if resume_skip else ""))
    elif args.import_optimizer_state:
        # True mid-run migration of a reference fine-tune: restore the
        # torch AdamSPD moments / step / SPD anchors alongside the
        # weights (the reference's load_checkpoint does the same,
        # finetuner.py:232-241). optim/interop.py converts the state.
        if not ref_meta:
            raise SystemExit("--import-optimizer-state requires "
                             "--pretrained <reference .pt checkpoint>")
        opt_sd = ref_meta.get("optimizer_state_dict")
        if opt_sd is None:
            raise SystemExit(f"{args.pretrained} carries no "
                             "optimizer_state_dict")
        from ..optim import interop
        # The reference restores optimizer HYPERPARAMETERS with the state
        # (torch load_state_dict replaces param_groups); ours come from
        # the CLI flags, so surface any drift loudly instead of silently
        # following a different trajectory from step k+1.
        g0 = opt_sd["param_groups"][0]
        for key, ours in (("lr", cfg.lr), ("betas", tuple(cfg.betas)),
                          ("eps", cfg.eps),
                          ("weight_decay", cfg.weight_decay)):
            theirs = g0.get(key)
            theirs = tuple(theirs) if isinstance(theirs, (list, tuple)) \
                else theirs
            if theirs is not None and theirs != ours:
                warnings.warn(
                    f"optimizer hyperparameter drift on import: checkpoint "
                    f"{key}={theirs!r}, this run uses {ours!r} — pass the "
                    f"matching flag for an exact reference continuation")
        if bool(g0.get("amsgrad", False)) != cfg.amsgrad:
            raise SystemExit(
                f"checkpoint amsgrad={g0.get('amsgrad')} but this run has "
                f"amsgrad={cfg.amsgrad} — rerun with --amsgrad matching "
                "the checkpoint (importing across the mismatch would "
                "silently drop or fabricate the nu_max maxima)")
        if cfg.optimizer_type != "adamspd" and cfg.amsgrad:
            raise SystemExit(
                "amsgrad AdamW has no counterpart here (optax.adamw "
                "carries no max buffer) — the moment maxima would be "
                "silently dropped; only AdamSPD supports amsgrad import")
        ck_params, ck_opt = trainer.to_checkpoint_format()
        if cfg.optimizer_type == "adamspd":
            imported = interop.adamspd_state_from_reference(opt_sd,
                                                            model_cfg)
            ck_opt = interop.replace_adamspd_state(ck_opt, imported)
        else:
            imported = interop.adamw_state_from_reference(opt_sd,
                                                          model_cfg)
            ck_opt = interop.replace_scale_by_adam(ck_opt, imported)
        trainer.from_checkpoint_format(ck_params, ck_opt)
        trainer.global_step = int(ref_meta.get("global_step",
                                               int(imported.count)))
        trainer.best_loss = float(ref_meta.get("best_loss", float("inf")))
        start_epoch = trainer.global_step // max(
            1, pipeline.steps_per_epoch())
        print(f"imported reference optimizer state (step "
              f"{trainer.global_step}, SPD anchors restored); resuming "
              f"at epoch {start_epoch}")

    metrics_log = MetricsLogger(args.metrics_file)
    meter = ThroughputMeter()

    def log_fn(msg):
        print(msg, flush=True)

    # Hold out the first batch for the per-epoch counting eval
    # (count_finetuner.py:173-175) and, like the reference, evaluate it
    # BEFORE training — the chance-level anchor of the accuracy
    # trajectory (skipped on resume: the anchor belongs to step 0).
    eval_batch_data = None
    if args.eval_every_epoch and mode == "counterfactual":
        eval_batch_data = next(iter(pipeline.epoch(0)))
        if args.device_data:
            # The batch-eval path runs outside the jitted train step, so
            # it needs real pixels, not bank indices.
            eval_batch_data = pipeline.materialize(eval_batch_data)
        if start_epoch == 0:
            png = os.path.join(ckpt_dir, "confusion_pretrain.png")
            acc, _, _ = evaluate_batch(trainer.params, model_cfg,
                                       eval_batch_data, filename=png)
            print(f"pre-training counting-eval accuracy: {acc:.3f}")
            metrics_log.log(0, count_eval_accuracy=acc)

    profiling = {"active": False}
    skip_once = {"n": resume_skip}

    def batches(epoch):
        skip = skip_once.pop("n", 0)  # only the first resumed epoch
        for i, batch in enumerate(pipeline.epoch(epoch)):
            if i < skip:
                continue
            if args.profile_dir and trainer.global_step == 2 \
                    and not profiling["active"]:
                jax.profiler.start_trace(args.profile_dir)
                profiling["active"] = True
            yield batch
            if profiling["active"] and trainer.global_step >= 4:
                jax.profiler.stop_trace()
                profiling["active"] = False
                print(f"profile trace written to {args.profile_dir}")
            # Under async dispatch (the engine only syncs at log_every/
            # epoch boundaries) per-step ticks measure ENQUEUE rate, not
            # device throughput — logged under an honest name. The synced
            # epoch lines / the done-line throughput are the real rates.
            rate = meter.tick(cfg.effective_batch_size)
            if rate:
                metrics_log.log(trainer.global_step,
                                pairs_per_sec_enqueue=rate)

    # SIGTERM (cluster preemption / TPU maintenance) → emergency
    # checkpoint at the next step boundary + clean exit; resume with
    # --resume <ckpt-dir>/preempt (step-exact via the skip above).
    from ..train.engine import install_preemption_handler
    install_preemption_handler(trainer)

    epoch_history = []
    for epoch in range(start_epoch, args.epochs):
        result = trainer.train(batches, num_epochs=epoch + 1,
                               start_epoch=epoch, log_fn=log_fn)
        epoch_history.extend(result.get("history", []))
        if result.get("preempted"):
            print(f"preempted: emergency checkpoint at "
                  f"{os.path.join(ckpt_dir, 'preempt')} "
                  f"(resume with --resume <that path>)")
            metrics_log.close()
            return
        if eval_batch_data is not None:
            png = os.path.join(ckpt_dir, f"confusion_epoch_{epoch}.png")
            acc, _, _ = evaluate_batch(trainer.params, model_cfg,
                                       eval_batch_data, filename=png)
            print(f"epoch {epoch} counting-eval accuracy: {acc:.3f}")
            metrics_log.log(trainer.global_step, count_eval_accuracy=acc)

    if profiling["active"]:  # run ended before the stop step
        jax.profiler.stop_trace()
        profiling["active"] = False
        print(f"profile trace written to {args.profile_dir}")

    # Device throughput from the SYNCED epoch timings (each epoch ends
    # with a host sync that drains the dispatch queue); steady-state =
    # epochs after the first (which carries the XLA compile).
    steady = epoch_history[1:] or epoch_history
    pairs = sum(h["seconds"] * h["pairs_per_sec"] for h in steady)
    secs = sum(h["seconds"] for h in steady)
    try:  # TPU backends report allocator stats; CPU returns None.
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        stats = None
    if stats and "peak_bytes_in_use" in stats:
        print(f"device peak HBM: "
              f"{stats['peak_bytes_in_use'] / 2**30:.2f} GiB "
              f"(in use {stats['bytes_in_use'] / 2**30:.2f} GiB)")
    print(f"done: best_loss={trainer.best_loss:.4f} "
          f"steps={trainer.global_step} "
          f"throughput={pairs / secs if secs else 0.0:.1f} pairs/s/chip"
          + (" (steady-state, first epoch excluded)"
             if len(epoch_history) > 1 else ""))
    metrics_log.close()


if __name__ == "__main__":
    main()
