"""Configuration tree for the TPU-native CLIP fine-grained-alignment framework.

Single source of truth for every hyperparameter (the reference splits them
between a dataclass and hardcoded ``main()`` overrides — see
``/root/reference/finetune/config.py:4-28`` vs ``finetuner.py:297-318``; here
there is exactly one config object per concern).

``TrainConfig`` carries the reference's 19 fields
(``/root/reference/finetune/config.py:4-28``) plus TPU-specific knobs
(mesh shape, precision policy, kernel selection) that have no reference
counterpart.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Tuple


# ---------------------------------------------------------------------------
# Model architecture
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class VisionConfig:
    """ViT image tower architecture."""
    image_size: int = 224
    patch_size: int = 32
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    layer_norm_eps: float = 1e-5

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        # +1 for the class token.
        return self.num_patches + 1

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclass(frozen=True)
class TextConfig:
    """Text transformer tower architecture."""
    vocab_size: int = 49408
    hidden_size: int = 512
    intermediate_size: int = 2048
    num_layers: int = 12
    num_heads: int = 8
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    bos_token_id: int = 49406
    eos_token_id: int = 49407

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclass(frozen=True)
class CLIPConfig:
    """Full dual-tower CLIP architecture.

    Mirrors HF ``CLIPConfig`` for the model families the reference exercises:
    ViT-B/32 (training: ``/root/reference/finetune/finetuner.py:296``),
    ViT-B/16, and ViT-L/14 (eval: ``/root/reference/vlms-are-blind/launch_eval.sh``).
    """
    vision: VisionConfig = field(default_factory=VisionConfig)
    text: TextConfig = field(default_factory=TextConfig)
    projection_dim: int = 512
    logit_scale_init: float = 2.6592  # ln(1/0.07), HF CLIP default.

    @staticmethod
    def vit_b32() -> "CLIPConfig":
        return CLIPConfig()

    @staticmethod
    def vit_b16() -> "CLIPConfig":
        return CLIPConfig(vision=VisionConfig(patch_size=16))

    @staticmethod
    def vit_l14() -> "CLIPConfig":
        return CLIPConfig(
            vision=VisionConfig(
                patch_size=14, hidden_size=1024, intermediate_size=4096,
                num_layers=24, num_heads=16),
            text=TextConfig(hidden_size=768, intermediate_size=3072,
                            num_layers=12, num_heads=12),
            projection_dim=768,
        )

    @staticmethod
    def vit_l14_336() -> "CLIPConfig":
        """ViT-L/14 @ 336px (openai/clip-vit-large-patch14-336): 577
        vision tokens — the long-sequence regime where the blockwise
        Pallas attention kernel pays off."""
        base = CLIPConfig.vit_l14()
        from dataclasses import replace
        return replace(base, vision=replace(base.vision, image_size=336))

    @staticmethod
    def tiny_test() -> "CLIPConfig":
        """Miniature config for unit tests — same topology, tiny dims."""
        return CLIPConfig(
            vision=VisionConfig(image_size=32, patch_size=8, hidden_size=32,
                                intermediate_size=64, num_layers=2, num_heads=2),
            text=TextConfig(vocab_size=256, hidden_size=32, intermediate_size=64,
                            num_layers=2, num_heads=2, max_position_embeddings=16,
                            bos_token_id=254, eos_token_id=255, pad_token_id=0),
            projection_dim=24,
        )

    @staticmethod
    def from_name(name: str) -> "CLIPConfig":
        table = {
            "ViT-B/32": CLIPConfig.vit_b32,
            "openai/clip-vit-base-patch32": CLIPConfig.vit_b32,
            "ViT-B/16": CLIPConfig.vit_b16,
            "openai/clip-vit-base-patch16": CLIPConfig.vit_b16,
            "ViT-L/14": CLIPConfig.vit_l14,
            "openai/clip-vit-large-patch14": CLIPConfig.vit_l14,
            "ViT-L/14@336": CLIPConfig.vit_l14_336,
            "openai/clip-vit-large-patch14-336": CLIPConfig.vit_l14_336,
            "tiny": CLIPConfig.tiny_test,
        }
        if name not in table:
            raise ValueError(f"Unknown CLIP model name: {name!r}. "
                             f"Known: {sorted(table)}")
        return table[name]()


# ---------------------------------------------------------------------------
# Parallelism / precision
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. ``data`` is the DP axis (batch-sharded), ``model``
    the TP axis (weight-sharded), ``pipe`` the pipeline axis (encoder layers
    stage-sharded, GPipe schedule — ``parallel/pipeline.py``). The
    reference's only strategy is DP over NCCL
    (``/root/reference/finetune/dist_finetuner.py:57``); here DP rides ICI
    collectives and TP/PP are further mesh axes, not rewrites."""
    data: int = 1
    model: int = 1
    pipe: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.model * self.pipe


@dataclass(frozen=True)
class PrecisionConfig:
    """bf16-compute / f32-params policy replacing torch AMP
    (``/root/reference/finetune/finetuner.py:51,119-153``). No loss scaler is
    needed: bf16 has fp32's exponent range."""
    compute_dtype: str = "bfloat16"   # activations & matmuls
    param_dtype: str = "float32"      # master weights & optimizer state
    logits_dtype: str = "float32"     # losses always reduce in fp32


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------

@dataclass
class TrainConfig:
    """Training hyperparameters — superset of the reference's 19-field
    ``CLIPFineTuneConfig`` (``/root/reference/finetune/config.py:4-28``)."""
    # Reference fields (same names, same defaults).
    lr: float = 1e-5
    batch_size: int = 32
    max_grad_norm: float = 1.0
    warmup_steps: int = 1000
    max_epochs: int = 400
    save_every: int = 1
    weight_decay: float = 0.2
    use_amp: bool = True                  # maps to bf16 compute on TPU
    clip_model: str = "ViT-B/32"
    max_length: int = 77
    experiment_name: str = "clip_default"
    gradient_accumulation_steps: int = 4
    loss_type: str = "count"              # clip | sparc | count | clip_count
    similarity_threshold: float = 0.5
    global_loss_weight: float = 1.0
    local_loss_weight: float = 1.0
    inverse_temperature: float = 1.0
    optimizer_type: str = "adamw"         # adamw | adamspd
    betas: Tuple[float, float] = (0.9, 0.98)
    eps: float = 5e-6
    amsgrad: bool = False
    count_alpha: float = 1.0

    # TPU-native additions (no reference counterpart).
    seed: int = 42
    mesh: MeshConfig = field(default_factory=MeshConfig)
    precision: PrecisionConfig = field(default_factory=PrecisionConfig)
    use_pallas_attention: bool = False    # fused flash attention kernels
    remat: object = "dots"                # per-layer rematerialization:
                                          # False | True (recompute all) |
                                          # "dots" (save weight-matmuls;
                                          # measured fastest that fits:
                                          # 556 vs 539 pairs/s/chip on
                                          # ViT-B/16 @ 256/v5e)
    use_fused_sparc: bool = False         # fused SPARC local-alignment kernel
    unroll_layers: int = 1                # lax.scan unroll factor for the
                                          # encoder layer loop (perf knob;
                                          # identical math)
    unroll_accum: int = 1                 # lax.scan unroll factor for the
                                          # gradient-accumulation loop
                                          # (identical math)
    unstack_layers: bool = False          # per-layer param leaves instead of
                                          # the scan-stacked [L, ...] layout:
                                          # each layer's grads get their own
                                          # buffers (no stacked-buffer
                                          # update-slices). Identical math;
                                          # checkpoints stay stacked.
    quant: str = "none"                   # int8 MXU path for the encoder
                                          # projection GEMMs (ops/quant.py):
                                          # "switchback" = int8 fwd+dgrad,
                                          # exact wgrad (arXiv:2304.13013);
                                          # "int8" = all three matmuls int8.
                                          # Changes numerics (bounded —
                                          # tests/test_quant.py); not a
                                          # parity mode.
    global_negatives: bool = False        # all-gather embeddings across the
                                          # data axis for the contrastive loss
                                          # (upgrade over reference local-only
                                          # negatives, SURVEY.md §5)
    grad_cache: bool = False              # GradCache (train/gradcache.py):
                                          # ONE contrastive loss over the
                                          # full batch_size x accum effective
                                          # batch at one-chunk activation
                                          # memory (embed -> loss-on-cache ->
                                          # chunked re-forward VJP). Changes
                                          # the objective (bigger negative
                                          # pool — the upgrade), not the
                                          # math of any one loss. clip/sparc
                                          # only.
    zero1: bool = False                   # shard optimizer state (mu/nu/
                                          # anchors) over the data axis,
                                          # ZeRO-1 style: per-chip AdamSPD
                                          # state drops ~1/dp; XLA re-gathers
                                          # updated params over ICI. Identical
                                          # math (parallel/sharding_rules.py)
    fsdp: bool = False                    # shard PARAMS (and, inherited,
                                          # the optimizer state) over the
                                          # data axis — FSDP/ZeRO-3
                                          # (parallel/sharding_rules.py::
                                          # fsdp_param_specs): per-chip
                                          # params+state drop ~1/dp; GSPMD
                                          # emits the per-use weight
                                          # all-gather + grad
                                          # reduce-scatter. Subsumes zero1.
                                          # Identical math.
    pipeline_microbatches: int = 0        # GPipe microbatches per train
                                          # microbatch when mesh.pipe > 1
                                          # (parallel/pipeline.py); 0 = auto
                                          # (2x the stage count — bubble
                                          # fraction (K-1)/(M+K-1)). Identical
                                          # math to the unpipelined step.
    sequence_parallel: bool = False       # context parallelism: the model
                                          # mesh axis shards the TOKEN dim of
                                          # activations instead of Megatron
                                          # weight dims (params replicated
                                          # over it) — parallel/sequence.py.
                                          # Long-context insurance (identical
                                          # math); mutually exclusive with TP.
    sp_ring: bool = False                 # with sequence_parallel: manual
                                          # ring attention (ppermute'd KV +
                                          # online softmax) instead of the
                                          # partitioner's KV all-gather.
    checkpoint_dir: str = "checkpoints"
    log_every: int = 10

    def __post_init__(self):
        if self.loss_type not in ("clip", "sparc", "count", "clip_count"):
            raise ValueError(f"invalid loss_type {self.loss_type!r}")
        if self.optimizer_type not in ("adamw", "adamspd"):
            raise ValueError(f"invalid optimizer_type {self.optimizer_type!r}")
        if self.gradient_accumulation_steps < 1:
            raise ValueError("gradient_accumulation_steps must be >= 1")
        if self.quant not in ("none", "switchback", "int8"):
            raise ValueError(f"invalid quant {self.quant!r} "
                             "(none | switchback | int8)")

    @property
    def effective_batch_size(self) -> int:
        return self.batch_size * self.gradient_accumulation_steps

    def model_config(self) -> CLIPConfig:
        return CLIPConfig.from_name(self.clip_model)

    # ------------------------------------------------------------------
    # Serialization (checkpoint metadata, CLI round-trip)
    # ------------------------------------------------------------------
    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["betas"] = list(d["betas"])
        return d

    @staticmethod
    def from_dict(d: dict) -> "TrainConfig":
        d = dict(d)
        if "betas" in d:
            d["betas"] = tuple(d["betas"])
        if isinstance(d.get("mesh"), dict):
            d["mesh"] = MeshConfig(**d["mesh"])
        if isinstance(d.get("precision"), dict):
            d["precision"] = PrecisionConfig(**d["precision"])
        known = {f.name for f in dataclasses.fields(TrainConfig)}
        return TrainConfig(**{k: v for k, v in d.items() if k in known})

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    def print_config(self) -> None:
        """Organized config report (parity with
        ``/root/reference/finetune/config.py:30-75``)."""
        print("\n" + "=" * 50)
        print("TRAINING CONFIGURATION")
        print("=" * 50)
        groups = {
            "Training Hyperparameters": {
                "Learning Rate": self.lr,
                "Batch Size": self.batch_size,
                "Gradient Accumulation Steps": self.gradient_accumulation_steps,
                "Effective Batch Size": self.effective_batch_size,
                "Max Gradient Norm": self.max_grad_norm,
                "Warmup Steps": self.warmup_steps,
                "Weight Decay": self.weight_decay,
                "Mixed Precision": self.use_amp,
            },
            "Model Configuration": {
                "CLIP Model": self.clip_model,
                "Max Token Length": self.max_length,
                "Experiment Name": self.experiment_name,
                "Loss Type": self.loss_type,
            },
            "Loss Parameters": {
                "Count Alpha": self.count_alpha if "count" in self.loss_type else "N/A",
                "Similarity Threshold": self.similarity_threshold if self.loss_type == "sparc" else "N/A",
                "Global Loss Weight": self.global_loss_weight if self.loss_type == "sparc" else "N/A",
                "Local Loss Weight": self.local_loss_weight if self.loss_type == "sparc" else "N/A",
                "Inverse Temperature": self.inverse_temperature,
            },
            "Optimizer Configuration": {
                "Type": self.optimizer_type,
                "Betas": self.betas,
                "Epsilon": self.eps,
                "AMSGrad": self.amsgrad,
            },
            "TPU Configuration": {
                "Mesh (data x model x pipe)":
                    f"{self.mesh.data} x {self.mesh.model} x "
                    f"{self.mesh.pipe}",
                "Compute dtype": self.precision.compute_dtype,
                "Pallas attention": self.use_pallas_attention,
                "Fused SPARC kernel": self.use_fused_sparc,
                "Global negatives": self.global_negatives,
                "GradCache (full-pool negatives)": self.grad_cache,
                "Int8 quantized GEMMs": self.quant,
                "Sequence parallel": (("ring" if self.sp_ring else "gspmd")
                                      if self.sequence_parallel else False),
            },
        }
        for group, params in groups.items():
            print(f"\n{group}:")
            for k, v in params.items():
                print(f"  {k}: {v}")
        print("\n" + "=" * 50 + "\n")
