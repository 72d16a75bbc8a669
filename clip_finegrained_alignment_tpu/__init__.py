"""clip_finegrained_alignment_tpu — TPU-native CLIP fine-grained-alignment framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
``tpeat/clip-finegrained-alignment`` (PyTorch/CUDA research stack for
fine-tuning CLIP on counting objectives and evaluating small-object /
counting benchmarks), re-architected for TPU:

* ``models``      — pure-functional dual-tower CLIP (ViT-B/32, B/16, L/14),
                    HF weight import, vendored BPE tokenizer.
* ``ops``         — Pallas TPU kernels (flash attention, fused SPARC local
                    alignment) + jitted image preprocessing.
* ``objectives``  — the four losses (CLIP InfoNCE, CLIP+Count, SPARC,
                    counterfactual Count) as pure jitted functions.
* ``optim``       — AdamSPD (selective projection decay) as an optax
                    transformation; AdamW factory with decay masks.
* ``parallel``    — device mesh, sharding rules, collectives (DP over ICI,
                    optional TP).
* ``train``       — the single SPMD training engine (subsumes the
                    reference's three trainers) + orbax checkpointing.
* ``data``        — synthetic copy-paste data generator, counting datasets,
                    per-host sharded input pipelines.
* ``eval``        — CountBench, VLMs-are-Blind, zero-shot crop detection,
                    train-time batch eval, visualization.
"""

__version__ = "0.1.0"

from .config import (CLIPConfig, MeshConfig, PrecisionConfig, TextConfig,
                     TrainConfig, VisionConfig)

__all__ = [
    "CLIPConfig", "MeshConfig", "PrecisionConfig", "TextConfig",
    "TrainConfig", "VisionConfig",
]
