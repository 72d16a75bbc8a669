"""Precision policy utilities — bf16-compute / fp32-params replaces the
reference's AMP + GradScaler (``/root/reference/finetune/finetuner.py:51,119-153``).

bf16 shares fp32's exponent range so no loss scaling is required; losses and
optimizer math always reduce in fp32 (and the reference's fp64 islands,
``losses.py:53-54``, become fp32 with test-bounded tolerance)."""

from __future__ import annotations

import jax.numpy as jnp

from ..config import PrecisionConfig, TrainConfig

_DTYPES = {
    "float32": jnp.float32,
    "f32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "float16": jnp.float16,
    "f16": jnp.float16,
}


def resolve_dtype(name: str):
    try:
        return _DTYPES[name]
    except KeyError:
        raise ValueError(f"unknown dtype {name!r}; known: {sorted(_DTYPES)}")


def compute_dtype(cfg: TrainConfig):
    """The activation/matmul dtype. ``use_amp`` is the reference's AMP switch
    (``config.py:14``); off means full fp32 everywhere."""
    if not cfg.use_amp:
        return jnp.float32
    return resolve_dtype(cfg.precision.compute_dtype)


def param_dtype(precision: PrecisionConfig):
    return resolve_dtype(precision.param_dtype)
