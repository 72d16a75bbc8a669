"""Shared helpers for the Pallas TPU kernels in this package."""

from __future__ import annotations

import jax


def interpret() -> bool:
    """Pallas TPU kernels run in interpreter mode on non-TPU backends
    (CPU unit tests / the virtual 8-device mesh)."""
    return jax.default_backend() != "tpu"


def vma(*xs):
    """Union of varying-manual-axes of the inputs. Inside ``shard_map``
    (the DDP-parity train path) pallas_call outputs must declare which
    mesh axes they vary over, or tracing fails under ``check_vma``;
    outside shard_map this is the empty set (a no-op)."""
    out = frozenset()
    for x in xs:
        out |= getattr(jax.typeof(x), "vma", frozenset())
    return out
