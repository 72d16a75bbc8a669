"""Numerics debugging — the TPU-native stand-ins for the reference's
``CUDA_LAUNCH_BLOCKING=1`` kernel serialization and spawn-start-method
hygiene (``/root/reference/finetune/dist_finetuner.py:420-425``), per
SURVEY.md §5: NaN trapping, checkify wrappers, and deterministic-mode
toggles."""

from __future__ import annotations

import contextlib
from typing import Any, Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Raise on the first NaN produced inside the block
    (``jax_debug_nans`` — the moral analogue of CUDA_LAUNCH_BLOCKING:
    fail at the faulting op, not three ops later)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checkified(fn: Callable, *checks) -> Callable:
    """Wrap a jittable fn with ``jax.experimental.checkify`` so internal
    ``checkify.check`` assertions surface as Python errors in tests."""
    from jax.experimental import checkify
    sets = checks if checks else (checkify.float_checks,)
    err_set = frozenset().union(*sets)

    def wrapped(*args, **kwargs):
        err, out = checkify.checkify(fn, errors=err_set)(*args, **kwargs)
        err.throw()
        return out

    return wrapped


def assert_all_finite(tree: Any, name: str = "pytree") -> None:
    """Host-side finiteness sweep over a pytree (checkpoint sanity, test
    fixtures)."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        import numpy as np
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(
            f"non-finite values in {name}: {bad[:10]}")


def count_nonfinite(tree: Any) -> int:
    """Device-side non-finite leaf count — cheap to psum/log every N steps
    as a training-health signal."""
    leaves = [jnp.sum(~jnp.isfinite(x)) for x in jax.tree.leaves(tree)
              if jnp.issubdtype(x.dtype, jnp.floating)]
    return sum(leaves) if leaves else jnp.zeros((), jnp.int32)
