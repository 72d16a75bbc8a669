"""Orbax checkpointing — params + optimizer state + step + config.

Replaces the reference's torch-pickle checkpoints
(``/root/reference/finetune/finetuner.py:256-273``; DDP rank-0 tmp-file +
``os.replace`` atomic rename, ``dist_finetuner.py:313-347``) with orbax,
which gives the same atomicity (write-then-commit) plus async saves and
sharding-aware restore. The reference's DDP resume quirk — only rank 0
loads, so ranks diverge (``dist_finetuner.py:87-89``) — cannot happen here:
restore produces arrays with the replicated sharding, consistent on every
host by construction.

Policy parity: ``best`` saved on new best epoch-average loss
(``finetuner.py:215-218``), periodic ``epoch_{n}`` every ``save_every``
epochs (:220-223), config carried inside the checkpoint and checked on
restore with mismatch warnings (:249-254).

Format note: checkpoints always store the stacked-layers param layout
(``train/engine.py::Trainer.to_checkpoint_format``). Round 2 changed
AdamSPD's ``nu_max`` placeholder (amsgrad off) from a params-like tree of
scalars to a single scalar; ``restore`` transparently migrates legacy
checkpoints by restoring the old per-leaf layout and collapsing it to the
scalar placeholder (the per-leaf scalars were all zeros — pure
placeholder — so the collapse is lossless)."""

from __future__ import annotations

import json
import os
import warnings
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except ImportError:  # pragma: no cover
    _HAVE_ORBAX = False

from ..config import TrainConfig


def _map_matching_states(match_cls, fn, tree):
    """Apply ``fn`` to every ``match_cls`` instance in an (optax chain)
    opt_state pytree, rebuilding containers (tuples / namedtuples / dicts
    / lists) around it. Non-jax traversal on purpose: the states hold
    ShapeDtypeStructs during restore planning, and jax.tree.map would
    descend into them. Shared by the restore-migration shims here and
    the reference-interop state swaps (``optim/interop.py``)."""
    if isinstance(tree, match_cls):
        return fn(tree)
    if isinstance(tree, tuple):
        mapped = [_map_matching_states(match_cls, fn, t) for t in tree]
        if hasattr(tree, "_fields"):      # other namedtuples (optax states)
            return type(tree)(*mapped)
        return tuple(mapped)
    if isinstance(tree, list):
        return [_map_matching_states(match_cls, fn, t) for t in tree]
    if isinstance(tree, dict):
        return {k: _map_matching_states(match_cls, fn, v)
                for k, v in tree.items()}
    return tree


def _map_adamspd_states(fn, tree):
    from ..optim.adamspd import AdamSPDState
    return _map_matching_states(AdamSPDState, fn, tree)


def _legacy_nu_max_like(like):
    """Rewrite a restore ``like`` tree to the pre-round-2 AdamSPD layout:
    ``nu_max`` (amsgrad off) was a params-like tree of f32 scalars instead
    of one scalar. Returns (legacy_like, found) where found says whether
    any scalar-placeholder state was rewritten."""
    found = []

    def to_legacy(state):
        nu_max = state.nu_max
        is_scalar_placeholder = (
            not isinstance(nu_max, (dict, list, tuple))
            and getattr(nu_max, "shape", None) == ())
        if not is_scalar_placeholder:
            return state
        found.append(True)
        legacy = jax.tree.map(
            lambda _: jax.ShapeDtypeStruct((), np.dtype("float32")),
            state.mu)
        return state._replace(nu_max=legacy)

    return _map_adamspd_states(to_legacy, like), bool(found)


def _collapse_legacy_nu_max(state_tree):
    """Collapse a restored legacy per-leaf ``nu_max`` (all-zeros
    placeholder) back to the current single-scalar form."""
    import jax.numpy as jnp

    def collapse(state):
        if isinstance(state.nu_max, (dict, list, tuple)):
            return state._replace(nu_max=jnp.zeros([], jnp.float32))
        return state

    return _map_adamspd_states(collapse, state_tree)


def _abstract_like(tree):
    """ShapeDtypeStructs for restore. jax.Arrays keep their sharding so
    orbax restores TP-sharded / multi-host arrays with the same layout
    (no host materialization — ``np.asarray`` would fail on
    non-fully-addressable arrays)."""
    def leaf(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                        sharding=x.sharding)
        x = np.asarray(x)
        return jax.ShapeDtypeStruct(x.shape, x.dtype)
    return jax.tree.map(leaf, tree)


class CheckpointManager:
    """best/periodic checkpoint policy over an orbax store.

    Layout::

        <dir>/best/          — latest best-loss checkpoint
        <dir>/epoch_<n>/     — periodic snapshots
    """

    def __init__(self, directory: str, save_every: int = 5,
                 keep_periodic: int = 3, async_save: bool = False):
        """``async_save=True`` overlaps checkpoint IO with training
        (orbax async commit); ``wait()`` or the next save joins the
        pending write. Writes stay atomic either way."""
        if not _HAVE_ORBAX:  # pragma: no cover
            raise RuntimeError("orbax-checkpoint is unavailable")
        self.directory = os.path.abspath(directory)
        self.save_every = max(1, save_every)
        self.keep_periodic = keep_periodic
        self.async_save = async_save
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self._pending_meta = []

    # ------------------------------------------------------------------
    def wait(self) -> None:
        """Join any in-flight async save (and write its meta sidecars)."""
        self._ckptr.wait_until_finished()
        for path, meta in self._pending_meta:
            if jax.process_index() == 0:
                with open(os.path.join(path, "meta.json"), "w") as f:
                    json.dump(meta, f, indent=2)
        self._pending_meta.clear()

    def _save_to(self, path: str, state: Dict[str, Any],
                 meta: Dict[str, Any]) -> None:
        path = os.path.join(self.directory, path)
        self.wait()  # at most one save in flight
        # Device arrays are saved natively (orbax handles sharded /
        # multi-host jax.Arrays; every process participates in the save
        # collective — the single-writer detail lives inside orbax). This
        # is what lets TP-sharded checkpoints survive multi-host, unlike
        # a host-0 np.asarray copy.
        self._ckptr.save(path, state, force=True)
        self._pending_meta.append((path, meta))
        if not self.async_save:
            self.wait()

    def save(self, *, epoch: int, params, opt_state, global_step: int,
             best_loss: float, avg_loss: float, is_best: bool,
             config: Optional[TrainConfig] = None) -> None:
        """All processes must call this (orbax saves are collective) —
        the reference's rank-0-only ``save_checkpoint`` gate
        (``dist_finetuner.py:313``) maps to orbax's internal
        primary-writer election, not to a caller-side early return."""
        state = {"params": params, "opt_state": opt_state}
        meta = {
            "epoch": epoch,
            "global_step": global_step,
            "best_loss": float(best_loss),
            "avg_loss": float(avg_loss),
            "config": config.to_dict() if config is not None else None,
        }
        if is_best:
            self._save_to("best", state, meta)
        if (epoch + 1) % self.save_every == 0:
            self._save_to(f"epoch_{epoch}", state, meta)
            self._prune_periodic()

    def save_preempt(self, *, epoch: int, params, opt_state,
                     global_step: int, best_loss: float, avg_loss: float,
                     config: Optional[TrainConfig] = None) -> None:
        """Emergency mid-epoch save to ``<dir>/preempt`` (SIGTERM path,
        ``engine.install_preemption_handler``). Synchronous — the
        process is about to exit, so the write must be committed (and
        meta.json flushed) before returning; the atomic tmp+rename
        inside orbax still guarantees no torn checkpoint if the kill
        escalates to SIGKILL mid-write."""
        state = {"params": params, "opt_state": opt_state}
        meta = {
            "epoch": epoch,
            "global_step": global_step,
            "best_loss": float(best_loss),
            "avg_loss": float(avg_loss),
            "preempted": True,
            "config": config.to_dict() if config is not None else None,
        }
        self._save_to("preempt", state, meta)
        self.wait()

    def _epochs_on_disk(self):
        """Committed epoch_<n> dirs (skips orbax in-flight tmp dirs)."""
        out = []
        for d in os.listdir(self.directory):
            if d.startswith("epoch_"):
                suffix = d.split("_", 1)[1]
                if suffix.isdigit():
                    out.append(int(suffix))
        return sorted(out)

    def _prune_periodic(self) -> None:
        if self.keep_periodic <= 0:
            return
        import shutil
        for e in self._epochs_on_disk()[:-self.keep_periodic]:
            shutil.rmtree(os.path.join(self.directory, f"epoch_{e}"),
                          ignore_errors=True)

    # ------------------------------------------------------------------
    def restore(self, which: str = "best", *, like: Dict[str, Any],
                config: Optional[TrainConfig] = None):
        """Restore ``{"params", "opt_state"}`` (structured like ``like``)
        plus the metadata dict. Warns on config drift (parity with
        ``finetuner.py:249-254``)."""
        self.wait()
        path = os.path.join(self.directory, which)
        abstract = _abstract_like(like)
        try:
            state = self._ckptr.restore(path, abstract)
        except Exception as e:
            # Migration: pre-round-2 checkpoints stored AdamSPD's
            # amsgrad-off nu_max as a params-like tree of scalars. Retry
            # with the legacy layout and collapse it to the scalar
            # placeholder (all leaves were zeros, so this is lossless).
            legacy_like, found = _legacy_nu_max_like(abstract)
            if not found:
                raise
            try:
                state = self._ckptr.restore(path, legacy_like)
            except Exception:
                raise e  # original layout error is the informative one
            state = _collapse_legacy_nu_max(state)
            warnings.warn(
                "restored a pre-round-2 checkpoint with the legacy "
                "per-leaf nu_max layout; collapsed to the scalar "
                "placeholder. Re-saving will write the current format.")
        meta_path = os.path.join(path, "meta.json")
        meta = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        elif os.path.isdir(path):
            # meta.json is written by process 0 only; if the step dir is
            # visible but meta is not, this host does not share the
            # checkpoint filesystem with process 0 — resuming would
            # silently reset global_step/best_loss on this host and
            # diverge epoch counters (orbax itself requires a shared FS).
            raise RuntimeError(
                f"checkpoint {path} exists but meta.json is missing — "
                "the checkpoint directory must be on a filesystem shared "
                "with process 0 (which writes meta.json)")
        if config is not None and meta.get("config"):
            current = config.to_dict()
            for k, v in meta["config"].items():
                if k in current and current[k] != v:
                    warnings.warn(
                        f"checkpoint config mismatch: {k} was {v!r}, "
                        f"now {current[k]!r}")
        return state, meta

    def latest_epoch(self) -> Optional[int]:
        epochs = self._epochs_on_disk()
        return max(epochs) if epochs else None
