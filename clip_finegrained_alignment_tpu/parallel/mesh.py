"""Device mesh, sharding rules, and collectives — the TPU-native replacement
for the reference's NCCL/DDP stack (``/root/reference/finetune/dist_finetuner.py``).

Where the reference spawns one process per GPU, wraps the model in DDP, and
lets NCCL allreduce gradients (``dist_finetuner.py:50,57``), this module
builds a ``jax.sharding.Mesh`` over all addressable devices and expresses the
same data parallelism as sharding annotations: params replicated, batch
sharded on the ``data`` axis, gradient reduction as an XLA ``psum`` over ICI
emitted automatically by the partitioner (or explicitly inside ``shard_map``
in local-negatives parity mode — see ``train/engine.py``).

The mesh is 2D ``(data, model)`` so tensor parallelism is a config change,
not a rewrite; the reference's only strategy is DP (SURVEY.md §2.2), so
``model=1`` is the parity default.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"
PIPE_AXIS = "pipe"


def distributed_init(**kwargs) -> None:
    """Multi-host process bootstrap — the analogue of
    ``dist.init_process_group("nccl")`` + the MASTER_ADDR/PORT plumbing in
    ``dist_train.sh:18-21``. On a single host this is a no-op; on a
    multi-host TPU pod slice it wires up the DCN coordination service.

    Triggered by explicit kwargs (coordinator_address etc.), by
    ``CFA_DISTRIBUTED=1``, or by the standard coordinator env vars — NOT
    by ``jax.process_count()``, which reads 1 *until* initialization on a
    pod (the check would never fire where it matters)."""
    import os
    multihost_env = (os.environ.get("CFA_DISTRIBUTED") == "1"
                     or os.environ.get("JAX_COORDINATOR_ADDRESS")
                     or os.environ.get("COORDINATOR_ADDRESS"))
    if kwargs or multihost_env:
        jax.distributed.initialize(**kwargs)


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build the ``(data, model, pipe)`` mesh.

    With ``cfg=None`` every addressable device lands on the ``data`` axis —
    the morally-equivalent default to torchrun's one-process-per-GPU DP
    (``dist_train.sh:40-51``), minus the processes. ``pipe`` is the minor
    (fastest-varying) axis so pipeline stages are ICI neighbors and the
    GPipe ``ppermute`` rides single hops.
    """
    devices = list(devices if devices is not None else jax.devices())
    if cfg is None:
        cfg = MeshConfig(data=len(devices), model=1)
    n = cfg.num_devices
    if len(devices) < n:
        raise ValueError(
            f"mesh {cfg.data}x{cfg.model}x{cfg.pipe} needs {n} devices, "
            f"have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(cfg.data, cfg.model, cfg.pipe)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS, PIPE_AXIS))


# ---------------------------------------------------------------------------
# Sharding rules
# ---------------------------------------------------------------------------

def batch_sharding(mesh: Mesh, *, accum_axis: bool = False) -> NamedSharding:
    """Batch tensors shard their batch dim over ``data`` (the role of
    ``DistributedSampler`` + per-rank batches in the reference,
    ``synthetic_dataloader.py:104-110``). With ``accum_axis=True`` the layout
    is [accum, batch, ...] and the *second* dim is the sharded one."""
    spec = P(None, DATA_AXIS) if accum_axis else P(DATA_AXIS)
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding — params & optimizer state under pure DP
    (what DDP's construction-time broadcast achieves, ``dist_finetuner.py:57``)."""
    return NamedSharding(mesh, P())


def _put(x, sh: NamedSharding):
    """Place one host array with sharding ``sh``. Under multi-process
    (multi-host pod / the 2-process CPU test) ``jax.device_put`` of a
    global array onto non-addressable devices is unavailable, so build the
    global jax.Array from per-shard callbacks instead — every process must
    hold the same *global* ``x`` (for per-host local slices use
    ``shard_batch_from_local``)."""
    if jax.process_count() > 1:
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])
    return jax.device_put(x, sh)


def shard_batch(batch: Any, mesh: Mesh, *, accum_axis: bool = False) -> Any:
    """Device-put a host batch pytree with the batch dim sharded on ``data``."""
    sh = batch_sharding(mesh, accum_axis=accum_axis)
    return jax.tree.map(lambda x: _put(x, sh), batch)


def shard_batch_from_local(local_batch: Any, mesh: Mesh,
                           *, accum_axis: bool = False) -> Any:
    """Assemble the global sharded batch from THIS process's local slice —
    the multi-host data path: each host loads only its
    ``process_shard_bounds`` rows (the per-host replacement for
    ``DistributedSampler``, ``count_dataloader.py:123-129``) and the global
    array is stitched across hosts without any cross-host copy."""
    sh = batch_sharding(mesh, accum_axis=accum_axis)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(x)), local_batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Device-put a pytree fully replicated across the mesh."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: _put(x, sh), tree)


# ---------------------------------------------------------------------------
# Host-side data sharding (multi-host: each process loads its own slice)
# ---------------------------------------------------------------------------

def process_shard_bounds(num_samples: int,
                         process_index: Optional[int] = None,
                         process_count: Optional[int] = None):
    """[start, stop) of this host's contiguous shard of a dataset — the
    per-host replacement for ``DistributedSampler``'s index partitioning
    (``count_dataloader.py:123-129``). Uses the DistributedSampler convention
    of padding by wraparound so every host sees the same number of samples."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = -(-num_samples // pc)  # ceil
    start = pi * per
    return start, start + per


def epoch_permutation(num_samples: int, epoch: int, seed: int = 42):
    """Deterministic per-epoch shuffle shared by all hosts — the analogue of
    ``sampler.set_epoch`` (``dist_finetuner.py:223``): same seed+epoch on
    every host yields identical permutations, so contiguous shards never
    overlap."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
    return rng.permutation(num_samples)
