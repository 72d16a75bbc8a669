"""Worker for the 2-process distributed test (tests/test_multiprocess.py).

Each process owns 2 virtual CPU devices (4 global), wires up
``jax.distributed`` through ``parallel.mesh.distributed_init`` — the
TPU-native analogue of the reference's torchrun/NCCL bootstrap
(``/root/reference/finetune/dist_train.sh:40-51``,
``dist_finetuner.py:349-417``) — loads only its own per-host slice of the
batch (``process_shard_bounds`` + ``shard_batch_from_local``, replacing
``DistributedSampler``), runs real DP train steps, and round-trips an orbax
checkpoint with every process participating in the save collective.

Prints one JSON line the parent test compares across processes and against
a single-process oracle.
"""

import json
import os
import sys

import numpy as np

# Script lives in tests/; the package root is one level up.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Deadlock workaround for CPU-mesh collectives (see the helper docstring).
from clip_finegrained_alignment_tpu.core.xla_flags import \
    ensure_cpu_collective_program_order  # noqa: E402

ensure_cpu_collective_program_order()


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    ckdir = sys.argv[4]

    import jax
    jax.config.update("jax_platforms", "cpu")

    from clip_finegrained_alignment_tpu.parallel import mesh as pmesh
    pmesh.distributed_init(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

    import jax.numpy as jnp
    from clip_finegrained_alignment_tpu.config import (CLIPConfig,
                                                       MeshConfig,
                                                       TrainConfig)
    from clip_finegrained_alignment_tpu.models import clip as m
    from clip_finegrained_alignment_tpu.optim.factory import make_optimizer
    from clip_finegrained_alignment_tpu.train.engine import make_train_step
    from clip_finegrained_alignment_tpu.train.checkpoint import \
        CheckpointManager

    assert jax.process_count() == nproc, jax.process_count()
    devices = jax.devices()
    n = len(devices)
    assert n == 2 * nproc, f"expected {2 * nproc} global devices, got {n}"

    model_cfg = CLIPConfig.tiny_test()
    accum, B = 2, 2 * n
    cfg = TrainConfig(
        clip_model="tiny", loss_type="sparc", optimizer_type="adamspd",
        inverse_temperature=0.07, batch_size=B,
        gradient_accumulation_steps=accum, use_amp=False,
        global_negatives=True, mesh=MeshConfig(data=n, model=1))
    mesh = pmesh.make_mesh(cfg.mesh, devices)

    params = m.init_clip_params(jax.random.key(0), model_cfg)
    anchor = jax.tree.map(jnp.copy, params)
    opt = make_optimizer(cfg, params, anchor_params=anchor)
    opt_state = opt.init(params)
    step = make_train_step(cfg, model_cfg, opt, mesh=mesh)

    # Identical global batch on every process (same seed), but each process
    # hands jax only its LOCAL rows — the multi-host data path.
    rng = np.random.default_rng(0)
    v, t = model_cfg.vision, model_cfg.text
    ids = rng.integers(1, t.vocab_size - 2,
                       size=(accum, B, t.max_position_embeddings)
                       ).astype(np.int32)
    ids[..., -1] = t.eos_token_id
    global_batch = {
        "pixel_values": rng.normal(
            size=(accum, B, v.image_size, v.image_size, 3)
        ).astype(np.float32),
        "input_ids": ids,
    }
    start, stop = pmesh.process_shard_bounds(B)
    local = {k: x[:, start:stop] for k, x in global_batch.items()}
    batch = pmesh.shard_batch_from_local(local, mesh, accum_axis=True)

    params = pmesh.replicate(params, mesh)
    opt_state = pmesh.replicate(opt_state, mesh)

    losses = []
    for _ in range(3):
        params, opt_state, metrics = step(params, opt_state, batch)
        losses.append(float(metrics["total_loss"]))

    # Orbax checkpoint roundtrip — all processes call save (collective).
    mgr = CheckpointManager(ckdir, save_every=1)
    mgr.save(epoch=0, params=params, opt_state=opt_state, global_step=3,
             best_loss=losses[-1], avg_loss=losses[-1], is_best=True,
             config=cfg)
    state, meta = mgr.restore(
        "best", like={"params": params, "opt_state": opt_state}, config=cfg)

    def shard0(x):
        return np.asarray(x.addressable_shards[0].data)

    restore_ok = all(
        np.array_equal(shard0(a), shard0(b))
        for a, b in zip(jax.tree.leaves(state["params"]),
                        jax.tree.leaves(params)))

    print(json.dumps({
        "process": pid,
        "losses": losses,
        "restore_ok": bool(restore_ok),
        "meta_step": meta.get("global_step"),
        "shard_bounds": list(pmesh.process_shard_bounds(B)),
    }), flush=True)


if __name__ == "__main__":
    main()
