"""GPipe activation-memory accounting (VERDICT round-3 weak #4).

Compiles the pipeline-parallel SPARC train step on the virtual 8-device CPU
mesh and reads per-device memory stats from XLA's buffer assignment
(``compiled.memory_analysis()``), sweeping

  * microbatch count M at fixed global batch B   (GPipe in-flight storage)
  * global batch B at fixed microbatch size b    (the honest linear term)
  * remat policy (off / "dots" / full)           (does remat reach inside
                                                   the shard_map stages?)

and comparing against the unpipelined single-device step at the same B.

Why there is no 1F1B schedule to compare against: 1F1B's memory advantage
(<= K microbatches in flight instead of M) requires the loss to decompose
as a sum over microbatches so each microbatch's backward can run before the
next forward. Every loss here is contrastive over the FULL batch
(global-negatives InfoNCE / SPARC pairwise terms couple all B samples:
losses.py, reference finetune/losses.py:14-36,215-252), so d(loss)/d(embed)
exists only after all M microbatches' embeddings are materialized. The
memory-optimal schedule under that constraint is exactly what AD of the
forward wavefront + per-layer ``jax.checkpoint`` produces: store only
layer INPUTS per tick (O(B·S·D·L/K) per stage), recompute the rest in the
reverse wavefront. This report measures that bound instead of asserting it.

Run (CPU, ~2 min):
    python perf/pp_activation_report.py
Writes perf/pp_activation_report.log; numbers quoted in docs/SCALING.md and
pinned (with slack) in tests/test_pipeline_memory.py.
"""

import dataclasses
import os
import sys

os.environ.setdefault(
    "XLA_FLAGS",
    "--xla_force_host_platform_device_count=8 "
    "--xla_cpu_enable_concurrency_optimized_scheduler=false")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from clip_finegrained_alignment_tpu.config import (CLIPConfig, MeshConfig,
                                                   TrainConfig)
from clip_finegrained_alignment_tpu.models import clip as m
from clip_finegrained_alignment_tpu.optim.factory import make_optimizer
from clip_finegrained_alignment_tpu.parallel import mesh as pmesh
from clip_finegrained_alignment_tpu.parallel.pipeline import \
    shard_params_pipeline
from clip_finegrained_alignment_tpu.train.engine import make_train_step

CFG = dataclasses.replace(
    CLIPConfig.tiny_test(),
    vision=dataclasses.replace(CLIPConfig.tiny_test().vision, num_layers=4),
    text=dataclasses.replace(CLIPConfig.tiny_test().text, num_layers=4))


def train_cfg(batch, num_micro, remat, pipe=4):
    return TrainConfig(
        clip_model="tiny", batch_size=batch,
        gradient_accumulation_steps=1, lr=1e-3, use_amp=True,
        loss_type="sparc", optimizer_type="adamspd",
        inverse_temperature=0.07, global_negatives=True, remat=remat,
        pipeline_microbatches=num_micro,
        mesh=MeshConfig(data=2, model=1, pipe=pipe))


def batch_shapes(rng, batch):
    v, t = CFG.vision, CFG.text
    ids = rng.integers(1, t.vocab_size - 2,
                       size=(1, batch, t.max_position_embeddings)
                       ).astype(np.int32)
    ids[..., -1] = t.eos_token_id
    return {
        "pixel_values": rng.normal(
            size=(1, batch, v.image_size, v.image_size, 3)
        ).astype(np.float32),
        "input_ids": ids,
    }


def compile_step(batch, remat, num_micro=0, pipelined=True):
    rng = np.random.default_rng(0)
    params = m.init_clip_params(jax.random.key(0), CFG)
    b = batch_shapes(rng, batch)
    if pipelined:
        cfg = train_cfg(batch, num_micro, remat)
        mesh = pmesh.make_mesh(cfg.mesh)
        sp = shard_params_pipeline(params, mesh)
        opt = make_optimizer(cfg, sp,
                             anchor_params=jax.tree.map(jax.numpy.copy, sp))
        so = opt.init(sp)
        sb = pmesh.shard_batch(b, mesh, accum_axis=True)
        step = make_train_step(cfg, CFG, opt, mesh=mesh)
        return step.lower(sp, so, sb).compile()
    cfg = dataclasses.replace(train_cfg(batch, 0, remat),
                              mesh=MeshConfig())
    opt = make_optimizer(cfg, params,
                         anchor_params=jax.tree.map(jax.numpy.copy, params))
    step = make_train_step(cfg, CFG, opt, mesh=None)
    return step.lower(params, opt.init(params), b).compile()


def temp_bytes(compiled):
    ma = compiled.memory_analysis()
    if ma is None:
        raise SystemExit("memory_analysis() unsupported on this backend")
    return int(ma.temp_size_in_bytes)


def main():
    rows = []

    def add(label, **kw):
        tb = temp_bytes(compile_step(**kw))
        rows.append((label, kw.get("batch"), kw.get("num_micro", "-"),
                     str(kw.get("remat")), tb))
        print(f"{label:<34} B={kw.get('batch'):>3} "
              f"M={kw.get('num_micro', '-'):>3} "
              f"remat={str(kw.get('remat')):<5} "
              f"temp={tb / 1e6:8.2f} MB", flush=True)

    # M sweep at fixed global batch (GPipe stores all M microbatches'
    # residuals between forward and reverse wavefront — for fixed B that
    # total is ~M-independent; the per-tick overheads show up here).
    for M in (4, 8, 16):
        add("pp4: M sweep, remat off", batch=16, num_micro=M, remat=False)
    for M in (4, 8, 16):
        add("pp4: M sweep, remat full", batch=16, num_micro=M, remat=True)

    # B sweep at fixed microbatch size b=4 (the honest linear-in-B term:
    # in-flight storage grows with the number of microbatches resident).
    for B, M in ((8, 2), (16, 4), (32, 8)):
        add("pp4: B sweep @ b=4, remat off", batch=B, num_micro=M,
            remat=False)
    for B, M in ((8, 2), (16, 4), (32, 8)):
        add("pp4: B sweep @ b=4, remat full", batch=B, num_micro=M,
            remat=True)

    # Stage relief vs the unpipelined step at the same batch: each stage
    # holds residuals for its own L/K layers only.
    add("single device, remat off", batch=16, remat=False, pipelined=False)
    add("single device, remat full", batch=16, remat=True, pipelined=False)

    with open(os.path.join(os.path.dirname(__file__),
                           "pp_activation_report.log"), "w") as f:
        f.write("label,batch,num_micro,remat,temp_bytes\n")
        for r in rows:
            f.write(",".join(str(x) for x in r) + "\n")
    print("wrote perf/pp_activation_report.log")


if __name__ == "__main__":
    main()
