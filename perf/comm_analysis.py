"""Per-step ICI communication accounting for every parallelism strategy.

The reference's only inter-device traffic is NCCL: DDP's bucketed gradient
allreduce (``/root/reference/finetune/dist_finetuner.py:57``) plus one scalar
``all_gather`` per epoch (:257).  In this framework the partitioner inserts
the collectives, so the ground truth lives in the compiled HLO.  This script
compiles the train step for each supported strategy on the virtual 8-device
CPU mesh (no TPU needed — SPMD partitioning is platform-independent), then
parses the optimized module for collective ops and sums their payload bytes:

    python perf/comm_analysis.py            # tiny model, all 5 strategies

Output: one table row per strategy — collective kind, op count, payload MB —
plus the analytic projection to the production models (ViT-B/16/32, L/14)
documented in docs/SCALING.md.  Payload = sum of result-shape bytes; the
wire traffic of a ring implementation is 2(n-1)/n x payload for all-reduce
and (n-1)/n for all-gather / reduce-scatter.
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

os.environ.setdefault("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clip_finegrained_alignment_tpu.core.xla_flags import \
    ensure_cpu_collective_program_order  # noqa: E402

ensure_cpu_collective_program_order()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from clip_finegrained_alignment_tpu.config import (CLIPConfig,  # noqa: E402
                                                   MeshConfig, TrainConfig)
from clip_finegrained_alignment_tpu.models import clip as m  # noqa: E402
from clip_finegrained_alignment_tpu.optim.factory import \
    make_optimizer  # noqa: E402
from clip_finegrained_alignment_tpu.parallel import mesh as pmesh  # noqa: E402
from clip_finegrained_alignment_tpu.parallel.sharding_rules import (  # noqa: E402,E501
    shard_params, zero1_opt_shardings)
from clip_finegrained_alignment_tpu.train.engine import \
    make_train_step  # noqa: E402

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
                "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1}

# kinds we account; "-start" variants (async) are counted once, their
# "-done" twins carry no new payload.
_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")

_SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|s64|u64|s32|u32|s16|u16|s8|u8|"
                       r"pred)\[([0-9,]*)\]")


def _shape_bytes(text: str) -> int:
    """Sum the bytes of every shape literal in an HLO result type (handles
    tuples: ``(f32[128], bf16[4,8]) all-reduce(...)``)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_stats(hlo_text: str):
    """{kind: (op_count, payload_bytes)} over the optimized module."""
    stats = defaultdict(lambda: [0, 0])
    for line in hlo_text.splitlines():
        stripped = line.strip().lstrip("%")
        if stripped.startswith("ROOT "):
            stripped = stripped[5:].lstrip("%")
        # result side only: "<name> = <type> <kind>(" — count async
        # "-start" ops once; their "-done" twins carry no new payload.
        mm = re.match(r"[\w.\-]+ = (.+?) ([a-z\-]+)\(", stripped)
        if not mm:
            continue
        kind = mm.group(2)
        if kind.endswith("-start"):
            kind = kind[:-6]
        elif kind.endswith("-done"):
            continue
        if kind in _COLLECTIVES:
            stats[kind][0] += 1
            stats[kind][1] += _shape_bytes(mm.group(1))
    return {k: tuple(v) for k, v in stats.items()}


def build(strategy: str, n: int = 8):
    """Return (lowered, label) for one strategy's train step on a tiny
    model (batch 2/device, accum 2 — collective *structure* is batch- and
    width-independent; magnitudes are projected analytically)."""
    model_cfg = CLIPConfig.tiny_test()
    dp, tp, pp = (n // 2, 2, 1) if ("tp" in strategy or "sp" in strategy) \
        else (n, 1, 1)
    if strategy == "dp_tp_pp":
        # Full 3D: TP inside each GPipe stage on a (2, 2, 2) mesh (tiny
        # 2-layer towers = 1 layer/stage); collectives = stage-hop
        # ppermutes + the partitioner's TP all-reduces per stage.
        dp, tp, pp = 2, 2, 2
    elif "pp" in strategy:
        # GPipe pipeline (parallel/pipeline.py): 4 stages x 1 layer on a
        # 4-layer tiny variant; collectives = the stage-hop ppermutes.
        import dataclasses
        dp, tp, pp = n // 4, 1, 4
        model_cfg = dataclasses.replace(
            model_cfg,
            vision=dataclasses.replace(model_cfg.vision, num_layers=4),
            text=dataclasses.replace(model_cfg.text, num_layers=4))
    cfg = TrainConfig(
        clip_model="tiny", loss_type="sparc", optimizer_type="adamspd",
        inverse_temperature=0.07, batch_size=2 * n,
        gradient_accumulation_steps=2, use_amp=False,
        global_negatives=(strategy != "dp_parity"),
        zero1="zero1" in strategy, fsdp="fsdp" in strategy,
        sequence_parallel="sp" in strategy, sp_ring="ring" in strategy,
        mesh=MeshConfig(data=dp, model=tp, pipe=pp))
    mesh = pmesh.make_mesh(cfg.mesh, jax.devices()[:n])
    params = m.init_clip_params(jax.random.key(0), model_cfg)
    psh = None
    if tp > 1 and not cfg.sequence_parallel and pp > 1:
        from clip_finegrained_alignment_tpu.parallel.sharding_rules import \
            shard_params_composed
        params = shard_params_composed(params, mesh)
    elif tp > 1 and not cfg.sequence_parallel:
        params = shard_params(params, mesh)
    elif pp > 1:
        from clip_finegrained_alignment_tpu.parallel.pipeline import \
            shard_params_pipeline
        params = shard_params_pipeline(params, mesh)
    if cfg.fsdp:
        from clip_finegrained_alignment_tpu.parallel.sharding_rules import \
            fsdp_param_shardings
        psh = fsdp_param_shardings(params, mesh)
        params = jax.tree.map(jax.device_put, params, psh)
    opt = make_optimizer(cfg, params,
                         anchor_params=jax.tree.map(jnp.copy, params))
    opt_state = opt.init(params)
    osh = None
    if cfg.zero1:
        osh = zero1_opt_shardings(opt_state, mesh)
        opt_state = jax.tree.map(jax.device_put, opt_state, osh)
    elif cfg.fsdp:
        osh = zero1_opt_shardings(opt_state, mesh)
        opt_state = jax.tree.map(jax.device_put, opt_state, osh)
    step = make_train_step(cfg, model_cfg, opt, mesh=mesh, opt_shardings=osh,
                           param_shardings=psh)

    rng = np.random.default_rng(0)
    v, t = model_cfg.vision, model_cfg.text
    B, accum = cfg.batch_size, cfg.gradient_accumulation_steps
    ids = rng.integers(1, t.vocab_size - 2,
                       size=(accum, B, t.max_position_embeddings)
                       ).astype(np.int32)
    ids[..., -1] = t.eos_token_id
    batch = {
        "pixel_values": rng.standard_normal(
            (accum, B, v.image_size, v.image_size, 3)).astype(np.float32),
        "input_ids": ids,
    }
    batch = pmesh.shard_batch(batch, mesh, accum_axis=True)
    return step.lower(params, opt_state, batch)


STRATEGIES = ("dp_parity", "dp_global", "dp_zero1", "dp_fsdp", "dp_tp",
              "dp_tp_zero1", "dp_pp", "dp_tp_pp", "dp_sp", "dp_sp_ring")


def project(n: int = 8, b_local: int = 64):
    """Analytic projection of the measured collective structure to the
    production models (the docs/SCALING.md table): ring wire traffic per
    chip = 2(n-1)/n x payload for all-reduce, (n-1)/n for all-gather."""
    for name, step_ms in (("ViT-B/16", 252.9), ("ViT-B/32", 218.9),
                          ("ViT-L/14", 1151.0)):
        cfg = CLIPConfig.from_name(name)
        params = m.init_clip_params(jax.random.key(0), cfg)
        pbytes = sum(l.size * 4 for l in jax.tree.leaves(params))
        ring_ar = 2 * (n - 1) / n * pbytes
        ag = (n - 1) / n * pbytes
        v, t = cfg.vision, cfg.text
        s_v = (v.image_size // v.patch_size) ** 2 + 1
        # TP=2: 2 partial-sum all-reduces per layer fwd + 2 bwd, payload =
        # bf16 activations [B_local, S, D]; ring factor at n=2 is x1.
        tp_bytes = 4 * (v.num_layers * b_local * s_v * v.hidden_size * 2
                        + t.num_layers * b_local
                        * t.max_position_embeddings * t.hidden_size * 2)
        print(f"{name}: params {pbytes / 1e6:.0f} MB f32 | DP{n} grad "
              f"all-reduce {ring_ar / 1e9:.2f} GB/chip/step = "
              f"{ring_ar / 1e9 / (step_ms / 1e3):.1f} GB/s | zero1 param "
              f"all-gather +{ag / 1e9:.2f} GB | TP=2 activation "
              f"all-reduces {tp_bytes / 1e9:.2f} GB/step (B_local="
              f"{b_local}, S_v={s_v})")


def main():
    rows = []
    for s in STRATEGIES:
        lowered = build(s)
        hlo = lowered.compile().as_text()
        rows.append((s, collective_stats(hlo)))
        kinds = ", ".join(f"{k}:{c} ({b / 1e6:.3f} MB)"
                          for k, (c, b) in sorted(rows[-1][1].items())) \
            or "none"
        print(f"{s:<14} {kinds}", flush=True)

    print()
    print(f"{'strategy':<14}" + "".join(f"{k:>18}" for k in _COLLECTIVES))
    for s, st in rows:
        print(f"{s:<14}" + "".join(
            f"{st.get(k, (0, 0))[0]:>7}"
            f"{st.get(k, (0, 0))[1] / 1e6:>10.3f} MB"[:18].rjust(11)
            for k in _COLLECTIVES))
    print()
    project()
    return rows


if __name__ == "__main__":
    main()
