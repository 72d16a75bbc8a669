"""Pipeline parallelism (parallel/pipeline.py): GPipe over the ``pipe``
mesh axis must produce the same math as the unpipelined program.

The reference has no pipeline strategy (SURVEY.md §2.2); this is the
beyond-reference third mesh axis, validated the same way TP was — against
single-device oracles on the virtual 8-device CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from clip_finegrained_alignment_tpu.config import (CLIPConfig, MeshConfig,
                                                   TrainConfig)
from clip_finegrained_alignment_tpu.models import clip as m
from clip_finegrained_alignment_tpu.optim.factory import make_optimizer
from clip_finegrained_alignment_tpu.parallel import mesh as pmesh
from clip_finegrained_alignment_tpu.parallel.pipeline import (
    PipelineSpec, default_num_micro, pipeline_param_specs,
    shard_params_pipeline, validate_pipe_divisibility)
from clip_finegrained_alignment_tpu.train.engine import (Trainer,
                                                         make_train_step)

from test_train_engine import CFG, make_batch, tiny_train_config

# 4-layer variant of the tiny config so a 4-stage pipeline has one layer
# per stage (the tiny default is 2 layers).
PP_CFG = dataclasses.replace(
    CFG,
    vision=dataclasses.replace(CFG.vision, num_layers=4),
    text=dataclasses.replace(CFG.text, num_layers=4))


def _pp_mesh(eight_devices, data=2, pipe=4):
    return pmesh.make_mesh(MeshConfig(data=data, model=1, pipe=pipe),
                           eight_devices)


def test_pipeline_param_specs():
    params = m.init_clip_params(jax.random.key(0), PP_CFG)
    specs = pipeline_param_specs(params)
    assert specs["vision"]["layers"]["fc1"]["kernel"] == P("pipe")
    assert specs["text"]["layers"]["ln1"]["scale"] == P("pipe")
    assert specs["text"]["token_embedding"] == P()
    assert specs["logit_scale"] == P()


def test_pipe_divisibility_validation():
    validate_pipe_divisibility(PP_CFG, MeshConfig(pipe=4), batch_size=8)
    with pytest.raises(ValueError, match="not divisible"):
        validate_pipe_divisibility(PP_CFG, MeshConfig(pipe=3), batch_size=8)
    with pytest.raises(ValueError, match="batch_size"):
        validate_pipe_divisibility(PP_CFG, MeshConfig(pipe=4), batch_size=6)
    assert default_num_micro(4) == 8
    assert default_num_micro(4, 2) == 2


def test_pipeline_forward_matches_unpipelined(rng, eight_devices):
    """clip_forward through the 4-stage pipeline == the plain scan encoder
    (forward is per-sample math, so the microbatch split is exact)."""
    mesh = _pp_mesh(eight_devices)
    params = m.init_clip_params(jax.random.key(1), PP_CFG)
    batch = make_batch(rng, 8)
    px = jnp.asarray(batch["pixel_values"])
    ti = jnp.asarray(batch["input_ids"])

    ref = jax.jit(lambda p: m.clip_forward(p, px, ti, PP_CFG,
                                           dtype=jnp.float32))(params)

    spec = PipelineSpec(mesh=mesh, num_micro=4)
    sp = shard_params_pipeline(params, mesh)
    px_sh = jax.device_put(px, pmesh.batch_sharding(mesh))
    ti_sh = jax.device_put(ti, pmesh.batch_sharding(mesh))
    out = jax.jit(lambda p, a, b: m.clip_forward(
        p, a, b, PP_CFG, dtype=jnp.float32, pipeline=spec))(sp, px_sh, ti_sh)

    np.testing.assert_allclose(
        np.asarray(out.vision_last_hidden_state),
        np.asarray(ref.vision_last_hidden_state), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.text_last_hidden_state),
        np.asarray(ref.text_last_hidden_state), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.logits_per_text),
                               np.asarray(ref.logits_per_text),
                               rtol=1e-5, atol=1e-5)


def test_pp_train_step_matches_single_device(rng, eight_devices):
    """Full SPARC+AdamSPD train step on a (2, 1, 4) mesh equals the
    single-device step — the same oracle contract the TP axis carries."""
    cfg = tiny_train_config(global_negatives=True, use_amp=False,
                            loss_type="sparc", optimizer_type="adamspd",
                            gradient_accumulation_steps=2, batch_size=8,
                            mesh=MeshConfig(data=2, model=1, pipe=4))
    params = m.init_clip_params(jax.random.key(3), PP_CFG)
    batch = make_batch(rng, 16, accum=2)

    opt1 = make_optimizer(cfg, params,
                          anchor_params=jax.tree.map(jnp.copy, params))
    step1 = make_train_step(cfg, PP_CFG, opt1, mesh=None)
    p1, _, m1 = step1(jax.tree.map(jnp.copy, params),
                      opt1.init(jax.tree.map(jnp.copy, params)),
                      dict(batch))

    mesh = _pp_mesh(eight_devices)
    sp = shard_params_pipeline(params, mesh)
    opt = make_optimizer(cfg, sp, anchor_params=jax.tree.map(jnp.copy, sp))
    so = opt.init(sp)
    sb = pmesh.shard_batch(dict(batch), mesh, accum_axis=True)
    step_pp = make_train_step(cfg, PP_CFG, opt, mesh=mesh)
    p2, o2, m2 = step_pp(sp, so, sb)

    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m2["total_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]),
                               float(m2["grad_norm"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-5)
    # Steady-state layout: the updated stacked layer leaves must come back
    # stage-sharded over pipe, not silently re-replicated.
    upd_spec = p2["vision"]["layers"]["fc1"]["kernel"].sharding.spec
    assert "pipe" in jax.tree.leaves(tuple(upd_spec)), upd_spec


def test_pp_train_step_bf16(rng, eight_devices):
    """The production-dtype (use_amp=True) pipeline step compiles and
    matches the single-device bf16 oracle. Regression: AD transposes the
    activation pcast into a psum of bf16 cotangents over ``pipe``, and
    XLA:CPU's all-reduce lowering check-fails fatally on bf16 operands
    ('Invalid binary instruction opcode copy') — pipeline.py routes both
    pipe-axis psums through fp32 (exact: one nonzero contributor per
    element)."""
    cfg = tiny_train_config(global_negatives=True, use_amp=True,
                            loss_type="sparc", optimizer_type="adamspd",
                            gradient_accumulation_steps=2, batch_size=8,
                            mesh=MeshConfig(data=2, model=1, pipe=4))
    params = m.init_clip_params(jax.random.key(7), PP_CFG)
    batch = make_batch(rng, 16, accum=2)

    opt1 = make_optimizer(cfg, params,
                          anchor_params=jax.tree.map(jnp.copy, params))
    step1 = make_train_step(cfg, PP_CFG, opt1, mesh=None)
    _, _, m1 = step1(jax.tree.map(jnp.copy, params),
                     opt1.init(jax.tree.map(jnp.copy, params)),
                     dict(batch))

    mesh = _pp_mesh(eight_devices)
    sp = shard_params_pipeline(params, mesh)
    opt = make_optimizer(cfg, sp, anchor_params=jax.tree.map(jnp.copy, sp))
    step_pp = make_train_step(cfg, PP_CFG, opt, mesh=mesh)
    _, _, m2 = step_pp(sp, opt.init(sp),
                       pmesh.shard_batch(dict(batch), mesh, accum_axis=True))

    # bf16 compute reassociates across the microbatch/stage split; loss
    # agrees to bf16 resolution, but the norm of a full bf16 gradient
    # tree is the softest statistic here: measured rel drift vs the
    # oracle is 1.45%-10.3% depending on the data draw and the XLA:CPU
    # codegen regime (the session-scoped rng means suite position picks
    # the draw; backend opt level 0 changed the association). The exact
    # norm-accounting claim (params counted once, stage shards summed
    # right) lives in test_pp_train_step_matches_single_device at fp32
    # rtol 1e-4 — this bound only has to catch structural breakage
    # (double-counted shards = sqrt(2) ≈ +41%, NaN, blow-ups).
    assert np.isfinite(float(m2["total_loss"]))
    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m2["total_loss"]), rtol=1e-3)
    np.testing.assert_allclose(float(m1["grad_norm"]),
                               float(m2["grad_norm"]), rtol=0.15)


def test_pp_count_loss_matches_single_device(rng, eight_devices):
    """The counterfactual count-loss path pipelines the extra [B·N, T]
    text forward too (count_finetuner.py:107-131 semantics)."""
    cfg = tiny_train_config(global_negatives=True, use_amp=False,
                            loss_type="count",
                            gradient_accumulation_steps=1, batch_size=8,
                            mesh=MeshConfig(data=2, model=1, pipe=4))
    params = m.init_clip_params(jax.random.key(5), PP_CFG)
    batch = make_batch(rng, 8, loss_type="count", accum=1)

    opt = make_optimizer(cfg, params)
    step1 = make_train_step(cfg, PP_CFG, opt, mesh=None)
    _, _, m1 = step1(jax.tree.map(jnp.copy, params),
                     opt.init(jax.tree.map(jnp.copy, params)), dict(batch))

    mesh = _pp_mesh(eight_devices)
    sp = shard_params_pipeline(params, mesh)
    so = opt.init(sp)
    sb = pmesh.shard_batch(dict(batch), mesh, accum_axis=True)
    step_pp = make_train_step(cfg, PP_CFG, opt, mesh=mesh)
    _, _, m2 = step_pp(sp, so, sb)

    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m2["total_loss"]), rtol=1e-5)


def test_pp_requires_global_negatives(eight_devices):
    cfg = tiny_train_config(global_negatives=False,
                            mesh=MeshConfig(data=2, model=1, pipe=4))
    params = m.init_clip_params(jax.random.key(0), PP_CFG)
    opt = make_optimizer(cfg, params)
    mesh = _pp_mesh(eight_devices)
    with pytest.raises(ValueError, match="global_negatives"):
        make_train_step(cfg, PP_CFG, opt, mesh=mesh)


def test_pp_rejects_unstacked_layers(eight_devices):
    cfg = tiny_train_config(global_negatives=True, unstack_layers=True,
                            mesh=MeshConfig(data=2, model=1, pipe=4))
    params = m.init_clip_params(jax.random.key(0), PP_CFG)
    opt = make_optimizer(cfg, params)
    mesh = _pp_mesh(eight_devices)
    with pytest.raises(ValueError, match="stacked"):
        make_train_step(cfg, PP_CFG, opt, mesh=mesh)


def test_pp_zero1_opt_specs(eight_devices):
    """ZeRO-1 composed with PP: stacked layer moment leaves carry the pipe
    axis on the layer dim AND the data axis on another dim."""
    from clip_finegrained_alignment_tpu.parallel.sharding_rules import \
        zero1_opt_specs
    cfg = tiny_train_config(global_negatives=True, use_amp=False,
                            optimizer_type="adamspd", zero1=True,
                            mesh=MeshConfig(data=2, model=1, pipe=4))
    mesh = _pp_mesh(eight_devices)
    params = m.init_clip_params(jax.random.key(0), PP_CFG)
    sp = shard_params_pipeline(params, mesh)
    opt = make_optimizer(cfg, sp, anchor_params=jax.tree.map(jnp.copy, sp))
    so = opt.init(sp)
    specs = zero1_opt_specs(so, mesh)
    flat = {jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_flatten_with_path(specs)[0]}
    fc1 = [v for k, v in flat.items()
           if "fc1" in k and "kernel" in k and "anchor" not in k]
    assert fc1, "no fc1 kernel moment leaves found"
    for spec in fc1:
        assert spec[0] == "pipe", spec
        assert "data" in tuple(spec), spec


def test_trainer_with_pp_mesh(rng, eight_devices):
    """Full Trainer on a (2, 1, 2) mesh (tiny model = 2 layers, 2 stages):
    param layout, optimizer inheritance, decreasing loss."""
    cfg = tiny_train_config(
        global_negatives=True, optimizer_type="adamspd", lr=1e-3,
        batch_size=8, gradient_accumulation_steps=1,
        mesh=MeshConfig(data=2, model=1, pipe=2))
    mesh = pmesh.make_mesh(cfg.mesh, eight_devices)
    trainer = Trainer(cfg, mesh=mesh)
    batch = make_batch(rng, 8)
    losses = [float(trainer.step(batch)["total_loss"]) for _ in range(4)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_pp_fsdp_composition_matches_single_device(rng, eight_devices):
    """FSDP over ``data`` composed with GPipe over ``pipe`` on a
    (2, 1, 4) mesh: stacked layer leaves carry BOTH axes (stage dim
    claimed first — sharding_rules.py::fsdp_param_specs), and the step
    still equals single-device math with per-device param bytes
    actually dropping."""
    from clip_finegrained_alignment_tpu.parallel.sharding_rules import (
        fsdp_param_shardings, fsdp_param_specs, zero1_opt_shardings)
    cfg = tiny_train_config(global_negatives=True, use_amp=False,
                            loss_type="sparc", optimizer_type="adamspd",
                            gradient_accumulation_steps=2, batch_size=8,
                            fsdp=True,
                            mesh=MeshConfig(data=2, model=1, pipe=4))
    params = m.init_clip_params(jax.random.key(3), PP_CFG)
    batch = make_batch(rng, 16, accum=2)

    opt1 = make_optimizer(cfg, params,
                          anchor_params=jax.tree.map(jnp.copy, params))
    step1 = make_train_step(cfg, PP_CFG, opt1, mesh=None)
    p1, _, m1 = step1(jax.tree.map(jnp.copy, params),
                      opt1.init(jax.tree.map(jnp.copy, params)),
                      dict(batch))

    mesh = _pp_mesh(eight_devices)
    specs = fsdp_param_specs(params, mesh)
    # Stacked [L, d_in, d_out] layer leaf: stage dim first, data on the
    # largest remaining dim.
    assert tuple(specs["vision"]["layers"]["fc1"]["kernel"])[:1] \
        == ("pipe",), specs["vision"]["layers"]["fc1"]["kernel"]
    assert "data" in tuple(specs["vision"]["layers"]["fc1"]["kernel"])

    psh = fsdp_param_shardings(params, mesh)
    sp = jax.tree.map(jax.device_put, shard_params_pipeline(params, mesh),
                      psh)
    opt = make_optimizer(cfg, sp, anchor_params=jax.tree.map(jnp.copy, sp))
    so = opt.init(sp)
    osh = zero1_opt_shardings(so, mesh)
    so = jax.tree.map(jax.device_put, so, osh)
    step_f = make_train_step(cfg, PP_CFG, opt, mesh=mesh,
                             opt_shardings=osh, param_shardings=psh)
    p2, _, m2 = step_f(sp, so,
                       pmesh.shard_batch(dict(batch), mesh,
                                         accum_axis=True))

    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m2["total_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-5)

    def device0_bytes(tree):
        total = 0
        for leaf in jax.tree.leaves(tree):
            if isinstance(leaf, jax.Array) and leaf.addressable_shards:
                sh = leaf.addressable_shards[0]
                total += int(np.prod(sh.data.shape)) * leaf.dtype.itemsize
        return total

    assert device0_bytes(p2) < 0.5 * device0_bytes(p1), \
        (device0_bytes(p2), device0_bytes(p1))


def test_composed_param_specs_tp_pp(eight_devices):
    """Composed TP x PP layout: stacked layer leaves carry the pipe axis
    on the layer dim AND the Megatron model axis on the weight dim."""
    from clip_finegrained_alignment_tpu.parallel.sharding_rules import \
        composed_param_specs
    mesh = pmesh.make_mesh(MeshConfig(data=2, model=2, pipe=2),
                           eight_devices)
    params = m.init_clip_params(jax.random.key(0), CFG)
    specs = composed_param_specs(params, mesh)
    assert specs["vision"]["layers"]["fc1"]["kernel"] \
        == P("pipe", None, "model")
    assert specs["vision"]["layers"]["out"]["kernel"] \
        == P("pipe", "model", None)
    assert specs["text"]["layers"]["ln1"]["scale"] == P("pipe")
    assert specs["text"]["token_embedding"] == P()
    # megatron_base=False (the model axis is the sequence axis): only
    # the stage dim shards.
    specs_sp = composed_param_specs(params, mesh, megatron_base=False)
    assert specs_sp["vision"]["layers"]["fc1"]["kernel"] == P("pipe")


def test_tp_pp_composition_matches_single_device(rng, eight_devices):
    """Full 3D parallelism: SPARC+AdamSPD train step on a
    (data=2, model=2, pipe=2) mesh — Megatron TP inside each GPipe stage
    (the pipeline shard_map is manual only over ``pipe``, so the
    ``model``-axis weight shardings stay in GSPMD auto mode) — equals the
    single-device oracle, with per-device param bytes dropping ~4x."""
    from clip_finegrained_alignment_tpu.parallel.sharding_rules import \
        shard_params_composed
    cfg = tiny_train_config(global_negatives=True, use_amp=False,
                            loss_type="sparc", optimizer_type="adamspd",
                            inverse_temperature=0.07,
                            gradient_accumulation_steps=2, batch_size=8,
                            mesh=MeshConfig(data=2, model=2, pipe=2))
    params = m.init_clip_params(jax.random.key(5), CFG)
    batch = make_batch(rng, 16, accum=2)

    opt1 = make_optimizer(cfg, params,
                          anchor_params=jax.tree.map(jnp.copy, params))
    step1 = make_train_step(cfg, CFG, opt1, mesh=None)
    p1, _, m1 = step1(jax.tree.map(jnp.copy, params),
                      opt1.init(jax.tree.map(jnp.copy, params)),
                      dict(batch))

    mesh = pmesh.make_mesh(cfg.mesh, eight_devices)
    sp = shard_params_composed(params, mesh)
    opt = make_optimizer(cfg, sp, anchor_params=jax.tree.map(jnp.copy, sp))
    so = opt.init(sp)
    step3d = make_train_step(cfg, CFG, opt, mesh=mesh)
    p2, _, m2 = step3d(sp, so,
                       pmesh.shard_batch(dict(batch), mesh,
                                         accum_axis=True))

    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m2["total_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]),
                               float(m2["grad_norm"]), rtol=2e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-5)
    # Updated layer params keep both mesh axes.
    upd_spec = tuple(p2["vision"]["layers"]["fc1"]["kernel"].sharding.spec)
    flat_axes = [ax for s in upd_spec if s
                 for ax in (s if isinstance(s, tuple) else (s,))]
    assert "pipe" in flat_axes and "model" in flat_axes, upd_spec

    def device0_bytes(tree):
        total = 0
        for leaf in jax.tree.leaves(tree):
            if isinstance(leaf, jax.Array) and leaf.addressable_shards:
                sh = leaf.addressable_shards[0]
                total += int(np.prod(sh.data.shape)) * leaf.dtype.itemsize
        return total

    layer_bytes = lambda p: device0_bytes(
        {"v": p["vision"]["layers"], "t": p["text"]["layers"]})
    assert layer_bytes(p2) < 0.3 * layer_bytes(p1), \
        (layer_bytes(p2), layer_bytes(p1))
