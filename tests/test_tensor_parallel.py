"""Tensor-parallel sharding rules: a 4x2 (data, model) mesh must produce
the same training math as one device."""

import jax
import jax.numpy as jnp
import numpy as np

from clip_finegrained_alignment_tpu.config import (CLIPConfig, MeshConfig,
                                                   TrainConfig)
from clip_finegrained_alignment_tpu.models import clip as m
from clip_finegrained_alignment_tpu.optim.factory import make_optimizer
from clip_finegrained_alignment_tpu.parallel import mesh as pmesh
from clip_finegrained_alignment_tpu.parallel.sharding_rules import (
    param_specs, shard_params, validate_tp_divisibility)
from clip_finegrained_alignment_tpu.train.engine import make_train_step

from test_train_engine import CFG, make_batch, tiny_train_config

import pytest


def test_param_specs_shapes():
    params = m.init_clip_params(jax.random.key(0), CFG)
    specs = param_specs(params)
    from jax.sharding import PartitionSpec as P
    assert specs["vision"]["layers"]["fc1"]["kernel"] == \
        P(None, None, "model")
    assert specs["vision"]["layers"]["fc2"]["kernel"] == \
        P(None, "model", None)
    assert specs["vision"]["layers"]["out"]["kernel"] == \
        P(None, "model", None)
    assert specs["text"]["token_embedding"] == P()
    assert specs["logit_scale"] == P()


def test_tp_divisibility_validation(eight_devices):
    mesh = pmesh.make_mesh(MeshConfig(data=2, model=4), eight_devices)
    # tiny config: heads=2, hidden=32 -> q kernel [L, 32, 32]: 32 % 4 == 0 OK
    params = m.init_clip_params(jax.random.key(0), CFG)
    validate_tp_divisibility(params, mesh)  # no raise
    # a bad shape trips the validator
    bad = dict(params)
    bad["vision"] = dict(params["vision"])
    bad["vision"]["layers"] = jax.tree.map(lambda x: x,
                                           params["vision"]["layers"])
    bad["vision"]["layers"] = dict(bad["vision"]["layers"])
    bad["vision"]["layers"]["fc1"] = {
        "kernel": jnp.zeros((2, 32, 66)), "bias": jnp.zeros((2, 66))}
    with pytest.raises(ValueError, match="divisibility"):
        validate_tp_divisibility(bad, mesh)


def test_tp_train_step_matches_single_device(rng, eight_devices):
    cfg = tiny_train_config(global_negatives=True, use_amp=False,
                            gradient_accumulation_steps=1, batch_size=8,
                            mesh=MeshConfig(data=4, model=2))
    params = m.init_clip_params(jax.random.key(3), CFG)
    opt = make_optimizer(cfg, params)
    batch = make_batch(rng, 8, accum=1)

    step1 = make_train_step(cfg, CFG, opt, mesh=None)
    p1, _, m1 = step1(jax.tree.map(jnp.copy, params),
                      opt.init(jax.tree.map(jnp.copy, params)),
                      dict(batch))

    mesh = pmesh.make_mesh(cfg.mesh, eight_devices)
    sp = shard_params(params, mesh)
    so = opt.init(sp)
    sb = pmesh.shard_batch(dict(batch), mesh, accum_axis=True)
    step_tp = make_train_step(cfg, CFG, opt, mesh=mesh)
    p2, _, m2 = step_tp(sp, so, sb)

    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m2["total_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-5)


def test_tp_zero1_composition_matches_single_device(rng, eight_devices):
    """ZeRO-1 over data composed with Megatron TP over model: each opt
    state leaf carries BOTH axes where divisible, and the (4, 2) mesh
    step still equals single-device math."""
    from clip_finegrained_alignment_tpu.parallel.sharding_rules import \
        zero1_opt_shardings, zero1_opt_specs
    cfg = tiny_train_config(global_negatives=True, use_amp=False,
                            optimizer_type="adamspd", zero1=True,
                            gradient_accumulation_steps=1, batch_size=8,
                            mesh=MeshConfig(data=4, model=2))
    params = m.init_clip_params(jax.random.key(3), CFG)
    batch = make_batch(rng, 8, accum=1)

    # The train step donates (params, opt_state); each run therefore gets
    # its own optimizer with its own anchor copy (AdamSPD embeds the
    # anchor arrays in the state by reference).
    opt1 = make_optimizer(cfg, params,
                          anchor_params=jax.tree.map(jnp.copy, params))
    step1 = make_train_step(cfg, CFG, opt1, mesh=None)
    p1, _, m1 = step1(jax.tree.map(jnp.copy, params),
                      opt1.init(jax.tree.map(jnp.copy, params)),
                      dict(batch))

    mesh = pmesh.make_mesh(cfg.mesh, eight_devices)
    sp = shard_params(params, mesh)
    opt = make_optimizer(cfg, sp,
                         anchor_params=jax.tree.map(jnp.copy, sp))
    so = opt.init(sp)
    osh = zero1_opt_shardings(so, mesh)
    # Composition sanity: a TP-column-sharded fc1 moment leaf must carry
    # both mesh axes ([L, D, F]: F on model from the TP rule, D on data
    # from ZeRO-1).
    from jax.sharding import PartitionSpec as P
    specs = zero1_opt_specs(so, mesh)
    flat = {jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_flatten_with_path(specs)[0]}
    fc1 = [v for k, v in flat.items() if "fc1" in k and "kernel" in k]
    assert fc1 and all(spec == P(None, "data", "model") for spec in fc1), fc1
    so = jax.tree.map(jax.device_put, so, osh)
    sb = pmesh.shard_batch(dict(batch), mesh, accum_axis=True)
    step_tpz = make_train_step(cfg, CFG, opt, mesh=mesh, opt_shardings=osh)
    p2, _, m2 = step_tpz(sp, so, sb)

    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m2["total_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-5)


def test_tp_fsdp_composition_matches_single_device(rng, eight_devices):
    """FSDP over data composed with Megatron TP over model: each PARAM
    leaf carries BOTH axes where divisible (sharding_rules.py::
    fsdp_param_specs claims the TP dims first), and the (4, 2) mesh step
    still equals single-device math."""
    from clip_finegrained_alignment_tpu.parallel.sharding_rules import (
        fsdp_param_shardings, fsdp_param_specs, zero1_opt_shardings)
    cfg = tiny_train_config(global_negatives=True, use_amp=False,
                            optimizer_type="adamspd", fsdp=True,
                            gradient_accumulation_steps=1, batch_size=8,
                            mesh=MeshConfig(data=4, model=2))
    params = m.init_clip_params(jax.random.key(4), CFG)
    batch = make_batch(rng, 8, accum=1)

    opt1 = make_optimizer(cfg, params,
                          anchor_params=jax.tree.map(jnp.copy, params))
    step1 = make_train_step(cfg, CFG, opt1, mesh=None)
    p1, _, m1 = step1(jax.tree.map(jnp.copy, params),
                      opt1.init(jax.tree.map(jnp.copy, params)),
                      dict(batch))

    mesh = pmesh.make_mesh(cfg.mesh, eight_devices)
    from jax.sharding import PartitionSpec as P
    specs = fsdp_param_specs(params, mesh)
    assert specs["vision"]["layers"]["fc1"]["kernel"] \
        == P(None, "data", "model"), specs["vision"]["layers"]["fc1"]
    psh = fsdp_param_shardings(params, mesh)
    sp = jax.tree.map(jax.device_put, params, psh)
    opt = make_optimizer(cfg, sp,
                         anchor_params=jax.tree.map(jnp.copy, sp))
    so = opt.init(sp)
    osh = zero1_opt_shardings(so, mesh)
    so = jax.tree.map(jax.device_put, so, osh)
    step_f = make_train_step(cfg, CFG, opt, mesh=mesh, opt_shardings=osh,
                             param_shardings=psh)
    p2, _, m2 = step_f(sp, so,
                       pmesh.shard_batch(dict(batch), mesh,
                                         accum_axis=True))

    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m2["total_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-5)


def test_tp_requires_global_negatives(eight_devices):
    cfg = tiny_train_config(global_negatives=False,
                            mesh=MeshConfig(data=4, model=2))
    params = m.init_clip_params(jax.random.key(0), CFG)
    opt = make_optimizer(cfg, params)
    mesh = pmesh.make_mesh(cfg.mesh, eight_devices)
    with pytest.raises(ValueError, match="global_negatives"):
        make_train_step(cfg, CFG, opt, mesh=mesh)


def test_tp_checkpoint_roundtrip(rng, eight_devices, tmp_path):
    """TP-sharded params save (gathered on host) and restore to the same
    values — the checkpoint layer must be sharding-agnostic."""
    from clip_finegrained_alignment_tpu.train.checkpoint import \
        CheckpointManager
    mesh = pmesh.make_mesh(MeshConfig(data=4, model=2), eight_devices)
    params = m.init_clip_params(jax.random.key(7), CFG)
    sharded = shard_params(params, mesh)
    mgr = CheckpointManager(str(tmp_path / "tp_ckpt"), save_every=1)
    mgr.save(epoch=0, params=sharded, opt_state={"dummy": jnp.zeros(3)},
             global_step=1, best_loss=1.0, avg_loss=1.0, is_best=True,
             config=None)
    like = {"params": params, "opt_state": {"dummy": jnp.zeros(3)}}
    state, meta = mgr.restore("best", like=like)
    for a, b in zip(jax.tree.leaves(state["params"]),
                    jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_with_tp_mesh(rng, eight_devices):
    """Full Trainer construction + steps on a (4, 2) mesh: param layout,
    anchor/optimizer-state sharding inheritance, and loss decrease."""
    from clip_finegrained_alignment_tpu.train.engine import Trainer
    cfg = tiny_train_config(
        global_negatives=True, optimizer_type="adamspd", lr=1e-3,
        batch_size=8, gradient_accumulation_steps=1,
        mesh=MeshConfig(data=4, model=2))
    mesh = pmesh.make_mesh(cfg.mesh, eight_devices)
    trainer = Trainer(cfg, mesh=mesh)
    batch = make_batch(rng, 8)
    losses = [float(trainer.step(batch)["total_loss"]) for _ in range(4)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
