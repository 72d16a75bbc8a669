"""Training-engine tests on the virtual 8-device CPU mesh.

Covers what the reference never tests (SURVEY.md §4): that one SPMD
train_step reproduces single-device math exactly, for every loss type, in
both negative-set modes, with gradient accumulation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clip_finegrained_alignment_tpu.config import (CLIPConfig, MeshConfig,
                                                   TrainConfig)
from clip_finegrained_alignment_tpu.models import clip as m
from clip_finegrained_alignment_tpu.parallel import mesh as pmesh
from clip_finegrained_alignment_tpu.train.engine import (Trainer,
                                                         make_train_step)
from clip_finegrained_alignment_tpu.optim.factory import make_optimizer

CFG = CLIPConfig.tiny_test()


def tiny_train_config(**kw) -> TrainConfig:
    base = dict(clip_model="tiny", batch_size=8,
                gradient_accumulation_steps=2, lr=1e-3, use_amp=False,
                loss_type="clip", max_epochs=1, log_every=1000,
                warmup_steps=0)
    base.update(kw)
    return TrainConfig(**base)


def make_batch(rng, n, loss_type="clip", accum=None):
    v = CFG.vision
    t = CFG.text
    batch = {
        "pixel_values": rng.normal(size=(n, v.image_size, v.image_size, 3)
                                   ).astype(np.float32),
        "input_ids": rng.integers(1, t.vocab_size - 2,
                                  size=(n, t.max_position_embeddings)
                                  ).astype(np.int32),
    }
    # Guarantee an EOS token per row (pooling target).
    batch["input_ids"][:, -1] = t.eos_token_id
    if loss_type == "count":
        cf = rng.integers(1, t.vocab_size - 2,
                          size=(n, 4, t.max_position_embeddings)
                          ).astype(np.int32)
        cf[:, :, -1] = t.eos_token_id
        batch["cf_input_ids"] = cf
    if accum is not None:
        batch = {k: x.reshape((accum, n // accum) + x.shape[1:])
                 for k, x in batch.items()}
    return batch


@pytest.mark.parametrize("loss_type", ["clip", "sparc", "count",
                                       "clip_count"])
def test_single_device_step_runs_and_learns(rng, loss_type):
    cfg = tiny_train_config(loss_type=loss_type,
                            inverse_temperature=0.07 if loss_type == "sparc"
                            else 1.0)
    trainer = Trainer(cfg, mesh=None)
    batch = make_batch(rng, cfg.effective_batch_size, loss_type)
    first = trainer.step(batch)
    assert np.isfinite(float(first["total_loss"]))
    losses = [float(first["total_loss"])]
    for _ in range(5):
        losses.append(float(trainer.step(batch)["total_loss"]))
    # Optimizing the same batch must reduce the loss.
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("optimizer_type", ["adamw", "adamspd"])
def test_optimizers_in_engine(rng, optimizer_type):
    cfg = tiny_train_config(optimizer_type=optimizer_type)
    trainer = Trainer(cfg)
    batch = make_batch(rng, cfg.effective_batch_size)
    metrics = trainer.step(batch)
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["grad_norm"]) > 0


def test_mesh_global_negatives_matches_single_device(rng, eight_devices):
    """jit-over-mesh with global negatives computes the *same* global-batch
    math as one device — sharding must not change the result."""
    cfg = tiny_train_config(global_negatives=True, use_amp=False,
                            gradient_accumulation_steps=1, batch_size=16)
    params = m.init_clip_params(jax.random.key(0), CFG)
    opt = make_optimizer(cfg, params)
    opt_state = opt.init(params)
    batch = make_batch(rng, 16, accum=1)

    step_1dev = make_train_step(cfg, CFG, opt, mesh=None)
    p1, _, m1 = step_1dev(jax.tree.map(jnp.copy, params),
                          jax.tree.map(jnp.copy, opt_state), dict(batch))

    mesh = pmesh.make_mesh(MeshConfig(data=8, model=1), eight_devices)
    step_8dev = make_train_step(cfg, CFG, opt, mesh=mesh)
    pb = pmesh.replicate(params, mesh)
    ob = pmesh.replicate(opt_state, mesh)
    bb = pmesh.shard_batch(dict(batch), mesh, accum_axis=True)
    p8, _, m8 = step_8dev(pb, ob, bb)

    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m8["total_loss"]), rtol=1e-5)
    flat1 = jax.tree.leaves(p1)
    flat8 = jax.tree.leaves(p8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_mesh_local_negatives_matches_per_shard_math(rng, eight_devices):
    """Parity mode (shard_map) must equal the mean over devices of
    single-device grads on each local shard — the DDP allreduce semantics
    (dist_finetuner.py:57)."""
    from clip_finegrained_alignment_tpu.train.engine import compute_loss
    cfg = tiny_train_config(global_negatives=False, use_amp=False,
                            gradient_accumulation_steps=1, batch_size=16,
                            max_grad_norm=0.0)
    params = m.init_clip_params(jax.random.key(1), CFG)
    opt = make_optimizer(cfg, params)
    opt_state = opt.init(params)
    batch = make_batch(rng, 16, accum=1)

    # Expected: average the per-shard losses AND grads computed
    # independently (DDP allreduce = mean; grads-scale regression guard —
    # shard_map's AD psums grads wrt replicated params, so an extra pmean
    # would silently leave them n_devices x too large).
    import optax
    grad_fn = jax.grad(lambda p, mb: compute_loss(p, mb, cfg, CFG,
                                                  dtype=jnp.float32)[0],
                       has_aux=False)
    per_shard, g_mean = [], None
    for d in range(8):
        shard = {k: v[:, d * 2:(d + 1) * 2] for k, v in batch.items()}
        mb = {k: v[0] for k, v in shard.items()}
        loss, _ = compute_loss(params, mb, cfg, CFG, dtype=jnp.float32)
        per_shard.append(float(loss))
        g = jax.tree.map(lambda x: x / 8.0, grad_fn(params, mb))
        g_mean = g if g_mean is None else jax.tree.map(jnp.add, g_mean, g)
    expected = float(np.mean(per_shard))
    expected_gnorm = float(optax.global_norm(g_mean))

    mesh = pmesh.make_mesh(MeshConfig(data=8, model=1), eight_devices)
    step = make_train_step(cfg, CFG, opt, mesh=mesh)
    pb = pmesh.replicate(params, mesh)
    ob = pmesh.replicate(opt_state, mesh)
    bb = pmesh.shard_batch(dict(batch), mesh, accum_axis=True)
    _, _, metrics = step(pb, ob, bb)
    np.testing.assert_allclose(float(metrics["total_loss"]), expected,
                               rtol=1e-5)
    np.testing.assert_allclose(float(metrics["grad_norm"]), expected_gnorm,
                               rtol=1e-4)


@pytest.mark.parametrize("global_negatives", [False, True])
def test_zero1_matches_replicated(rng, eight_devices, global_negatives):
    """ZeRO-1 (optimizer state sharded over the data axis) must produce
    the identical training trajectory as the replicated layout — in both
    negative-set modes — while actually holding ~1/dp of the AdamSPD
    state per device."""
    batch = make_batch(rng, 16)

    def run(zero1):
        cfg = tiny_train_config(optimizer_type="adamspd",
                                gradient_accumulation_steps=1,
                                batch_size=16, zero1=zero1,
                                global_negatives=global_negatives,
                                mesh=MeshConfig(data=8, model=1))
        mesh = pmesh.make_mesh(MeshConfig(data=8, model=1), eight_devices)
        trainer = Trainer(cfg,
                          params=m.init_clip_params(jax.random.key(3), CFG),
                          mesh=mesh)
        for _ in range(3):
            metrics = trainer.step(batch)
        return trainer, metrics

    t_rep, m_rep = run(zero1=False)
    t_z1, m_z1 = run(zero1=True)

    np.testing.assert_allclose(float(m_z1["total_loss"]),
                               float(m_rep["total_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(t_rep.params),
                    jax.tree.leaves(t_z1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)

    def device0_bytes(tree):
        total = 0
        for leaf in jax.tree.leaves(tree):
            if isinstance(leaf, jax.Array) and leaf.addressable_shards:
                sh = leaf.addressable_shards[0]
                total += int(np.prod(sh.data.shape)) * leaf.dtype.itemsize
        return total

    rep_bytes = device0_bytes(t_rep.opt_state)
    z1_bytes = device0_bytes(t_z1.opt_state)
    # mu + nu + anchor all shard; a handful of non-divisible leaves
    # (e.g. [L]-leading stacks of odd dims) may stay replicated.
    assert z1_bytes < 0.3 * rep_bytes, (z1_bytes, rep_bytes)


def test_fsdp_matches_replicated(rng, eight_devices):
    """FSDP/ZeRO-3 (params data-axis-sharded, optimizer state inheriting
    the layout) must produce the identical training trajectory as the
    replicated layout while actually holding ~1/dp of params AND state
    per device — one step past ZeRO-1 (sharding_rules.py::
    fsdp_param_specs)."""
    batch = make_batch(rng, 16)

    def run(fsdp):
        cfg = tiny_train_config(optimizer_type="adamspd",
                                gradient_accumulation_steps=1,
                                batch_size=16, fsdp=fsdp,
                                global_negatives=True,
                                mesh=MeshConfig(data=8, model=1))
        mesh = pmesh.make_mesh(MeshConfig(data=8, model=1), eight_devices)
        trainer = Trainer(cfg,
                          params=m.init_clip_params(jax.random.key(3), CFG),
                          mesh=mesh)
        for _ in range(3):
            metrics = trainer.step(batch)
        return trainer, metrics

    t_rep, m_rep = run(fsdp=False)
    t_f, m_f = run(fsdp=True)

    np.testing.assert_allclose(float(m_f["total_loss"]),
                               float(m_rep["total_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(t_rep.params),
                    jax.tree.leaves(t_f.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)

    def device0_bytes(tree):
        total = 0
        for leaf in jax.tree.leaves(tree):
            if isinstance(leaf, jax.Array) and leaf.addressable_shards:
                sh = leaf.addressable_shards[0]
                total += int(np.prod(sh.data.shape)) * leaf.dtype.itemsize
        return total

    # Params AND optimizer state both drop (vs ZeRO-1, which only moves
    # the state); a handful of non-divisible leaves stay replicated.
    assert device0_bytes(t_f.params) < 0.3 * device0_bytes(t_rep.params)
    assert device0_bytes(t_f.opt_state) < 0.3 * device0_bytes(t_rep.opt_state)
    # Steady state: updated params keep the data-sharded layout.
    spec = t_f.params["vision"]["layers"]["fc1"]["kernel"].sharding.spec
    assert "data" in jax.tree.leaves(tuple(spec)), spec


def test_fsdp_validation_errors(eight_devices):
    from clip_finegrained_alignment_tpu.train.engine import make_train_step
    from clip_finegrained_alignment_tpu.optim.factory import make_optimizer
    mesh = pmesh.make_mesh(MeshConfig(data=8, model=1), eight_devices)
    params = m.init_clip_params(jax.random.key(0), CFG)
    opt = make_optimizer(tiny_train_config(), params)
    for kw, msg in (
            (dict(fsdp=True, global_negatives=False), "global_negatives"),
            (dict(fsdp=True, global_negatives=True, zero1=True),
             "subsumes"),
            (dict(fsdp=True, global_negatives=True, unstack_layers=True),
             "stacked")):
        with pytest.raises(ValueError, match=msg):
            make_train_step(tiny_train_config(**kw), CFG, opt, mesh=mesh)


def test_grad_accum_equals_fused_mean(rng):
    """accum=4 microbatch grads must equal the mean of the four separate
    per-microbatch grads (the reference's loss/accum scaling,
    finetuner.py:145)."""
    from clip_finegrained_alignment_tpu.train.engine import (
        _accumulated_grads, compute_loss)
    cfg = tiny_train_config(gradient_accumulation_steps=4, batch_size=4)
    params = m.init_clip_params(jax.random.key(2), CFG)
    batch = make_batch(rng, 16, accum=4)

    grads, _ = _accumulated_grads(params, batch, cfg, CFG, jnp.float32)

    grad_fn = jax.grad(lambda p, mb: compute_loss(p, mb, cfg, CFG,
                                                  dtype=jnp.float32)[0])
    expected = None
    for i in range(4):
        g = grad_fn(params, {k: v[i] for k, v in batch.items()})
        expected = g if expected is None else jax.tree.map(jnp.add,
                                                           expected, g)
    expected = jax.tree.map(lambda x: x / 4.0, expected)
    # atol covers fp32 summation-order noise on near-zero elements: XLA may
    # fuse the scan accumulation differently across compile sessions (the
    # full-suite run once produced a 1.4e-6 abs diff on a ~1e-3 element).
    for a, b in zip(jax.tree.leaves(grads), jax.tree.leaves(expected)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_bf16_compute_path_runs(rng):
    cfg = tiny_train_config(use_amp=True)
    trainer = Trainer(cfg)
    metrics = trainer.step(make_batch(rng, cfg.effective_batch_size))
    assert np.isfinite(float(metrics["total_loss"]))
    # Master params stay fp32 under bf16 compute.
    assert all(x.dtype == jnp.float32
               for x in jax.tree.leaves(trainer.params))


def test_checkpoint_roundtrip(rng, tmp_path):
    from clip_finegrained_alignment_tpu.train.checkpoint import \
        CheckpointManager
    cfg = tiny_train_config()
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_every=1)
    trainer = Trainer(cfg, checkpoint_manager=mgr)
    batch = make_batch(rng, cfg.effective_batch_size)

    result = trainer.train(lambda epoch: [batch, batch], num_epochs=1)
    assert result["global_step"] == 2

    like = {"params": trainer.params, "opt_state": trainer.opt_state}
    state, meta = mgr.restore("best", like=like, config=cfg)
    assert meta["global_step"] == 2
    for a, b in zip(jax.tree.leaves(state["params"]),
                    jax.tree.leaves(trainer.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Config drift warning (parity with finetuner.py:249-254).
    import warnings as w
    drifted = tiny_train_config(lr=5e-4)
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        mgr.restore("best", like=like, config=drifted)
    assert any("mismatch" in str(r.message) for r in rec)


def test_epoch_permutation_and_shard_bounds():
    p0 = pmesh.epoch_permutation(100, epoch=0)
    p1 = pmesh.epoch_permutation(100, epoch=1)
    assert not np.array_equal(p0, p1)
    assert np.array_equal(p0, pmesh.epoch_permutation(100, epoch=0))
    s, e = pmesh.process_shard_bounds(100, process_index=3, process_count=4)
    assert (s, e) == (75, 100)


def test_clip_count_grouped_path(rng):
    """clip_count with explicit count groups ([B, G, T] captions: slot 0
    positive + G-1 counterfactual negatives) — the generalized form of the
    reference's degenerate G==1 shape (losses.py:120-124)."""
    from clip_finegrained_alignment_tpu.train.engine import compute_loss
    cfg = tiny_train_config(loss_type="clip_count", count_alpha=0.7)
    params = m.init_clip_params(jax.random.key(4), CFG)
    t = CFG.text
    batch = make_batch(rng, 4)
    group = rng.integers(1, t.vocab_size - 2,
                         size=(4, 3, t.max_position_embeddings)
                         ).astype(np.int32)
    group[..., -1] = t.eos_token_id
    batch["group_input_ids"] = group
    loss, losses = compute_loss(params, batch, cfg, CFG,
                                dtype=jnp.float32)
    assert np.isfinite(float(loss))
    assert float(losses["count_loss"]) != 0.0  # grouped term active
    # without groups the count term is exactly 0 (reference degenerate)
    del batch["group_input_ids"]
    _, losses0 = compute_loss(params, batch, cfg, CFG, dtype=jnp.float32)
    assert float(losses0["count_loss"]) == 0.0


def test_async_checkpoint_roundtrip(rng, tmp_path):
    from clip_finegrained_alignment_tpu.train.checkpoint import \
        CheckpointManager
    cfg = tiny_train_config()
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_every=1,
                            async_save=True)
    trainer = Trainer(cfg, checkpoint_manager=mgr)
    batch = make_batch(rng, cfg.effective_batch_size)
    trainer.train(lambda epoch: [batch], num_epochs=1)
    mgr.wait()
    like = {"params": trainer.params, "opt_state": trainer.opt_state}
    state, meta = mgr.restore("best", like=like)
    assert meta["global_step"] == 1
    for a, b in zip(jax.tree.leaves(state["params"]),
                    jax.tree.leaves(trainer.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unstacked_layers_equals_stacked(rng):
    """The unstack_layers perf layout (per-layer param leaves, straight-
    line encoder loop, per-leaf AdamSPD) must reproduce the stacked
    lax.scan layout's training step exactly, and its checkpoints must
    convert to/from the canonical stacked format losslessly."""
    from clip_finegrained_alignment_tpu.optim.factory import \
        stacked_layer_mask

    cfg_s = tiny_train_config(loss_type="sparc", inverse_temperature=0.07,
                              optimizer_type="adamspd")
    cfg_u = tiny_train_config(loss_type="sparc", inverse_temperature=0.07,
                              optimizer_type="adamspd", unstack_layers=True)
    t_s = Trainer(cfg_s, mesh=None)
    t_u = Trainer(cfg_u, mesh=None)

    # Unstacked trees carry no stacked leaves for AdamSPD.
    mask = stacked_layer_mask(t_u.params)
    assert not any(jax.tree.leaves(mask))
    assert any(jax.tree.leaves(stacked_layer_mask(t_s.params)))

    batch = make_batch(rng, cfg_s.effective_batch_size, "sparc")
    for step in range(3):
        m_s = t_s.step(batch)
        m_u = t_u.step(batch)
        np.testing.assert_allclose(float(m_s["total_loss"]),
                                   float(m_u["total_loss"]),
                                   rtol=1e-5, err_msg=f"step {step}")

    ck_u, ck_opt_u = t_u.to_checkpoint_format()
    for a, b in zip(jax.tree.leaves(ck_u), jax.tree.leaves(t_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    assert jax.tree.structure(ck_u) == jax.tree.structure(t_s.params)
    assert jax.tree.structure(ck_opt_u) == jax.tree.structure(t_s.opt_state)
    # Shapes too — the stacked checkpoint format must be byte-compatible
    # across the knob (a degenerate nu_max placeholder tree once converted
    # per-layer scalars to [L] arrays here).
    for a, b in zip(jax.tree.leaves(ck_opt_u),
                    jax.tree.leaves(t_s.opt_state)):
        assert jnp.shape(a) == jnp.shape(b), (jnp.shape(a), jnp.shape(b))

    # Roundtrip back to the runtime layout.
    before = jax.tree.leaves(t_u.params)
    t_u.from_checkpoint_format(ck_u, ck_opt_u)
    for a, b in zip(before, jax.tree.leaves(t_u.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_legacy_nu_max_checkpoint_migration(rng, tmp_path):
    """Pre-round-2 checkpoints stored AdamSPD's amsgrad-off nu_max as a
    params-like tree of scalar zeros; restore must detect the legacy
    layout, collapse it to the current scalar placeholder, and warn
    (train/checkpoint.py::_legacy_nu_max_like)."""
    from clip_finegrained_alignment_tpu.train.checkpoint import (
        CheckpointManager, _map_adamspd_states)

    cfg = tiny_train_config(optimizer_type="adamspd")
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_every=1)
    trainer = Trainer(cfg, checkpoint_manager=mgr)
    batch = make_batch(rng, cfg.effective_batch_size)
    trainer.train(lambda epoch: [batch], num_epochs=1)

    # Synthesize the legacy on-disk layout: per-leaf scalar nu_max.
    def to_legacy(state):
        assert jnp.shape(state.nu_max) == ()  # current scalar placeholder
        return state._replace(nu_max=jax.tree.map(
            lambda _: jnp.zeros([], jnp.float32), state.mu))
    legacy_opt = _map_adamspd_states(to_legacy, trainer.opt_state)
    mgr.save(epoch=1, params=trainer.params, opt_state=legacy_opt,
             global_step=2, best_loss=0.0, avg_loss=0.0, is_best=True,
             config=cfg)

    like = {"params": trainer.params, "opt_state": trainer.opt_state}
    import warnings as w
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        state, meta = mgr.restore("best", like=like)
    assert any("legacy" in str(r.message) for r in rec)
    assert meta["global_step"] == 2
    # Restored tree matches the CURRENT layout exactly (scalar nu_max).
    assert (jax.tree.structure(state["opt_state"])
            == jax.tree.structure(trainer.opt_state))
    for a, b in zip(jax.tree.leaves(state["params"]),
                    jax.tree.leaves(trainer.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_missing_meta_raises(rng, tmp_path):
    """meta.json is written by process 0 only; a visible step dir without
    it means a non-shared checkpoint FS — restore must fail loudly instead
    of silently resetting global_step (advisor finding)."""
    import os
    import pytest
    from clip_finegrained_alignment_tpu.train.checkpoint import \
        CheckpointManager

    cfg = tiny_train_config()
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_every=1)
    trainer = Trainer(cfg, checkpoint_manager=mgr)
    batch = make_batch(rng, cfg.effective_batch_size)
    trainer.train(lambda epoch: [batch], num_epochs=1)
    os.remove(str(tmp_path / "ckpt" / "best" / "meta.json"))
    like = {"params": trainer.params, "opt_state": trainer.opt_state}
    with pytest.raises(RuntimeError, match="meta.json"):
        mgr.restore("best", like=like)


@pytest.mark.parametrize("quant", ["switchback", "int8"])
def test_quant_trajectory_tracks_bf16(rng, quant):
    """Int8 quantized training (ops/quant.py) must optimize the same
    objective: loss decreases, stays finite, and tracks the exact-path
    trajectory within the quantization-noise bound. (The tiny test model's
    K=32 projections make the absmax grid relatively coarser than the
    production D=768, so the bound here is loose; the production-shape
    error bound is pinned in tests/test_quant.py.)"""
    def run(q):
        cfg = tiny_train_config(loss_type="sparc", inverse_temperature=0.07,
                                optimizer_type="adamspd", quant=q)
        trainer = Trainer(cfg, mesh=None)
        batch = make_batch(rng_for_run, cfg.effective_batch_size, "sparc")
        return [float(trainer.step(batch)["total_loss"]) for _ in range(6)]

    rng_for_run = np.random.default_rng(7)
    exact = run("none")
    rng_for_run = np.random.default_rng(7)   # same data for both runs
    quantized = run(quant)

    assert all(np.isfinite(quantized))
    assert quantized[-1] < quantized[0]          # optimizes
    for e, q in zip(exact, quantized):           # tracks the exact path
        assert abs(q - e) < 0.25 * abs(e) + 0.05


# ---------------------------------------------------------------------------
# Preemption: SIGTERM-safe emergency checkpoint + step-exact resume
# ---------------------------------------------------------------------------

def test_preempt_saves_and_resume_is_step_exact(rng, tmp_path):
    """request_preempt() stops at the next step boundary with a committed
    preempt/ checkpoint; restoring it and replaying the remaining batches
    reproduces the uninterrupted trajectory bit-for-bit (the recovery
    story the reference lacks — SURVEY §5 'recovery is manual')."""
    from clip_finegrained_alignment_tpu.train.checkpoint import \
        CheckpointManager
    cfg = tiny_train_config(gradient_accumulation_steps=1, batch_size=8,
                            optimizer_type="adamspd")
    batches = [make_batch(rng, 8) for _ in range(4)]
    init = m.init_clip_params(jax.random.key(9), CFG)

    # Uninterrupted 4-step run.
    t_full = Trainer(cfg, params=jax.tree.map(jnp.copy, init))
    for b in batches:
        t_full.step(b)

    # Interrupted run: preempt lands during step 3.
    mgr = CheckpointManager(str(tmp_path / "ck"), save_every=1)
    t_pre = Trainer(cfg, params=jax.tree.map(jnp.copy, init),
                    checkpoint_manager=mgr)

    def gen(epoch):
        for i, b in enumerate(batches):
            if i == 2:
                # Set while producing batch 2: the loop steps on it, sees
                # the flag at the step boundary, and never pulls batch 3.
                t_pre.request_preempt()
            yield b

    result = t_pre.train(gen, num_epochs=1)
    assert result["preempted"] is True
    assert result["global_step"] == 3  # stopped at the step boundary

    import json
    import os
    meta = json.loads(open(os.path.join(str(tmp_path / "ck"), "preempt",
                                        "meta.json")).read())
    assert meta["preempted"] is True and meta["global_step"] == 3

    # Step-exact resume: restore + replay only the remaining batch.
    t_res = Trainer(cfg, params=m.init_clip_params(jax.random.key(1), CFG),
                    checkpoint_manager=mgr)
    ck_params, ck_opt = t_res.to_checkpoint_format()
    state, meta2 = mgr.restore("preempt",
                               like={"params": ck_params,
                                     "opt_state": ck_opt})
    t_res.from_checkpoint_format(state["params"], state["opt_state"])
    t_res.global_step = meta2["global_step"]
    t_res.step(batches[3])

    for a, b in zip(jax.tree.leaves(t_full.params),
                    jax.tree.leaves(t_res.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("layout", ["zero1", "fsdp", "tp"])
def test_preempt_resume_preserves_sharded_state(rng, tmp_path,
                                                eight_devices, layout):
    """Step-exact preempt/resume under the SHARDED state layouts: a
    preempt checkpoint written from a ZeRO-1 / FSDP / TP run must restore
    bit-exactly AND land back on the sharded runtime placement (the
    replicated-layout guarantee of
    ``test_preempt_saves_and_resume_is_step_exact``, extended to the
    layouts where naive restore could silently re-replicate 4x AdamSPD
    state — the failure mode the reference's manual recovery invites,
    dist_finetuner.py:313-347)."""
    from clip_finegrained_alignment_tpu.train.checkpoint import \
        CheckpointManager

    mesh_cfg = MeshConfig(data=4, model=2) if layout == "tp" \
        else MeshConfig(data=8, model=1)
    kw = dict(zero1=(layout == "zero1"), fsdp=(layout == "fsdp"),
              global_negatives=True, optimizer_type="adamspd",
              gradient_accumulation_steps=1, batch_size=16, mesh=mesh_cfg)
    cfg = tiny_train_config(**kw)
    batches = [make_batch(rng, 16) for _ in range(4)]
    init = m.init_clip_params(jax.random.key(11), CFG)

    def mk(ck_mgr=None):
        mesh = pmesh.make_mesh(mesh_cfg, eight_devices)
        return Trainer(cfg, params=jax.tree.map(jnp.copy, init), mesh=mesh,
                       checkpoint_manager=ck_mgr)

    # Uninterrupted 4-step run = the oracle trajectory.
    t_full = mk()
    for b in batches:
        t_full.step(b)

    # Interrupted run: preempt lands during step 3.
    mgr = CheckpointManager(str(tmp_path / "ck"), save_every=1)
    t_pre = mk(mgr)

    def gen(epoch):
        for i, b in enumerate(batches):
            if i == 2:
                t_pre.request_preempt()
            yield b

    result = t_pre.train(gen, num_epochs=1, log_fn=None)
    assert result["preempted"] is True and result["global_step"] == 3

    # Restore into a FRESH trainer (fresh mesh arrays, garbage init) and
    # replay only the remaining batch.
    t_res = mk(mgr)
    ck_params, ck_opt = t_res.to_checkpoint_format()
    state, meta = mgr.restore("preempt", like={"params": ck_params,
                                               "opt_state": ck_opt})
    t_res.from_checkpoint_format(state["params"], state["opt_state"])
    t_res.global_step = meta["global_step"]
    t_res.step(batches[3])

    for a, b in zip(jax.tree.leaves(t_full.params),
                    jax.tree.leaves(t_res.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)

    # The restored runtime state must be back on the sharded placement,
    # not silently re-replicated.
    def device0_bytes(tree):
        total = 0
        for leaf in jax.tree.leaves(tree):
            if isinstance(leaf, jax.Array) and leaf.addressable_shards:
                sh = leaf.addressable_shards[0]
                total += int(np.prod(sh.data.shape)) * leaf.dtype.itemsize
        return total

    if layout == "zero1":
        assert device0_bytes(t_res.opt_state) \
            < 0.3 * device0_bytes(t_res.params) * 4
        spec = jax.tree.leaves(
            t_res.opt_state, is_leaf=lambda x: isinstance(x, jax.Array))
        assert any("data" in jax.tree.leaves(tuple(x.sharding.spec))
                   for x in spec if isinstance(x, jax.Array))
    elif layout == "fsdp":
        spec = t_res.params["vision"]["layers"]["fc1"]["kernel"] \
            .sharding.spec
        assert "data" in jax.tree.leaves(tuple(spec)), spec
    else:  # tp: Megatron weight-dim sharding over `model` survives
        spec = t_res.params["vision"]["layers"]["fc1"]["kernel"] \
            .sharding.spec
        assert "model" in jax.tree.leaves(tuple(spec)), spec


def test_preemption_handler_wires_sigterm():
    import signal

    from clip_finegrained_alignment_tpu.train.engine import \
        install_preemption_handler

    calls = []
    prev = signal.getsignal(signal.SIGTERM)
    try:
        signal.signal(signal.SIGTERM, lambda s, f: calls.append("prev"))
        trainer = type("T", (), {"request_preempt":
                                 lambda self: calls.append("preempt")})()
        install_preemption_handler(trainer)
        signal.raise_signal(signal.SIGTERM)
        assert calls == ["preempt", "prev"]  # chained to the old handler
    finally:
        signal.signal(signal.SIGTERM, prev)
