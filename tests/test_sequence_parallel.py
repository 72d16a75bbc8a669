"""Sequence/context parallelism (parallel/sequence.py): the model mesh
axis sharding the TOKEN dim must reproduce single-device math exactly —
both the GSPMD-constraint mode and the manual ring-attention collective.

The reference has no sequence parallelism and none is needed for parity
(SURVEY.md §2.2: 77 text tokens / 50-577 patches); these tests pin the
long-context insurance the framework adds on top.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_finegrained_alignment_tpu.config import (CLIPConfig, MeshConfig,
                                                   TrainConfig)
from clip_finegrained_alignment_tpu.models import clip as m
from clip_finegrained_alignment_tpu.models.clip import (_xla_attention_bshd,
                                                        _text_attention_bias)
from clip_finegrained_alignment_tpu.optim.factory import make_optimizer
from clip_finegrained_alignment_tpu.parallel import mesh as pmesh
from clip_finegrained_alignment_tpu.parallel.sequence import (
    SeqParallelSpec, ring_attention)
from clip_finegrained_alignment_tpu.train.engine import make_train_step

from test_train_engine import CFG, make_batch, tiny_train_config


def _sp_mesh(devices, sp=4):
    return pmesh.make_mesh(MeshConfig(data=len(devices) // sp, model=sp),
                           devices)


# ---------------------------------------------------------------------------
# Ring attention op vs the XLA oracle
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("S,with_bias", [(16, False), (16, True),
                                         (13, False), (13, True)])
def test_ring_attention_matches_xla(rng, eight_devices, S, with_bias):
    """Forward equality at divisible (16/4) and padded (13→16/4) lengths,
    with and without an additive mask."""
    mesh = _sp_mesh(eight_devices)
    B, H, D = 2, 2, 8
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    bias = None
    if with_bias:
        ids = rng.integers(2, 250, size=(B, S)).astype(np.int32)
        bias = _text_attention_bias(jnp.asarray(ids), None, S)  # causal
    scale = D ** -0.5

    expect = _xla_attention_bshd(q, k, v, bias, scale)
    got = jax.jit(lambda q, k, v: ring_attention(q, k, v, bias, scale,
                                                 mesh))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=2e-5, atol=2e-6)


def test_ring_attention_grads_match_xla(rng, eight_devices):
    """Reverse-mode through the ppermute'd scan equals AD of the XLA
    path (the ring backward is the transposed rotation)."""
    mesh = _sp_mesh(eight_devices)
    B, S, H, D = 2, 12, 2, 8
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    scale = D ** -0.5

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention_bshd(q, k, v, None, scale) * w)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, None, scale, mesh) * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g_ref, g_ring):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-5, atol=3e-6)


# ---------------------------------------------------------------------------
# Training-step equality vs the single-device oracle
# ---------------------------------------------------------------------------

def _single_device_oracle(cfg, params, opt, opt_state, batch):
    """Run the un-meshed step on COPIES (the step donates its inputs —
    the caller's params/opt_state trees must stay live for the SP run)."""
    step = make_train_step(cfg, CFG, opt, mesh=None)
    return step(jax.tree.map(jnp.copy, params),
                jax.tree.map(jnp.copy, opt_state), dict(batch))


@pytest.mark.parametrize("ring", [False, True])
def test_sp_train_step_matches_single_device(rng, eight_devices, ring):
    cfg = tiny_train_config(
        loss_type="sparc", optimizer_type="adamspd",
        inverse_temperature=0.07, global_negatives=True,
        gradient_accumulation_steps=1, batch_size=8,
        sequence_parallel=True, sp_ring=ring,
        mesh=MeshConfig(data=2, model=4))
    params = m.init_clip_params(jax.random.key(3), CFG)
    anchor = jax.tree.map(jnp.copy, params)
    opt = make_optimizer(cfg, params, anchor_params=anchor)
    opt_state = opt.init(params)
    batch = make_batch(rng, 8, accum=1)

    p1, _, m1 = _single_device_oracle(cfg, params, opt, opt_state, batch)

    mesh = _sp_mesh(eight_devices)
    sp = pmesh.replicate(params, mesh)     # params replicated (no Megatron)
    so = pmesh.replicate(opt_state, mesh)
    sb = pmesh.shard_batch(dict(batch), mesh, accum_axis=True)
    step_sp = make_train_step(cfg, CFG, opt, mesh=mesh)
    p2, _, m2 = step_sp(sp, so, sb)

    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m2["total_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]),
                               float(m2["grad_norm"]), rtol=2e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-5)


def test_sp_count_loss_matches_single_device(rng, eight_devices):
    """The second loss family (batched [B·N_cf] cf text forward) under
    sequence sharding."""
    cfg = tiny_train_config(
        loss_type="count", optimizer_type="adamspd",
        global_negatives=True, gradient_accumulation_steps=1,
        batch_size=8, sequence_parallel=True,
        mesh=MeshConfig(data=2, model=4))
    params = m.init_clip_params(jax.random.key(5), CFG)
    anchor = jax.tree.map(jnp.copy, params)
    opt = make_optimizer(cfg, params, anchor_params=anchor)
    opt_state = opt.init(params)
    batch = make_batch(rng, 8, loss_type="count", accum=1)

    p1, _, m1 = _single_device_oracle(cfg, params, opt, opt_state, batch)

    mesh = _sp_mesh(eight_devices)
    step_sp = make_train_step(cfg, CFG, opt, mesh=mesh)
    p2, _, m2 = step_sp(pmesh.replicate(params, mesh),
                        pmesh.replicate(opt_state, mesh),
                        pmesh.shard_batch(dict(batch), mesh,
                                          accum_axis=True))
    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m2["total_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-5)


def test_sp_zero1_composition_matches_single_device(rng, eight_devices):
    """ZeRO-1 over data × sequence parallel over model: optimizer state
    shards on ``data`` only (params-shaped leaves must NOT pick up
    Megatron dims on the sequence axis — megatron_base=False)."""
    from clip_finegrained_alignment_tpu.parallel.sharding_rules import \
        zero1_opt_shardings
    cfg = tiny_train_config(
        loss_type="sparc", optimizer_type="adamspd",
        inverse_temperature=0.07, global_negatives=True,
        gradient_accumulation_steps=1, batch_size=8,
        sequence_parallel=True, zero1=True,
        mesh=MeshConfig(data=2, model=4))
    params = m.init_clip_params(jax.random.key(7), CFG)
    anchor = jax.tree.map(jnp.copy, params)
    opt = make_optimizer(cfg, params, anchor_params=anchor)
    opt_state = opt.init(params)
    batch = make_batch(rng, 8, accum=1)

    p1, _, m1 = _single_device_oracle(cfg, params, opt, opt_state, batch)

    mesh = _sp_mesh(eight_devices)
    sp = pmesh.replicate(params, mesh)
    so = jax.tree.map(jnp.copy, opt_state)
    osh = zero1_opt_shardings(so, mesh, megatron_base=False)
    # No state leaf may carry the (sequence) model axis.
    from jax.sharding import PartitionSpec
    for sh in jax.tree.leaves(osh):
        for axes in sh.spec:
            names = axes if isinstance(axes, tuple) else (axes,)
            assert "model" not in names, f"state leaf sharded on model: {sh}"
    so = jax.tree.map(jax.device_put, so, osh)
    step_sp = make_train_step(cfg, CFG, opt, mesh=mesh, opt_shardings=osh)
    p2, so2, m2 = step_sp(sp, so, pmesh.shard_batch(dict(batch), mesh,
                                                    accum_axis=True))
    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m2["total_loss"]), rtol=1e-5)
    n_sharded = sum(
        1 for leaf in jax.tree.leaves(so2)
        if hasattr(leaf, "addressable_shards") and leaf.ndim > 0
        and int(np.prod(leaf.addressable_shards[0].data.shape)) < leaf.size)
    assert n_sharded > 0, "zero1 left every optimizer-state leaf replicated"
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-5)


def test_sp_fsdp_composition_matches_replicated(rng, eight_devices):
    """FSDP over data × sequence parallel over model: params shard on
    ``data`` ONLY (megatron_base=False keeps the sequence axis out of
    the param layout) and the 3-step trajectory equals the plain
    replicated DP run."""
    from clip_finegrained_alignment_tpu.train.engine import Trainer
    batch = make_batch(rng, 16)

    def run(fsdp, sp):
        mesh_cfg = (MeshConfig(data=2, model=4) if sp
                    else MeshConfig(data=8, model=1))
        cfg = tiny_train_config(optimizer_type="adamspd",
                                gradient_accumulation_steps=1,
                                batch_size=16, fsdp=fsdp,
                                sequence_parallel=sp,
                                global_negatives=True, mesh=mesh_cfg)
        mesh = pmesh.make_mesh(mesh_cfg, eight_devices)
        trainer = Trainer(cfg,
                          params=m.init_clip_params(jax.random.key(3), CFG),
                          mesh=mesh)
        for _ in range(3):
            metrics = trainer.step(batch)
        return trainer, metrics

    t_rep, m_rep = run(fsdp=False, sp=False)
    t_f, m_f = run(fsdp=True, sp=True)

    np.testing.assert_allclose(float(m_f["total_loss"]),
                               float(m_rep["total_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(t_rep.params),
                    jax.tree.leaves(t_f.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)

    # Params shard on data (dp=2 → at most ~0.6x of replicated bytes on
    # device 0) and NEVER on the sequence axis.
    def device0_bytes(tree):
        total = 0
        for leaf in jax.tree.leaves(tree):
            if isinstance(leaf, jax.Array) and leaf.addressable_shards:
                sh = leaf.addressable_shards[0]
                total += int(np.prod(sh.data.shape)) * leaf.dtype.itemsize
        return total

    assert device0_bytes(t_f.params) < 0.65 * device0_bytes(t_rep.params)
    for leaf in jax.tree.leaves(t_f.params):
        for axes in leaf.sharding.spec:
            names = axes if isinstance(axes, tuple) else (axes,)
            assert "model" not in names, \
                f"param sharded on the sequence axis: {leaf.sharding.spec}"


def test_sp_forward_emits_collectives(rng, eight_devices):
    """The compiled SP forward must actually run sequence-sharded: the
    token-dim constraints force cross-device reach (all-gather /
    collective-permute) into the HLO — absent in a replicated compile."""
    mesh = _sp_mesh(eight_devices)
    params = m.init_clip_params(jax.random.key(0), CFG)
    batch = make_batch(rng, 8)
    seq = SeqParallelSpec(mesh=mesh, ring=False)

    def fwd(params, pv, ids):
        out = m.clip_forward(params, pv, ids, CFG, dtype=jnp.float32,
                             seq=seq)
        return out.logits_per_image

    from jax.sharding import NamedSharding, PartitionSpec as P
    bsh = NamedSharding(mesh, P("data"))
    lowered = jax.jit(fwd, in_shardings=(None, bsh, bsh)).lower(
        params, jnp.asarray(batch["pixel_values"]),
        jnp.asarray(batch["input_ids"]))
    hlo = lowered.compile().as_text()
    assert ("all-gather" in hlo) or ("collective-permute" in hlo) or \
        ("all-to-all" in hlo), \
        "SP forward compiled without any cross-token collective"


def test_sp_validation_errors(rng):
    cfg = tiny_train_config(sequence_parallel=True, global_negatives=True,
                            mesh=MeshConfig(data=8, model=1))
    params = m.init_clip_params(jax.random.key(0), CFG)
    opt = make_optimizer(cfg, params)
    with pytest.raises(ValueError, match="mesh.model"):
        make_train_step(cfg, CFG, opt,
                        mesh=pmesh.make_mesh(cfg.mesh))

    cfg2 = tiny_train_config(sequence_parallel=True,
                             global_negatives=False,
                             mesh=MeshConfig(data=2, model=4))
    with pytest.raises(ValueError, match="global_negatives"):
        make_train_step(cfg2, CFG, opt,
                        mesh=pmesh.make_mesh(cfg2.mesh))
