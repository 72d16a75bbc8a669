"""GradCache (train/gradcache.py) oracle tests.

The contract: ``gradcache_grads`` on [accum, b, ...] chunks returns
EXACTLY the gradients of one loss over the full accum*b batch — i.e. it
must match a direct single-chunk ``_accumulated_grads`` call at
[1, accum*b, ...] — while touching only one chunk's activations at a
time. And it must NOT match the chunk-mean objective (that difference —
the bigger negative pool — is the point of the feature).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clip_finegrained_alignment_tpu.config import (CLIPConfig, MeshConfig,
                                                   TrainConfig)
from clip_finegrained_alignment_tpu.models import clip as m
from clip_finegrained_alignment_tpu.optim.factory import make_optimizer
from clip_finegrained_alignment_tpu.parallel import mesh as pmesh
from clip_finegrained_alignment_tpu.train.engine import (_accumulated_grads,
                                                         make_train_step)
from clip_finegrained_alignment_tpu.train.gradcache import (
    gradcache_grads, validate_gradcache)

CFG = CLIPConfig.tiny_test()


def _cfg(loss_type, accum, B, **kw):
    base = dict(clip_model="tiny", batch_size=B,
                gradient_accumulation_steps=accum, lr=1e-3, use_amp=False,
                loss_type=loss_type, grad_cache=True, log_every=1000,
                inverse_temperature=0.07 if loss_type == "sparc" else 1.0)
    base.update(kw)
    return TrainConfig(**base)


def _batch(rng, accum, B):
    t, v = CFG.text, CFG.vision
    ids = rng.integers(1, t.vocab_size - 2,
                       size=(accum, B, t.max_position_embeddings)
                       ).astype(np.int32)
    ids[..., -1] = t.eos_token_id
    # A few pad tokens so the SPARC mask is non-trivial across chunks.
    ids[..., -3:-1] = t.pad_token_id
    return {
        "pixel_values": rng.normal(
            size=(accum, B, v.image_size, v.image_size, 3)
        ).astype(np.float32),
        "input_ids": ids,
    }


@pytest.mark.parametrize("loss_type", ["clip", "sparc"])
def test_gradcache_equals_single_chunk_full_batch(rng, loss_type):
    """gradcache(accum=4, b=4) == direct grads of one loss over all 16."""
    accum, B = 4, 4
    cfg = _cfg(loss_type, accum, B)
    params = m.init_clip_params(jax.random.key(0), CFG)
    batch = _batch(rng, accum, B)

    grads, losses = jax.jit(
        lambda p, b: gradcache_grads(p, b, cfg, CFG, jnp.float32)
    )(params, {k: jnp.asarray(v) for k, v in batch.items()})

    # Oracle: the same loss over the whole effective batch in ONE chunk.
    flat = {k: jnp.asarray(v.reshape((1, accum * B) + v.shape[2:]))
            for k, v in batch.items()}
    cfg_1 = _cfg(loss_type, 1, accum * B, grad_cache=False)
    exp_grads, exp_losses = jax.jit(
        lambda p, b: _accumulated_grads(p, b, cfg_1, CFG, jnp.float32)
    )(params, flat)

    np.testing.assert_allclose(float(losses["total_loss"]),
                               float(exp_losses["total_loss"]), rtol=1e-6)
    flat_g, _ = jax.flatten_util.ravel_pytree(grads)
    flat_e, _ = jax.flatten_util.ravel_pytree(exp_grads)
    np.testing.assert_allclose(np.asarray(flat_g), np.asarray(flat_e),
                               rtol=2e-5, atol=1e-7)


def test_gradcache_is_not_the_chunk_mean_objective(rng):
    """The full-pool loss must differ from the accumulation chunk-mean —
    otherwise the feature is a no-op and the negative pool never grew."""
    accum, B = 4, 4
    cfg = _cfg("clip", accum, B)
    params = m.init_clip_params(jax.random.key(0), CFG)
    batch = {k: jnp.asarray(v) for k, v in _batch(rng, accum, B).items()}

    _, full = gradcache_grads(params, batch, cfg, CFG, jnp.float32)
    cfg_acc = _cfg("clip", accum, B, grad_cache=False)
    _, chunked = _accumulated_grads(params, batch, cfg_acc, CFG,
                                    jnp.float32)
    # 16 negatives vs 4: the CE normalizer alone separates the two.
    assert abs(float(full["total_loss"])
               - float(chunked["total_loss"])) > 1e-3


def test_gradcache_train_step_dp_mesh(rng):
    """Engine integration on the 8-device mesh (global-negatives mode):
    the jitted grad-cache step must equal a single-device step whose ONE
    chunk is the whole effective batch."""
    accum, B = 2, 8
    n_dev = 8
    cfg = _cfg("clip", accum, B, global_negatives=True,
               mesh=MeshConfig(data=n_dev, model=1))
    mesh = pmesh.make_mesh(cfg.mesh, jax.devices()[:n_dev])
    params = m.init_clip_params(jax.random.key(0), CFG)
    opt = make_optimizer(cfg, params)
    step = make_train_step(cfg, CFG, opt, mesh=mesh)
    batch = _batch(rng, accum, B)

    # Oracle first (the mesh step donates its buffers).
    cfg_o = _cfg("clip", 1, accum * B, grad_cache=False)
    opt_o = make_optimizer(cfg_o, params)
    step_o = make_train_step(cfg_o, CFG, opt_o, mesh=None)
    p_o, _, m_o = step_o(
        jax.tree.map(jnp.copy, params),
        opt_o.init(jax.tree.map(jnp.copy, params)),
        {k: jnp.asarray(v.reshape((1, accum * B) + v.shape[2:]))
         for k, v in batch.items()})

    p_s, _, m_s = step(
        pmesh.replicate(params, mesh),
        pmesh.replicate(opt.init(params), mesh),
        pmesh.shard_batch({k: jnp.asarray(v) for k, v in batch.items()},
                          mesh, accum_axis=True))
    np.testing.assert_allclose(float(m_s["total_loss"]),
                               float(m_o["total_loss"]), rtol=5e-5)
    np.testing.assert_allclose(float(m_s["grad_norm"]),
                               float(m_o["grad_norm"]), rtol=2e-4)
    fs, _ = jax.flatten_util.ravel_pytree(p_s)
    fo, _ = jax.flatten_util.ravel_pytree(p_o)
    # rtol 1e-3 on the updated params, not 1e-4: the mesh step reduces
    # grads across 8 devices (psum ordering differs from the
    # single-device sum), and AdamSPD's m/(sqrt(v)+eps) update amplifies
    # a ~1e-7 grad difference into ~1e-3 relative on near-zero-moment
    # params (observed: 1/51,329 params at rel 5.6e-4, with the loss
    # (5e-5) and grad-norm (2e-4) asserts above tight and green — the
    # math is pinned there; this line only checks the update plumbing).
    np.testing.assert_allclose(np.asarray(fs), np.asarray(fo),
                               rtol=1e-3, atol=1e-6)


def test_gradcache_rejects_unsupported_configs():
    with pytest.raises(ValueError, match="count"):
        validate_gradcache(_cfg("count", 2, 4,
                                inverse_temperature=1.0))
    with pytest.raises(ValueError, match="sequence_parallel"):
        validate_gradcache(_cfg("clip", 2, 4, sequence_parallel=True,
                                global_negatives=True, sp_ring=True,
                                mesh=MeshConfig(data=4, model=2)))
    with pytest.raises(ValueError, match="pipeline"):
        validate_gradcache(_cfg("clip", 2, 4, global_negatives=True,
                                mesh=MeshConfig(data=2, model=1, pipe=4)))
    with pytest.raises(ValueError, match="global_negatives"):
        cfg = _cfg("clip", 2, 8, mesh=MeshConfig(data=8, model=1))
        mesh = pmesh.make_mesh(cfg.mesh, jax.devices()[:8])
        validate_gradcache(cfg, mesh)
