"""GradCache activation-memory bound, measured from XLA's buffer
assignment (sweep: perf/gradcache_memory_report.py, committed log:
perf/gradcache_memory_report.log).

Pins the load-bearing fact with slack: the full-pool objective via
GradCache costs roughly ONE CHUNK of activation memory — measured 2.9 MB
vs the direct full-batch step's 13.9 MB at B_eff=64/accum=4 on the tiny
SPARC model (4.8x relief, within ~25% of plain accumulation's 3.8 MB
floor) — while computing the SAME objective as the direct step
(tests/test_gradcache.py pins the math)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clip_finegrained_alignment_tpu.config import CLIPConfig, TrainConfig
from clip_finegrained_alignment_tpu.models import clip as m
from clip_finegrained_alignment_tpu.optim.factory import make_optimizer
from clip_finegrained_alignment_tpu.train.engine import make_train_step

CFG = CLIPConfig.tiny_test()


def _compile(accum, chunk, grad_cache):
    cfg = TrainConfig(
        clip_model="tiny", batch_size=chunk,
        gradient_accumulation_steps=accum, lr=1e-3, use_amp=True,
        loss_type="sparc", optimizer_type="adamspd",
        inverse_temperature=0.07, grad_cache=grad_cache, remat=False)
    rng = np.random.default_rng(0)
    v, t = CFG.vision, CFG.text
    ids = rng.integers(1, t.vocab_size - 2,
                       size=(accum, chunk, t.max_position_embeddings)
                       ).astype(np.int32)
    ids[..., -1] = t.eos_token_id
    batch = {
        "pixel_values": rng.normal(
            size=(accum, chunk, v.image_size, v.image_size, 3)
        ).astype(np.float32),
        "input_ids": ids,
    }
    params = m.init_clip_params(jax.random.key(0), CFG)
    opt = make_optimizer(cfg, params,
                         anchor_params=jax.tree.map(jnp.copy, params))
    step = make_train_step(cfg, CFG, opt, mesh=None)
    return step.lower(params, opt.init(params), batch).compile()


def _temp(compiled):
    ma = compiled.memory_analysis()
    if ma is None:
        pytest.skip("memory_analysis() unsupported on this backend")
    return int(ma.temp_size_in_bytes)


def test_gradcache_temp_is_one_chunk_not_full_batch():
    b_eff, accum = 64, 4
    direct = _temp(_compile(1, b_eff, False))
    cache = _temp(_compile(accum, b_eff // accum, True))
    plain = _temp(_compile(accum, b_eff // accum, False))
    # Measured 4.8x (report log); require >= 2.5x so layout-level XLA
    # changes don't flake the pin while a real regression still fails.
    assert direct >= 2.5 * cache, \
        f"gradcache lost its memory edge: direct={direct} cache={cache}"
    # And it must sit near the plain-accumulation floor (measured BELOW
    # it: phase 1 stores nothing, phase 3 holds one chunk), not some
    # intermediate blow-up. 1.5x slack.
    assert cache <= 1.5 * plain, \
        f"gradcache temp {cache} far above the accumulation floor {plain}"
