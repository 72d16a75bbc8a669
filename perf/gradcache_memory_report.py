"""GradCache activation-memory accounting.

Compiles the single-device SPARC/CLIP train step three ways at the same
EFFECTIVE batch and reads XLA's buffer assignment
(``compiled.memory_analysis()``):

  * direct    — one chunk holds the whole effective batch (the only way
                to get full-pool negatives without GradCache)
  * gradcache — full-pool objective, chunked (train/gradcache.py)
  * accum     — plain accumulation (chunk-mean objective; the memory
                floor GradCache is supposed to match)

The contract under test: gradcache temp ≈ accum temp ≪ direct temp,
while gradcache computes the SAME objective as direct. Numbers quoted in
``train/gradcache.py``'s docstring claims and pinned (with slack) in
``tests/test_gradcache_memory.py``.

Run (CPU, ~2 min):
    python perf/gradcache_memory_report.py
Writes perf/gradcache_memory_report.log.
"""

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

from clip_finegrained_alignment_tpu.config import CLIPConfig, TrainConfig
from clip_finegrained_alignment_tpu.models import clip as m
from clip_finegrained_alignment_tpu.optim.factory import make_optimizer
from clip_finegrained_alignment_tpu.train.engine import make_train_step

CFG = CLIPConfig.tiny_test()


def compile_step(loss_type, accum, chunk, grad_cache, remat=False):
    cfg = TrainConfig(
        clip_model="tiny", batch_size=chunk,
        gradient_accumulation_steps=accum, lr=1e-3, use_amp=True,
        loss_type=loss_type, optimizer_type="adamspd",
        inverse_temperature=0.07 if loss_type == "sparc" else 1.0,
        grad_cache=grad_cache, remat=remat)
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
                         anchor_params=jax.tree.map(jax.numpy.copy, params))
    step = make_train_step(cfg, CFG, opt, mesh=None)
    return step.lower(params, opt.init(params), batch).compile()


def temp_mb(compiled):
    ma = compiled.memory_analysis()
    if ma is None:
        raise SystemExit("memory_analysis() unsupported on this backend")
    return ma.temp_size_in_bytes / 1e6


def main():
    for loss in ("sparc", "clip"):
        for b_eff, accum in ((64, 4), (128, 8)):
            direct = temp_mb(compile_step(loss, 1, b_eff, False))
            cache = temp_mb(compile_step(loss, accum, b_eff // accum, True))
            plain = temp_mb(compile_step(loss, accum, b_eff // accum,
                                         False))
            print(f"{loss:<6} B_eff={b_eff:>4} accum={accum}: "
                  f"direct={direct:8.2f} MB  "
                  f"gradcache={cache:8.2f} MB ({direct / cache:4.1f}x "
                  f"relief)  plain-accum={plain:8.2f} MB", flush=True)


if __name__ == "__main__":
    main()
