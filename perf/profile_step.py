"""Capture a Perfetto trace of the benchmark train step on the attached
accelerator (best effort — the axon remote-execution tunnel may not export
device traces; host-side dispatch still shows).

    python perf/profile_step.py [batch] [steps]

Writes to perf/trace/ and lists what was captured.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import numpy as np
    import jax.numpy as jnp
    from clip_finegrained_alignment_tpu.config import CLIPConfig, TrainConfig
    from clip_finegrained_alignment_tpu.models import clip as m
    from clip_finegrained_alignment_tpu.optim.factory import make_optimizer
    from clip_finegrained_alignment_tpu.train.engine import make_train_step
    from clip_finegrained_alignment_tpu.utils.logging import trace_capture

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    accum = int(os.environ.get("BENCH_ACCUM", "8"))
    model_name = os.environ.get("BENCH_MODEL", "ViT-B/16")
    model_cfg = CLIPConfig.from_name(model_name)
    # Same env knobs as bench.py, same defaults (the production regime).
    unstack = os.environ.get("BENCH_UNSTACK", "1") == "1"
    remat = {"0": False, "1": True,
             "dots": "dots"}[os.environ.get("BENCH_REMAT", "0")]
    unroll = int(os.environ.get("BENCH_UNROLL", "12"))
    quant = os.environ.get("BENCH_QUANT", "none")
    cfg = TrainConfig(
        clip_model=model_name, loss_type="sparc", optimizer_type="adamspd",
        inverse_temperature=0.07, batch_size=batch_size,
        gradient_accumulation_steps=accum, use_amp=True,
        remat=remat, unroll_layers=unroll, unstack_layers=unstack,
        quant=quant)
    params = m.init_clip_params(jax.random.key(0), model_cfg)
    if unstack:
        params = m.unstack_layers(params)
    anchor = jax.tree.map(jnp.copy, params)
    opt = make_optimizer(cfg, params, anchor_params=anchor)
    opt_state = opt.init(params)
    step = make_train_step(cfg, model_cfg, opt, mesh=None)

    rng = np.random.default_rng(0)
    v, t = model_cfg.vision, model_cfg.text
    ids = rng.integers(1, t.vocab_size - 2,
                       size=(accum, batch_size, t.max_position_embeddings)
                       ).astype(np.int32)
    ids[..., -1] = t.eos_token_id
    batch = {
        "pixel_values": jnp.asarray(rng.normal(
            size=(accum, batch_size, v.image_size, v.image_size, 3)
        ).astype(np.float32)),
        "input_ids": jnp.asarray(ids),
    }
    params, opt_state, metrics = step(params, opt_state, batch)  # compile
    float(metrics["total_loss"])

    logdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "trace")
    with trace_capture(logdir):
        for _ in range(steps):
            params, opt_state, metrics = step(params, opt_state, batch)
        float(metrics["total_loss"])

    for root, _, files in os.walk(logdir):
        for f in files:
            p = os.path.join(root, f)
            print(f"{os.path.getsize(p):>12} {p}")


if __name__ == "__main__":
    main()
