"""Serving-path throughput: the production ``models/inference.py``
embedders (jitted bf16) on the attached chip, device-resident inputs
(uint8 pixels — the pipeline's wire format — exercising the fused
on-device rescale+normalize).

    python perf/serve_bench.py [model] [batch] [iters]

These are the paths every evaluator runs on (one batched forward per
modality — the reference's per-sample eval loops, ``cb_eval.py:247-258``,
batched away). Prints one JSON line per modality.

Note: in this axon-tunnel environment, host→device input transfer runs
over the network (~30 MB/s measured), so the numpy-in/numpy-out
``CLIPInference`` wrapper is tunnel-bound here (48.8 images/s at fp32
512-batches); on real TPU hosts the transfer is PCIe. This bench times
the on-chip compute.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import numpy as np

    from clip_finegrained_alignment_tpu.config import CLIPConfig
    from clip_finegrained_alignment_tpu.models import clip as m
    from clip_finegrained_alignment_tpu.models.inference import CLIPInference

    model_name = sys.argv[1] if len(sys.argv) > 1 else "ViT-B/16"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    import jax.numpy as jnp

    cfg = CLIPConfig.from_name(model_name)
    params = m.init_clip_params(jax.random.key(0), cfg)
    if os.environ.get("BENCH_UNSTACK", "1") == "1":
        # The towers consume unstacked per-layer trees transparently —
        # same straight-line-layers win as training (BASELINE.md round 2).
        params = m.unstack_layers(params)
    inf = CLIPInference(params, cfg, batch_bucket=batch)

    rng = np.random.default_rng(0)
    v, t = cfg.vision, cfg.text
    px = jnp.asarray(rng.integers(
        0, 256, size=(batch, v.image_size, v.image_size, 3)
    ).astype(np.uint8))
    ids = rng.integers(1, t.vocab_size - 2,
                       size=(batch, t.max_position_embeddings)
                       ).astype(np.int32)
    ids[:, -1] = t.eos_token_id
    ids = jnp.asarray(ids)

    tag = model_name.lower().replace("-", "").replace("/", "")
    for name, fn, x in (("image", inf._embed_images, px),
                        ("text", inf._embed_texts, ids)):
        e = fn(params, x)
        float(e[0, 0])                          # compile + tunnel sync
        t0 = time.perf_counter()
        for _ in range(iters):
            e = fn(params, x)
        float(e[0, 0])                          # force sync
        dt = time.perf_counter() - t0
        rate = batch * iters / dt
        print(json.dumps({
            "metric": f"serve_embed_{name}_throughput_{tag}",
            "value": round(rate, 1), "unit": f"{name}s/sec/chip",
            "batch": batch, "ms_per_batch": round(dt / iters * 1000, 2)}))


if __name__ == "__main__":
    main()
