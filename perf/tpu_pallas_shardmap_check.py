"""TPU-gated regression check: Pallas kernels inside shard_map.

    python perf/tpu_pallas_shardmap_check.py            # fused SPARC
    CHECK_PALLAS_ATTN=1 python perf/tpu_pallas_shardmap_check.py  # + attention

Off-TPU the fused kernels fall back to the XLA chain under shard_map's
vma tracking (``ops/sparc_kernel.py`` / ``ops/_pallas_common.py``), so
the CPU suite structurally cannot exercise the compiled-kernel+shard_map
combination. This script runs the DDP-parity shard_map train step
(1-device ``data`` mesh, ``global_negatives=False``) twice on the real
chip — XLA chain vs ``use_fused_sparc`` (optionally + Pallas attention) —
and asserts the losses match. Appends the loss pair to
perf/pallas_shardmap_check.log so regressions in the vma path are
visible and re-checkable with one command (CLAUDE.md).

Budget note: each distinct Pallas kernel adds ~5 min of remote compile in
this environment; the default (fused SPARC fwd+bwd) costs ~10 min.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import numpy as np
    import jax.numpy as jnp

    from clip_finegrained_alignment_tpu.config import (CLIPConfig,
                                                       MeshConfig,
                                                       TrainConfig)
    from clip_finegrained_alignment_tpu.models import clip as m
    from clip_finegrained_alignment_tpu.optim.factory import make_optimizer
    from clip_finegrained_alignment_tpu.parallel import mesh as pmesh
    from clip_finegrained_alignment_tpu.train.engine import make_train_step

    platform = jax.devices()[0].platform
    if platform not in ("tpu", "axon"):
        sys.exit(f"needs a TPU device (have {platform}) — the CPU "
                 "fallback would compare the XLA chain against itself")

    with_attn = os.environ.get("CHECK_PALLAS_ATTN", "0") == "1"
    model_cfg = CLIPConfig.tiny_test()
    rng = np.random.default_rng(0)
    v, t = model_cfg.vision, model_cfg.text
    accum, B = 2, 8
    ids = rng.integers(1, t.vocab_size - 2,
                       size=(accum, B, t.max_position_embeddings)
                       ).astype(np.int32)
    ids[..., -1] = t.eos_token_id
    batch = {
        "pixel_values": rng.normal(
            size=(accum, B, v.image_size, v.image_size, 3)
        ).astype(np.float32),
        "input_ids": ids,
    }

    def run(use_fused, use_pallas):
        cfg = TrainConfig(
            clip_model="tiny", loss_type="sparc",
            optimizer_type="adamspd", inverse_temperature=0.07,
            batch_size=B, gradient_accumulation_steps=accum,
            use_amp=False, global_negatives=False,  # shard_map parity path
            use_fused_sparc=use_fused, use_pallas_attention=use_pallas,
            mesh=MeshConfig(data=1, model=1))
        mesh = pmesh.make_mesh(cfg.mesh, jax.devices()[:1])
        params = m.init_clip_params(jax.random.key(0), model_cfg)
        anchor = jax.tree.map(jnp.copy, params)
        opt = make_optimizer(cfg, params, anchor_params=anchor)
        step = make_train_step(cfg, model_cfg, opt, mesh=mesh)
        t0 = time.perf_counter()
        _, _, metrics = step(pmesh.replicate(params, mesh),
                             pmesh.replicate(opt.init(params), mesh),
                             pmesh.shard_batch(batch, mesh,
                                               accum_axis=True))
        loss = float(metrics["total_loss"])
        gnorm = float(metrics["grad_norm"])
        print(f"fused={use_fused} pallas_attn={use_pallas}: "
              f"loss={loss:.6f} grad_norm={gnorm:.6f} "
              f"(compile+run {time.perf_counter() - t0:.0f}s)", flush=True)
        return loss, gnorm

    loss_xla, gnorm_xla = run(False, False)
    loss_pl, gnorm_pl = run(True, with_attn)

    np.testing.assert_allclose(
        loss_pl, loss_xla, rtol=5e-5,
        err_msg="Pallas-in-shard_map loss diverged from the XLA chain")
    np.testing.assert_allclose(
        gnorm_pl, gnorm_xla, rtol=1e-3,
        err_msg="Pallas-in-shard_map grad norm diverged from XLA chain")

    log = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "pallas_shardmap_check.log")
    with open(log, "a") as f:
        f.write(f"{time.strftime('%Y-%m-%d %H:%M:%S')} platform={platform} "
                f"attn={with_attn} xla=({loss_xla:.6f},{gnorm_xla:.6f}) "
                f"pallas=({loss_pl:.6f},{gnorm_pl:.6f}) OK\n")
    print("OK: Pallas+shard_map matches the XLA chain on the chip")


if __name__ == "__main__":
    main()
