"""2-process distributed coverage (VERDICT round-1 item 6).

Spawns two real OS processes, each with 2 virtual CPU devices, connected by
``jax.distributed`` — the DCN-path analogue of the reference's torchrun
launch (``/root/reference/finetune/dist_train.sh:40-51``). Asserts:

* both processes compute identical losses,
* the multi-process DP loss equals a single-process full-batch oracle
  (global-negatives mode is mesh-invariant by construction),
* ``process_shard_bounds`` partitions correctly at process_count=2,
* an orbax checkpoint saved collectively by both processes restores
  bit-identically (covers ``train/checkpoint.py``'s multihost save path).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dp_train_and_checkpoint(tmp_path):
    port = _free_port()
    ckdir = str(tmp_path / "mpckpt")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    env.pop("COORDINATOR_ADDRESS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
             str(pid), "2", str(port), ckdir],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    by_pid = {o["process"]: o for o in outs}
    assert set(by_pid) == {0, 1}

    # Both processes see the same replicated losses.
    np.testing.assert_allclose(by_pid[0]["losses"], by_pid[1]["losses"],
                               rtol=0, atol=0)
    assert all(o["restore_ok"] for o in outs)
    assert all(o["meta_step"] == 3 for o in outs)
    # process_shard_bounds at pc=2 over B=8: [0,4) and [4,8).
    # (each worker prints its own bounds)
    bounds = sorted(tuple(o["shard_bounds"]) for o in outs)
    assert bounds == [(0, 4), (4, 8)]

    # Single-process full-batch oracle: global-negatives DP must be
    # mesh-invariant, so the 2-process losses equal the mesh=None math.
    import jax
    import jax.numpy as jnp
    from clip_finegrained_alignment_tpu.config import CLIPConfig, TrainConfig
    from clip_finegrained_alignment_tpu.models import clip as m
    from clip_finegrained_alignment_tpu.optim.factory import make_optimizer
    from clip_finegrained_alignment_tpu.train.engine import make_train_step

    model_cfg = CLIPConfig.tiny_test()
    accum, B = 2, 8
    cfg = TrainConfig(
        clip_model="tiny", loss_type="sparc", optimizer_type="adamspd",
        inverse_temperature=0.07, batch_size=B,
        gradient_accumulation_steps=accum, use_amp=False,
        global_negatives=True)
    params = m.init_clip_params(jax.random.key(0), model_cfg)
    anchor = jax.tree.map(jnp.copy, params)
    opt = make_optimizer(cfg, params, anchor_params=anchor)
    opt_state = opt.init(params)
    step = make_train_step(cfg, model_cfg, opt, mesh=None)

    rng = np.random.default_rng(0)
    v, t = model_cfg.vision, model_cfg.text
    ids = rng.integers(1, t.vocab_size - 2,
                       size=(accum, B, t.max_position_embeddings)
                       ).astype(np.int32)
    ids[..., -1] = t.eos_token_id
    batch = {
        "pixel_values": jnp.asarray(rng.normal(
            size=(accum, B, v.image_size, v.image_size, 3)
        ).astype(np.float32)),
        "input_ids": jnp.asarray(ids),
    }
    oracle = []
    for _ in range(3):
        params, opt_state, metrics = step(params, opt_state, batch)
        oracle.append(float(metrics["total_loss"]))

    np.testing.assert_allclose(by_pid[0]["losses"], oracle, rtol=5e-5)
