"""Blockwise flash-attention microbench at its design point (long
sequences, past ``BLOCKWISE_THRESHOLD=1024``) — the verdict the round-2
sweeps left open: the kernel loses at CLIP's S=197/577
(perf/sweep_r2d.log) and its stated domain S>1024 was never measured.

    FLASH_S=2048 FLASH_B=4 python perf/flash_microbench.py

Compares ``ops.flash_attention.blockwise_flash_attention`` against the
XLA reference path (``models.clip._xla_attention``) at synthetic
[B, 12, S, 64] bf16 shapes, fwd and fwd+bwd, on the attached accelerator.
Batch scales inversely with S to keep total work comparable and the XLA
path's [B, H, S, S] probs inside HBM. Appends one line per run to
perf/flash_microbench.log.

Note the compile budget in this environment: each distinct Pallas kernel
costs ~5 min of remote compile (fwd + dq + dkv = 3 kernels per shape), so
runs are per-shape via env vars rather than one sweep loop.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from clip_finegrained_alignment_tpu.models.clip import _xla_attention
    from clip_finegrained_alignment_tpu.ops.flash_attention import \
        blockwise_flash_attention

    S = int(os.environ.get("FLASH_S", "2048"))
    B = int(os.environ.get("FLASH_B", str(max(1, 8192 // S))))
    H, D = 12, 64
    steps = int(os.environ.get("FLASH_STEPS", "20"))
    scale = D ** -0.5

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.bfloat16)

    def loss_of(fn):
        def loss(q, k, v):
            return jnp.sum(fn(q, k, v, None, scale).astype(jnp.float32))
        return loss

    paths = {
        "xla": _xla_attention,
        "blockwise": functools.partial(blockwise_flash_attention,
                                       block_q=256, block_k=256),
    }

    def bench(fn, args, label):
        out = fn(*args)
        first = out[0] if isinstance(out, tuple) else out
        float(jnp.sum(first.astype(jnp.float32)))  # full sync (compile)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        first = out[0] if isinstance(out, tuple) else out
        float(jnp.sum(first.astype(jnp.float32)))
        ms = (time.perf_counter() - t0) / steps * 1e3
        line = f"S={S} B={B} {label}: {ms:.3f} ms/call"
        print(line, flush=True)
        return line

    log = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "flash_microbench.log")
    lines = []
    for name, fn in paths.items():
        fwd = jax.jit(loss_of(fn))
        lines.append(bench(fwd, (q, k, v), f"{name} fwd"))
        grad = jax.jit(jax.grad(loss_of(fn), argnums=(0, 1, 2)))
        lines.append(bench(grad, (q, k, v), f"{name} fwd+bwd"))
    with open(log, "a") as f:
        for line in lines:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
