"""Isolated SPARC local-alignment op benchmark: fused Pallas vs XLA chain.

The op under test is the north-star fusion target
(``/root/reference/finetune/losses.py:221-245``): normalize → similarity →
masked min-max → threshold → renormalize → grouped pooling. Measures fwd
and fwd+bwd at the production training shape (ViT-B/16: P=196 patches,
T=77 tokens, D=512 projection) on whatever accelerator is attached.

    python perf/sparc_microbench.py [B] [iters]

Prints one JSON line per (path, mode).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from clip_finegrained_alignment_tpu.ops.sparc_kernel import (
        _reference_chain, fused_sparc_pooling)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    P, T, D = 196, 77, 512
    thr = 0.5

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(B, P, D)).astype(np.float32))
    l = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    mask = np.ones((B, T), np.float32)
    mask[:, 60:] = 0.0  # realistic caption lengths
    mask = jnp.asarray(mask)

    paths = {
        "pallas": lambda vp, lt: fused_sparc_pooling(vp, lt, mask, thr),
        "xla": lambda vp, lt: _reference_chain(vp, lt, mask, thr),
    }

    for name, fn in paths.items():
        fwd = jax.jit(lambda vp, lt, fn=fn: fn(vp, lt).sum())
        bwd = jax.jit(jax.grad(lambda vp, lt, fn=fn: fn(vp, lt).sum(),
                               argnums=(0, 1)))
        for mode, f in (("fwd", fwd), ("fwd+bwd", bwd)):
            out = f(v, l)
            # full host sync (block_until_ready can return early through
            # the remote-execution tunnel)
            float(jax.tree.leaves(out)[0].ravel()[0])
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(v, l)
            float(jax.tree.leaves(out)[0].ravel()[0])
            dt = (time.perf_counter() - t0) / iters
            print(json.dumps({
                "op": "sparc_local_alignment", "path": name, "mode": mode,
                "batch": B, "ms": round(dt * 1e3, 3),
                "pairs_per_sec": round(B / dt, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
