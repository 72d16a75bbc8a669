"""Int8-vs-bf16 matmul microbench at CLIP projection shapes (TPU).

Go/no-go for the quantized training path (``ops/quant.py``): times one
ViT-B/16 vision layer's projection GEMM set (q/k/v/out [768,768]x4,
fc1 [768,3072], fc2 [3072,768] at M = 32x197 = 6304 — the microbatch-32
production regime) as

  * ``bf16``        — the exact path (jnp matmul, bf16 in / f32 acc)
  * ``int8``        — dynamic per-row/per-col absmax quantize + int8 MXU
                      matmul + dequant, i.e. the REAL cost including the
                      quantization elementwise work, not just the GEMM.

and the training direction (value_and_grad of a sum-of-outputs loss,
covering dgrad+wgrad) for modes none/switchback/int8.

v5e peak: 394.7 int8 TOPS vs 197.4 bf16 TFLOP/s — ideal fwd speedup 2x;
measured speedup is the go/no-go for threading quant through the model.

Usage:  BENCH_VARIANTS=fwd python perf/int8_microbench.py   (2 compiles)
        BENCH_VARIANTS=bwd python perf/int8_microbench.py   (3 compiles)
        python perf/int8_microbench.py                      (all 5)
Results logged to perf/int8_microbench.log.
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from clip_finegrained_alignment_tpu.ops.quant import quant_matmul

M, D, F = 32 * 197, 768, 3072
STEPS = int(os.environ.get("BENCH_STEPS", "50"))
# FLOPs of the GEMM set (fwd): 4 DxD + DxF + FxD at M rows.
FWD_FLOPS = 2 * M * (4 * D * D + D * F + F * D)


def gemm_set(x1, x2, ws, mm):
    """Sum-of-outputs scalar over the 6-projection GEMM set."""
    tot = 0.0
    for w in ws[:5]:                       # q k v out fc1 on x1 [M, D]
        tot += jnp.sum(mm(x1, w).astype(jnp.float32))
    tot += jnp.sum(mm(x2, ws[5]).astype(jnp.float32))   # fc2 on [M, F]
    return tot


def make_fns():
    exact = lambda x, w: x @ w
    sb = lambda x, w: quant_matmul(x, w, "switchback")
    q8 = lambda x, w: quant_matmul(x, w, "int8")
    fns = {
        "fwd_bf16": jax.jit(lambda x1, x2, ws: gemm_set(x1, x2, ws, exact)),
        "fwd_int8": jax.jit(lambda x1, x2, ws: gemm_set(x1, x2, ws, q8)),
        "bwd_bf16": jax.jit(jax.grad(
            lambda x1, x2, ws: gemm_set(x1, x2, ws, exact), argnums=(0, 2))),
        "bwd_switchback": jax.jit(jax.grad(
            lambda x1, x2, ws: gemm_set(x1, x2, ws, sb), argnums=(0, 2))),
        "bwd_int8": jax.jit(jax.grad(
            lambda x1, x2, ws: gemm_set(x1, x2, ws, q8), argnums=(0, 2))),
    }
    return fns


def sync(out):
    leaves = jax.tree.leaves(out)
    for l in leaves:
        jax.block_until_ready(l)
    # Full host sync (block_until_ready can return early via the tunnel).
    return float(jnp.asarray(leaves[0]).reshape(-1)[0])


def main():
    which = os.environ.get("BENCH_VARIANTS", "all")
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(size=(M, D)), jnp.bfloat16)
    x2 = jnp.asarray(rng.normal(size=(M, F)), jnp.bfloat16)
    ws = tuple(jnp.asarray(rng.normal(size=s) * s[0] ** -0.5, jnp.bfloat16)
               for s in [(D, D)] * 4 + [(D, F), (F, D)])

    fns = make_fns()
    lines = [f"int8_microbench M={M} D={D} F={F} steps={STEPS} "
             f"backend={jax.devices()[0].platform}"]
    for name, fn in fns.items():
        if which != "all" and not name.startswith(which):
            continue
        mult = 3.0 if name.startswith("bwd") else 1.0  # fwd+dgrad+wgrad
        t0 = time.perf_counter()
        sync(fn(x1, x2, ws))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = fn(x1, x2, ws)
        sync(out)
        dt = (time.perf_counter() - t0) / STEPS
        tput = FWD_FLOPS * mult / dt / 1e12
        line = (f"{name:16s} {dt * 1e3:8.3f} ms  {tput:7.1f} TFLOP/s-equiv"
                f"  (compile {compile_s:.0f}s)")
        print(line)
        lines.append(line)
    with open(os.path.join(os.path.dirname(__file__),
                           "int8_microbench.log"), "a") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
