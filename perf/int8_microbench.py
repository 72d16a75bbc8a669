"""Int8-vs-bf16 matmul microbench at CLIP projection shapes (TPU).

Go/no-go for the quantized training path (``ops/quant.py``): times one
ViT-B/16 vision layer's projection GEMM set (q/k/v/out [768,768]x4,
fc1 [768,3072], fc2 [3072,768] at M = 32x197 = 6304 — the microbatch-32
production regime) as

  * ``bf16``         — the exact path (jnp matmul, bf16 in / f32 acc)
  * ``int8``         — dynamic per-row/per-col absmax quantize + int8 MXU
                       matmul + dequant, i.e. the REAL cost including the
                       quantization elementwise passes.
  * ``int8_static``  — pre-quantized int8 operands + scalar dequant: the
                       pure MXU-int8 ceiling through XLA (what a fused
                       quantize-in-VMEM kernel could approach).

and the training direction (grad of a sum-of-outputs loss, covering
dgrad+wgrad) for modes none/switchback/int8.

Each jitted call runs the GEMM set REPEAT times via lax.scan with a
carry-perturbed input (defeats LICM/CSE), so the ~1.5 ms per-dispatch
tunnel overhead is amortized to noise; the perturbation pass costs the
same in every variant. v5e peak: 394.7 int8 TOPS vs 197.4 bf16 TFLOP/s —
ideal fwd speedup 2x.

Usage:  BENCH_VARIANTS=fwd|bwd|all python perf/int8_microbench.py
Results appended to perf/int8_microbench.log.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from clip_finegrained_alignment_tpu.ops.quant import quant_matmul

M, D, F = 32 * 197, 768, 3072
STEPS = int(os.environ.get("BENCH_STEPS", "10"))
REPEAT = int(os.environ.get("BENCH_REPEAT", "20"))
# FLOPs of the GEMM set (fwd): 4 DxD + DxF + FxD at M rows.
FWD_FLOPS = 2 * M * (4 * D * D + D * F + F * D)


def gemm_set(x1, x2, ws, mm):
    """Sum-of-outputs scalar over the 6-projection GEMM set."""
    tot = 0.0
    for w in ws[:5]:                       # q k v out fc1 on x1 [M, D]
        tot += jnp.sum(mm(x1, w).astype(jnp.float32))
    tot += jnp.sum(mm(x2, ws[5]).astype(jnp.float32))   # fc2 on [M, F]
    return tot


def gemm_outputs(x1, x2, ws, mm):
    return [mm(x1, w) for w in ws[:5]] + [mm(x2, ws[5])]


def repeat_scan(per_iter):
    """Run ``per_iter(x1, x2, ws)`` REPEAT times, perturbing the inputs by
    the (tiny) carry so XLA can neither hoist nor CSE the body."""
    def wrapped(x1, x2, ws):
        def body(tot, _):
            eps = (tot * 1e-30).astype(x1.dtype)
            return per_iter(x1 + eps, x2 + eps, ws), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=REPEAT)
        return tot
    return wrapped


def make_fns():
    exact = lambda x, w: x @ w
    sb = lambda x, w: quant_matmul(x, w, "switchback")
    q8 = lambda x, w: quant_matmul(x, w, "int8")

    def static_int8(x1, x2, wqs):
        """Pre-quantized int8 operands; x re-quantizes with a FIXED scale
        (one cheap cast pass, no absmax reduce) — the MXU ceiling probe."""
        def mm(xq, wq):
            y = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return y.astype(jnp.float32) * 1e-4
        tot = 0.0
        x1q = jnp.clip(x1 * 32.0, -127, 127).astype(jnp.int8)
        x2q = jnp.clip(x2 * 32.0, -127, 127).astype(jnp.int8)
        for wq in wqs[:5]:
            tot += jnp.sum(mm(x1q, wq))
        tot += jnp.sum(mm(x2q, wqs[5]))
        return tot

    # Fixed random cotangents for the training direction. A sum-of-outputs
    # loss is NOT usable for the bwd comparison: its cotangent is a
    # broadcast-ones matrix and XLA's algebraic simplifier rewrites
    # dot(ones, w) into a reduction — the exact path then skips the real
    # dgrad/wgrad GEMMs while the opaque custom-vjp int8 path cannot
    # (first run measured bf16 "bwd" at 465 TFLOP/s — above peak).
    crng = np.random.default_rng(42)
    cots = tuple(
        jnp.asarray(crng.normal(size=(M, s[1])), jnp.bfloat16)
        for s in [(D, D)] * 4 + [(D, F), (F, D)])

    def bwd_per_iter(mm):
        def per_iter(x1, x2, ws):
            _, vjp = jax.vjp(
                lambda a, b, c: gemm_outputs(a, b, c, mm), x1, x2, ws)
            grads = vjp(list(cots))
            return sum(jnp.sum(t.astype(jnp.float32))
                       for t in jax.tree.leaves(grads))
        return per_iter

    fns = {
        "fwd_bf16": (False, lambda x1, x2, ws:
                     gemm_set(x1, x2, ws, exact)),
        "fwd_int8": (False, lambda x1, x2, ws:
                     gemm_set(x1, x2, ws, q8)),
        "fwd_int8_static": ("static", static_int8),
        "bwd_bf16": (True, bwd_per_iter(exact)),
        "bwd_switchback": (True, bwd_per_iter(sb)),
        "bwd_int8": (True, bwd_per_iter(q8)),
    }
    return {name: (kind, jax.jit(repeat_scan(fn)))
            for name, (kind, fn) in fns.items()}


def main():
    which = os.environ.get("BENCH_VARIANTS", "all")
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(size=(M, D)), jnp.bfloat16)
    x2 = jnp.asarray(rng.normal(size=(M, F)), jnp.bfloat16)
    ws = tuple(jnp.asarray(rng.normal(size=s) * s[0] ** -0.5, jnp.bfloat16)
               for s in [(D, D)] * 4 + [(D, F), (F, D)])
    wqs = tuple(jnp.clip(w.astype(jnp.float32) * 127, -127, 127
                         ).astype(jnp.int8) for w in ws)

    fns = make_fns()
    lines = [f"int8_microbench M={M} D={D} F={F} steps={STEPS} "
             f"repeat={REPEAT} backend={jax.devices()[0].platform}"]
    for name, (kind, fn) in fns.items():
        if which != "all" and not name.startswith(which):
            continue
        mult = 3.0 if name.startswith("bwd") else 1.0  # fwd+dgrad+wgrad
        args = (x1, x2, wqs if kind == "static" else ws)
        t0 = time.perf_counter()
        float(fn(*args))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = fn(*args)
        float(out)   # full host sync through the tunnel
        dt = (time.perf_counter() - t0) / (STEPS * REPEAT)
        tput = FWD_FLOPS * mult / dt / 1e12
        line = (f"{name:16s} {dt * 1e3:8.3f} ms/set  {tput:7.1f} "
                f"TFLOP/s-equiv  (compile {compile_s:.0f}s)")
        print(line)
        lines.append(line)
    with open(os.path.join(os.path.dirname(__file__),
                           "int8_microbench.log"), "a") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
