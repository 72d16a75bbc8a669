"""Dynamic int8 quantized matmul — the MXU's double-rate integer path.

TPU v5e executes int8×int8→int32 matmuls at 394.7 TOPS, exactly 2× the
197.4 TFLOP/s bf16 peak ("How to Scale Your Model", hardware table). The
bf16 roofline argued in BASELINE.md (ViT-B/16 chip-limited at ~0.63 MFU)
is therefore not the hardware ceiling: re-expressing the encoder's
projection GEMMs (q/k/v/out/fc1/fc2 + patch embedding ≈ 95% of model
FLOPs; the [S×S] attention einsums stay bf16) as dynamically-quantized
int8 matmuls halves their MXU time.

The recipe is SwitchBack's (Wortsman et al., arXiv:2304.13013 — int8
linear layers developed *for CLIP training*): per-row (per-example)
absmax scales for activations, per-column (per-output-feature) scales
for weights, round-to-nearest, and a straight-through estimator around
the rounding. Three modes:

* ``switchback`` — int8 forward and input-gradient (dgrad) matmuls;
  the weight gradient (wgrad) stays bf16 (gradients' heavy tails make
  wgrad the quantization-sensitive one; this is SwitchBack's published
  configuration).
* ``int8`` — all three matmuls int8 (fwd + dgrad + wgrad), the maximum-
  throughput mode; wgrad operands are quantized over the example axis.
* ``none`` — the exact bf16 path (``models/clip.py::linear``).

Quantization error is bounded by the absmax grid: |x - q·s| ≤ s/2 with
s = absmax/127, i.e. ≤ 0.4% of the row's dynamic range per operand.
``tests/test_quant.py`` pins forward/backward behavior (exact on
grid-representable inputs, tolerance-bounded on random ones, STE
gradients) and the trajectory test bounds loss drift vs bf16 training.

No reference counterpart: the reference trains fp16-AMP via torch
autocast (``/root/reference/finetune/finetuner.py:51,119``); this is a
TPU-specific throughput upgrade behind ``TrainConfig.quant``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

MODES = ("none", "switchback", "int8")


def _absmax_quant(x: jax.Array, axis: int) -> tuple[jax.Array, jax.Array]:
    """Symmetric absmax int8 quantization along ``axis``.

    Returns (q int8, scale f32) with q·scale ≈ x; scale keeps the reduced
    axis as size 1 for broadcasting. The 1e-12 floor makes all-zero rows
    quantize to zeros instead of NaN.
    """
    xf = x.astype(jnp.float32)
    a = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    s = jnp.maximum(a, 1e-12) / 127.0
    q = jnp.round(xf / s).astype(jnp.int8)   # |xf/s| ≤ 127 by construction
    return q, s


def int8_matmul(x: jax.Array, w: jax.Array) -> jax.Array:
    """[M, K] @ [K, N] via dynamically-quantized int8 on the MXU.

    Per-row scales for ``x`` (each example sees its own grid), per-column
    scales for ``w`` (each output feature its own). Returns f32
    ``(xq @ wq) · sx · sw``.
    """
    xq, sx = _absmax_quant(x, axis=1)
    wq, sw = _absmax_quant(w, axis=0)
    y = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (sx * sw)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def quant_matmul(x: jax.Array, w: jax.Array, mode: str = "switchback"
                 ) -> jax.Array:
    """Quantized ``x @ w`` with straight-through gradients.

    x: [M, K], w: [K, N]; returns [M, N] in x's dtype. ``mode`` selects
    the backward precision (see module docstring).
    """
    return int8_matmul(x, w).astype(x.dtype)


def _quant_matmul_fwd(x, w, mode):
    return int8_matmul(x, w).astype(x.dtype), (x, w)


def _quant_matmul_bwd(mode, res, g):
    x, w = res
    # dgrad: dx[m,k] = Σ_n g[m,n] w[k,n] — per-row g scales (per example),
    # per-column w.T scales (per input feature).
    dx = int8_matmul(g, w.T).astype(x.dtype)
    if mode == "int8":
        # wgrad: dw[k,n] = Σ_m x[m,k] g[m,n] — quantized over the example
        # axis on both operands (per-k rows of x.T, per-n columns of g).
        dw = int8_matmul(x.T, g).astype(w.dtype)
    else:  # switchback: exact-precision wgrad (fp32-accumulated by XLA)
        dw = jax.lax.dot_general(x.T, g, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32
                                 ).astype(w.dtype)
    return dx, dw


quant_matmul.defvjp(_quant_matmul_fwd, _quant_matmul_bwd)


def quant_linear(p, x: jax.Array, dtype, mode: str) -> jax.Array:
    """Drop-in for ``models/clip.py::linear`` on the int8 path.

    Collapses leading dims to one example axis, runs the quantized
    matmul, adds the (exact) bias.
    """
    kernel = p["kernel"]
    if dtype is not None:
        kernel = kernel.astype(dtype)
        x = x.astype(dtype)
    shape = x.shape
    y = quant_matmul(x.reshape(-1, shape[-1]), kernel, mode)
    y = y.reshape(shape[:-1] + (kernel.shape[1],))
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y
