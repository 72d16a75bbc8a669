"""Tests for the dynamic int8 quantized matmul (ops/quant.py).

Pins: exactness on grid-representable inputs, bounded error on random
inputs, straight-through-estimator gradients (switchback wgrad ==
exact wgrad bit-for-bit at fp32), and the quant_linear wrapper's
shape/bias handling. The end-to-end loss-trajectory bound lives in
test_train_engine.py::test_quant_trajectory_tracks_bf16.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_finegrained_alignment_tpu.ops.quant import (int8_matmul,
                                                      quant_linear,
                                                      quant_matmul)


def _grid_exact(rng, m, k, scale_rows=True):
    """Rows (or cols) of small ints whose absmax is exactly 127 — the
    absmax grid represents them exactly, so quantization is lossless."""
    x = rng.integers(-127, 128, size=(m, k)).astype(np.float32)
    if scale_rows:
        x[:, 0] = 127.0    # pin each row's absmax
    else:
        x[0, :] = 127.0    # pin each column's absmax
    return x


def test_int8_matmul_exact_on_grid_inputs():
    rng = np.random.default_rng(0)
    x = _grid_exact(rng, 16, 32, scale_rows=True)
    w = _grid_exact(rng, 32, 8, scale_rows=False)
    y = int8_matmul(jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_array_equal(np.asarray(y), x @ w)


def test_int8_matmul_error_bounded_on_random_inputs():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(64, 96)).astype(np.float32)
    w = rng.normal(size=(96, 48)).astype(np.float32)
    y = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(w)))
    exact = x @ w
    # absmax grid: per-operand elementwise error <= absmax/254 (~1.4% of
    # a unit-normal's ~3.5 absmax); K=96 accumulation stays well under 5%
    # of the output's scale.
    assert np.max(np.abs(y - exact)) < 0.05 * np.abs(exact).max()
    cos = (y * exact).sum() / (np.linalg.norm(y) * np.linalg.norm(exact))
    assert cos > 0.999


@pytest.mark.parametrize("mode", ["switchback", "int8"])
def test_quant_matmul_ste_gradients(mode):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(32, 24)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(24, 16)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))

    def loss(x, w):
        return jnp.sum(quant_matmul(x, w, mode) * g)

    dx, dw = jax.grad(loss, argnums=(0, 1))(x, w)
    dx_exact = np.asarray(g) @ np.asarray(w).T
    dw_exact = np.asarray(x).T @ np.asarray(g)
    if mode == "switchback":
        # wgrad is the exact fp32 matmul — bit-for-bit.
        np.testing.assert_allclose(np.asarray(dw), dw_exact, rtol=1e-6,
                                   atol=1e-5)
    else:
        assert np.max(np.abs(np.asarray(dw) - dw_exact)) \
            < 0.05 * np.abs(dw_exact).max()
    # dgrad is int8 in both modes — tolerance-bounded.
    assert np.max(np.abs(np.asarray(dx) - dx_exact)) \
        < 0.05 * np.abs(dx_exact).max()


def test_quant_matmul_zero_rows_are_finite():
    x = jnp.zeros((4, 8), jnp.float32)
    w = jnp.ones((8, 4), jnp.float32)
    y, vjp = jax.vjp(lambda a, b: quant_matmul(a, b, "int8"), x, w)
    assert np.all(np.asarray(y) == 0.0)
    dx, dw = vjp(jnp.ones_like(y))
    assert np.all(np.isfinite(np.asarray(dx)))
    assert np.all(np.isfinite(np.asarray(dw)))


def test_quant_linear_shapes_bias_and_dtype():
    rng = np.random.default_rng(3)
    p = {"kernel": jnp.asarray(rng.normal(size=(12, 20)).astype(np.float32)),
         "bias": jnp.asarray(rng.normal(size=(20,)).astype(np.float32))}
    x = jnp.asarray(rng.normal(size=(2, 5, 12)).astype(np.float32))
    y = quant_linear(p, x, jnp.bfloat16, "switchback")
    assert y.shape == (2, 5, 20)
    assert y.dtype == jnp.bfloat16
    exact = np.asarray(x, np.float32) @ np.asarray(p["kernel"]) \
        + np.asarray(p["bias"])
    assert np.max(np.abs(np.asarray(y, np.float32) - exact)) \
        < 0.08 * np.abs(exact).max() + 0.05   # bf16 cast + int8 grid
