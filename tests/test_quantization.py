"""Int8 quantization: roundtrip error bounds, stochastic unbiasedness,
quantized matmul accuracy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplearningexamples_tpu.ops.quantization import (
    dequantize,
    int8_matmul,
    quantize_activations,
    quantize_per_channel,
)


def test_weight_quant_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 32)) * np.linspace(0.1, 2.0, 32),
                    jnp.float32)
    q, scale = quantize_per_channel(w, axis=1)
    assert q.dtype == jnp.int8 and scale.shape == (1, 32)
    back = dequantize(q, scale)
    # per-channel symmetric int8: max error <= scale/2 per channel
    err = np.abs(np.asarray(back - w))
    assert (err <= np.asarray(scale)[0] / 2 + 1e-7).all()


def test_activation_quant_unbiased():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(128, 128)), jnp.float32)
    # stochastic rounding: averaging dequantized draws converges to x
    acc = np.zeros(x.shape, np.float64)
    n = 16
    for s in range(n):
        q, scale = quantize_activations(x, seed=s)
        acc += np.asarray(q, np.float64) * float(scale)
    bias = np.abs(acc / n - np.asarray(x)).mean()
    single_err = np.abs(
        np.asarray(quantize_activations(x, 0)[0], np.float64)
        * float(quantize_activations(x, 0)[1]) - np.asarray(x)
    ).mean()
    assert bias < single_err  # averaging reduces error -> rounding is stochastic


def test_int8_matmul_close_to_fp32():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(32, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 48)) * 0.1, jnp.float32)
    w_q, w_scale = quantize_per_channel(w, axis=1)
    out_q = int8_matmul(x, w_q, w_scale[0][None, :])
    out_f = x @ w
    rel = float(jnp.linalg.norm(out_q - out_f) / jnp.linalg.norm(out_f))
    assert rel < 0.02  # <2% relative error for well-scaled int8
