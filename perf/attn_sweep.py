"""Flash-attention bshd block/fold sweep at BERT-Large phase-2 shapes.

Sweeps heads-per-program folding (hpb) and q-block size on the real chip,
with the production config (bf16, key mask, in-kernel dropout 0.1) — the
ordering feeds the _heads_per_block default.

Usage: python perf/attn_sweep.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import importlib

fa = importlib.import_module("deeplearningexamples_tpu.ops.flash_attention")

B, S, H, D = 16, 512, 16, 64
ITERS = 30
FWD_FLOPS = 4 * B * H * S * S * D
FB_FLOPS = FWD_FLOPS * 3.5


def timeit(name, fn, *args, flops=None):
    @jax.jit
    def loop(a0, *rest):
        def body(_, carry):
            a0, acc = carry
            out = fn(a0, *rest)
            s = jax.tree_util.tree_reduce(
                lambda acc2, x: acc2 + jnp.sum(x.astype(jnp.float32)), out, 0.0)
            a0 = a0 + (s * 0.0).astype(a0.dtype)
            return (a0, acc + s)
        _, acc = jax.lax.fori_loop(0, ITERS, body, (a0, jnp.float32(0.0)))
        return acc

    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    dt = (time.perf_counter() - t0) / ITERS
    extra = f"  {flops / dt / 1e12:7.1f} TFLOP/s" if flops else ""
    print(f"  {name:40s} {dt * 1e3:8.2f} ms{extra}", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    mask = jnp.ones((B, S), jnp.int32)

    orig = fa._heads_per_block
    for hpb in (2, 4, 8):
        fa._heads_per_block = lambda d, _h=hpb: _h
        for bq in (256, 512):
            for rate in (0.0, 0.1):
                g = jax.jit(jax.grad(
                    lambda q, k, v, bq=bq, rate=rate: fa.flash_attention(
                        q, k, v, key_mask=mask, layout="bshd", block_q=bq,
                        dropout_rate=rate, dropout_seed=7,
                    ).astype(jnp.float32).sum(), argnums=(0, 1, 2)))
                timeit(f"fwd+bwd hpb={hpb} bq={bq} drop={rate}", g, q, k, v,
                       flops=FB_FLOPS)
    fa._heads_per_block = orig


if __name__ == "__main__":
    main()
