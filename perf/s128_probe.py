"""BERT s128 step-time decomposition + sweep on one TPU chip (round-4
VERDICT #4: give s128 the s512 treatment — block/impl sweep at the exact
phase-1 shapes, full step accounting, then either move the number or
declare the ceiling measured).

Phase-1 shapes: B=64, S=128, max_pred=20 (the A100 baseline row is
580 seq/s at bs64 s128, ``BERT/README.md:813``).

Usage: python perf/s128_probe.py [attn|parts|step|all]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B, S, H, D = 64, 128, 16, 64
ITERS = 30


def timeit(name, fn, *args, iters=ITERS, flops=None):
    """Device time per call: iterate INSIDE one jit (sequential dependency
    chains each iteration off the previous result), fetch one scalar —
    tunnel-RTT-proof (same methodology as perf/s512_probe.py)."""

    def tree_sum(out):
        return jax.tree_util.tree_reduce(
            lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), out, 0.0)

    @jax.jit
    def loop(a0, *rest):
        def body(_, carry):
            a0, acc = carry
            s = tree_sum(fn(a0, *rest))
            a0 = jax.tree_util.tree_map(
                lambda x: x + (s * 0.0).astype(x.dtype), a0)
            return (a0, acc + s)
        _, acc = jax.lax.fori_loop(0, iters, body, (a0, jnp.float32(0.0)))
        return acc

    float(loop(*args))  # compile + warm
    t0 = time.perf_counter()
    float(loop(*args))
    dt = (time.perf_counter() - t0) / iters
    extra = f"  {flops / dt / 1e12:7.1f} TFLOP/s" if flops else ""
    print(f"  {name:36s} {dt * 1e3:8.2f} ms{extra}", flush=True)
    return dt


def probe_attention():
    """Flash kernel vs XLA-materialized attention at s128: the flash
    kernel's VMEM-streamed design pays off when S^2 scores don't fit; at
    S=128 the full (B,H,128,128) score tensor is only 32 MB bf16, so the
    naive path is in play."""
    from deeplearningexamples_tpu.ops.flash_attention import (
        flash_attention, mha_reference,
    )

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    mask = jnp.ones((B, S), jnp.int32)
    fwd_flops = 4 * B * H * S * S * D
    bwd_flops = fwd_flops * 2.5

    print(f"attention bshd B{B} S{S} H{H} D{D}")
    for bq in (128,):
        f = jax.jit(lambda q, k, v, bq=bq: flash_attention(
            q, k, v, key_mask=mask, layout="bshd", block_q=bq))
        timeit(f"flash fwd block_q={bq}", f, q, k, v, flops=fwd_flops)
        g = jax.jit(jax.grad(lambda q, k, v, bq=bq: flash_attention(
            q, k, v, key_mask=mask, layout="bshd", block_q=bq
        ).astype(jnp.float32).sum(), argnums=(0, 1, 2)))
        timeit(f"flash fwd+bwd block_q={bq}", g, q, k, v,
               flops=(fwd_flops + bwd_flops))

    f = jax.jit(lambda q, k, v: mha_reference(
        jnp.transpose(q, (0, 2, 1, 3)), jnp.transpose(k, (0, 2, 1, 3)),
        jnp.transpose(v, (0, 2, 1, 3)), key_mask=mask))
    timeit("XLA naive fwd", f, q, k, v, flops=fwd_flops)
    g = jax.jit(jax.grad(lambda q, k, v: mha_reference(
        jnp.transpose(q, (0, 2, 1, 3)), jnp.transpose(k, (0, 2, 1, 3)),
        jnp.transpose(v, (0, 2, 1, 3)), key_mask=mask
    ).astype(jnp.float32).sum(), argnums=(0, 1, 2)))
    timeit("XLA naive fwd+bwd", g, q, k, v, flops=(fwd_flops + bwd_flops))


def probe_parts():
    from perf.bert_sweep import run_parts

    print(f"BERT-Large s{S} bs{B} parts")
    run_parts(bs=B, seq=S, max_pred=20)


def probe_step():
    """Full train step (flat pallas LAMB + rbg dropout, the bench config)
    and its MFU at phase-1 shapes."""
    from perf.bert_sweep import run_variant

    sps = run_variant("bench-config", bs=B, seq=S, max_pred=20, rbg=True,
                      flat=True)
    # matmul flops/seq: 2 * 303M active params * 128 tok fwd, x3 for bwd
    mm = 2 * 303e6 * S
    attn = 4 * H * S * S * D * 24
    flops_per_seq = 3 * mm + 3.5 * attn
    print(f"  -> {sps:.1f} seq/s = {sps * flops_per_seq / 1e12:.1f} TFLOP/s "
          f"MFU {sps * flops_per_seq / 197e12 * 100:.0f}% of 197T bf16 peak")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}", flush=True)
    if which in ("attn", "all"):
        probe_attention()
    if which in ("parts", "all"):
        probe_parts()
    if which in ("step", "all"):
        probe_step()
