"""BERT s512 step-time decomposition on one TPU chip (round-3 VERDICT #2).

Times the flash-attention kernel alone at BERT-Large phase-2 shapes, full
model fwd / fwd+bwd, and the two LAMB paths, printing achieved TFLOP/s so
the kernel-level gap is visible in isolation.

Usage: python perf/s512_probe.py [attn|parts|lamb|all]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B, S, H, D = 16, 512, 16, 64
ITERS = 30


def timeit(name, fn, *args, iters=ITERS, flops=None):
    """Device time per call: iterate INSIDE one jit (sequential dependency
    chains each iteration off the previous result), fetch one scalar.
    Python-side dispatch through the tunnel (~2 ms RTT) would otherwise set
    the floor; fetching big arrays is worse (NOTES.md methodology)."""

    def tree_sum(out):
        return jax.tree_util.tree_reduce(
            lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), out, 0.0)

    @jax.jit
    def loop(a0, *rest):
        def body(_, carry):
            a0, acc = carry
            s = tree_sum(fn(a0, *rest))
            # data dependency without changing the value: next iteration's
            # first arg depends on this iteration's output
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
    from deeplearningexamples_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    mask = jnp.ones((B, S), jnp.int32)
    fwd_flops = 4 * B * H * S * S * D          # QK^T + PV
    bwd_flops = fwd_flops * 2.5                 # dQ,dK,dV + recompute

    print(f"flash attention bshd B{B} S{S} H{H} D{D}")
    for bq in (256, 512):
        f = jax.jit(lambda q, k, v, bq=bq: flash_attention(
            q, k, v, key_mask=mask, layout="bshd", block_q=bq))
        timeit(f"fwd block_q={bq}", f, q, k, v, flops=fwd_flops)

        g = jax.jit(jax.grad(lambda q, k, v, bq=bq: flash_attention(
            q, k, v, key_mask=mask, layout="bshd", block_q=bq
        ).astype(jnp.float32).sum(), argnums=(0, 1, 2)))
        timeit(f"fwd+bwd block_q={bq}", g, q, k, v,
               flops=(fwd_flops + bwd_flops))
    for bq, bk in ((512, 512), (256, 256)):
        g = jax.jit(jax.grad(lambda q, k, v, bq=bq, bk=bk: flash_attention(
            q, k, v, key_mask=mask, layout="bshd", block_q=bq, block_k=bk
        ).astype(jnp.float32).sum(), argnums=(0, 1, 2)))
        timeit(f"fwd+bwd kblk bq={bq} bk={bk}", g, q, k, v,
               flops=(fwd_flops + bwd_flops))
    # dropout cost in-kernel
    g = jax.jit(jax.grad(lambda q, k, v: flash_attention(
        q, k, v, key_mask=mask, layout="bshd", dropout_rate=0.1, dropout_seed=7
    ).astype(jnp.float32).sum(), argnums=(0, 1, 2)))
    timeit("fwd+bwd dropout=0.1", g, q, k, v, flops=(fwd_flops + bwd_flops))
    # XLA reference (materialized scores) for comparison
    from deeplearningexamples_tpu.ops.flash_attention import mha_reference

    g = jax.jit(jax.grad(lambda q, k, v: mha_reference(
        jnp.transpose(q, (0, 2, 1, 3)), jnp.transpose(k, (0, 2, 1, 3)),
        jnp.transpose(v, (0, 2, 1, 3)), key_mask=mask
    ).astype(jnp.float32).sum(), argnums=(0, 1, 2)))
    timeit("fwd+bwd XLA naive", g, q, k, v, flops=(fwd_flops + bwd_flops))


def probe_parts():
    import dataclasses as dc

    from deeplearningexamples_tpu.models.bert import BERT_CONFIGS, BertPretrainTask
    from perf.bert_sweep import make_batch

    bcfg = dc.replace(BERT_CONFIGS["large"])
    task = BertPretrainTask(bcfg, jnp.bfloat16, max_predictions=80)
    params, _ = task.init(jax.random.key(0), seq_len=S)
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in
             make_batch(B, S, bcfg.vocab_size, 80, rng).items()}
    key = jax.random.key(2, impl="rbg")

    loss = lambda p, b, r: task.loss_fn(p, {}, b, r)[0]
    n_param = 303e6  # compute-active params (no embeddings in matmul flops)
    tok = B * S
    mm = 2 * n_param * tok
    attn = 4 * B * H * S * S * D * 24
    print(f"BERT-Large s512 bs{B} parts  (fwd flops {(mm+attn)/1e12:.2f}T)")
    timeit("fwd (train mode)", jax.jit(loss), params, batch, key,
           flops=mm + attn)
    timeit("fwd+bwd", jax.jit(jax.grad(loss)), params, batch, key,
           flops=3 * mm + 3.5 * attn)


def probe_lamb():
    from deeplearningexamples_tpu.models.bert import BERT_CONFIGS, BertPretrainTask
    from deeplearningexamples_tpu.ops.lamb import lamb

    task = BertPretrainTask(BERT_CONFIGS["large"], jnp.bfloat16, max_predictions=80)
    params, _ = task.init(jax.random.key(0), seq_len=S)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 1e-4, params)

    for mdt in (jnp.float32, jnp.bfloat16):
        tx = lamb(lambda c: 6e-3, weight_decay=0.01, moment_dtype=mdt)
        opt_state = tx.init(params)

        @jax.jit
        def opt_only(g, s, p):
            import optax
            u, s2 = tx.update(g, s, p)
            return optax.apply_updates(p, u), s2

        bytes_per = 28 if mdt == jnp.bfloat16 else 40
        dt = timeit(f"XLA lamb mdt={mdt.__name__}", opt_only, grads,
                    opt_state, params)
        print(f"    {n * bytes_per / dt / 1e9:7.1f} GB/s effective "
              f"(floor {n * bytes_per / 819e9 * 1e3:.1f} ms @819GB/s)")

    from deeplearningexamples_tpu.core.flat import (
        _flat_lamb_update, _make_layout_blocked,
    )

    layout = _make_layout_blocked(params)
    leaves = jax.tree_util.tree_leaves(params)
    rows = layout.total // 1024
    g2 = jnp.ones((rows, 1024), jnp.float32) * 1e-4
    p2 = jnp.ones((rows, 1024), jnp.float32)
    wd = jnp.asarray([0.01] * layout.n_leaves, jnp.float32)
    seg = jnp.asarray(layout.seg_ids, jnp.int32)
    hyp = jnp.asarray([0.9, 0.999, 1e-6, 1.0, 1.0, 1.0], jnp.float32)
    for mdt in (jnp.float32, jnp.bfloat16):
        m2 = jnp.zeros((rows, 1024), mdt)
        v2 = jnp.zeros((rows, 1024), mdt)

        def run(g2, p2, m2, v2):
            return _flat_lamb_update(
                g2, p2, m2, v2, wd, seg, hyp, jnp.float32(6e-3),
                n_blocks=len(layout.seg_ids), n_leaves=layout.n_leaves)

        bytes_per = 28 if mdt == jnp.bfloat16 else 40
        # donation invalidates buffers — rebuild each iter outside timing is
        # not possible; run with copies via jnp.array to keep inputs alive
        runj = jax.jit(lambda g, p, m, v: run(jnp.array(g), jnp.array(p),
                                              jnp.array(m), jnp.array(v)))
        dt = timeit(f"flat pallas lamb mdt={mdt.__name__}", runj, g2, p2, m2, v2)
        print(f"    {layout.total * bytes_per / dt / 1e9:7.1f} GB/s effective"
              f" (floor {layout.total * bytes_per / 819e9 * 1e3:.1f} ms)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("attn", "all"):
        probe_attention()
    if which in ("parts", "all"):
        probe_parts()
    if which in ("lamb", "all"):
        probe_lamb()
