"""BERT-Large pretrain throughput sweep on one TPU chip.

Round-2 perf work (VERDICT item 3): find the lever stack that closes the
gap from 317 seq/s to >=366 seq/s (flops-normalized parity with the A100
baseline of 580 seq/s, reference LanguageModeling/BERT/README.md perf table).

Usage: python perf/bert_sweep.py [variant ...]
Variants: base bf16mom remat bs96 bs128 flat s512
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def make_batch(bs, seq, vocab, max_pred, rng):
    labels = np.full((bs, seq), -1, np.int32)
    for i in range(bs):
        pos = rng.choice(seq, size=max_pred, replace=False)
        labels[i, pos] = rng.integers(0, vocab, size=max_pred)
    return {
        "input_ids": rng.integers(0, vocab, size=(bs, seq)).astype(np.int32),
        "attention_mask": np.ones((bs, seq), np.int32),
        "token_type_ids": np.zeros((bs, seq), np.int32),
        "mlm_labels": labels,
        "nsp_label": rng.integers(0, 2, size=(bs,)).astype(np.int32),
    }


def run_variant(name, bs=64, seq=128, max_pred=20, remat=False,
                moment_dtype=jnp.float32, flat=False, rbg=False, iters=20,
                block_q=None):
    if block_q is not None:
        import functools as _ft

        from deeplearningexamples_tpu.models.bert import modeling as _m
        from deeplearningexamples_tpu.ops.flash_attention import (
            flash_attention as _fa_fn,
        )
        _m.flash_attention = _ft.partial(_fa_fn, block_q=block_q)
    import dataclasses as dc

    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step
    from deeplearningexamples_tpu.models.bert import BERT_CONFIGS, BertPretrainTask
    from deeplearningexamples_tpu.ops.lamb import lamb

    bcfg = dc.replace(BERT_CONFIGS["large"], remat=remat, attention_dropout=0.0)
    task = BertPretrainTask(bcfg, jnp.bfloat16, max_predictions=max_pred)
    params, mstate = task.init(jax.random.key(0), seq_len=seq)
    tx = lamb(lambda c: 6e-3, weight_decay=0.01, moment_dtype=moment_dtype)
    if flat:
        from deeplearningexamples_tpu.core.flat import flatten_train
        task_loss, tx, params = flatten_train(
            task.loss_fn, params, lr=lambda c: 6e-3, moment_dtype=moment_dtype
        )
    else:
        task_loss = task.loss_fn
    key = jax.random.key(1, impl="rbg") if rbg else jax.random.key(1)
    state = create_train_state(params, tx, key, mstate)
    step = make_train_step(task_loss, tx)

    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in
             make_batch(bs, seq, bcfg.vocab_size, max_pred, rng).items()}

    t_c0 = time.perf_counter()
    for _ in range(3):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    compile_s = time.perf_counter() - t_c0

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:12s} bs={bs:4d} seq={seq}  step={dt*1e3:8.2f} ms  "
          f"{bs/dt:8.1f} seq/s   (warmup {compile_s:.1f}s)", flush=True)
    return bs / dt


def run_parts(bs=64, seq=128, max_pred=20, iters=20):
    """Time fwd / fwd+bwd / optimizer separately to locate the step-time mass."""
    import dataclasses as dc

    from deeplearningexamples_tpu.models.bert import BERT_CONFIGS, BertPretrainTask
    from deeplearningexamples_tpu.ops.lamb import lamb

    bcfg = dc.replace(BERT_CONFIGS["large"], attention_dropout=0.0)
    task = BertPretrainTask(bcfg, jnp.bfloat16, max_predictions=max_pred)
    params, _ = task.init(jax.random.key(0), seq_len=seq)
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in
             make_batch(bs, seq, bcfg.vocab_size, max_pred, rng).items()}
    key = jax.random.key(2)

    def timeit(name, fn, *args):
        out = None
        for _ in range(3):
            out = fn(*args)
        jax.block_until_ready(out)
        sync = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(sync)).ravel()[:1]
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0])).ravel()[:1]
        dt = (time.perf_counter() - t0) / iters
        print(f"  {name:24s} {dt*1e3:8.2f} ms", flush=True)
        return dt

    loss = lambda p, b, r: task.loss_fn(p, {}, b, r)[0]
    fwd = jax.jit(loss)
    grad = jax.jit(jax.grad(loss))
    key_rbg = jax.random.key(2, impl="rbg")

    def loss_nodrop(p, b, r):
        mlm_logits, nsp_logits = task.model.apply(
            {"params": p}, b["input_ids"], b["attention_mask"],
            b["token_type_ids"], deterministic=True)
        return jnp.sum(mlm_logits.astype(jnp.float32)) * 1e-9

    grad_nodrop = jax.jit(jax.grad(loss_nodrop))

    tx = lamb(lambda c: 6e-3, weight_decay=0.01)
    opt_state = tx.init(params)

    @jax.jit
    def opt_only(g, s, p):
        import optax
        u, s2 = tx.update(g, s, p)
        return optax.apply_updates(p, u), s2

    timeit("fwd (train mode)", fwd, params, batch, key)
    timeit("fwd+bwd", grad, params, batch, key)
    timeit("fwd+bwd rbg-dropout", grad, params, batch, key_rbg)
    timeit("fwd+bwd no-dropout", grad_nodrop, params, batch, key)
    g = grad(params, batch, key)
    jax.block_until_ready(g)
    timeit("lamb update", opt_only, g, opt_state, params)


VARIANTS = {
    "base":    dict(),
    "bf16mom": dict(moment_dtype=jnp.bfloat16),
    "remat":   dict(remat=True),
    "bs96":    dict(bs=96),
    "bs128":   dict(bs=128),
    "bs128r":  dict(bs=128, remat=True),
    "bs256r":  dict(bs=256, remat=True),
    "flat":    dict(flat=True, rbg=True),
    "flatbf16": dict(flat=True, rbg=True, moment_dtype=jnp.bfloat16),
    "flat96":  dict(flat=True, rbg=True, bs=96),
    "flat128": dict(flat=True, rbg=True, bs=128),
    "flat128r": dict(flat=True, rbg=True, bs=128, remat=True),
    "rbgonly": dict(rbg=True),
    "rbgbf16": dict(rbg=True, moment_dtype=jnp.bfloat16),
    "rbg96":   dict(rbg=True, moment_dtype=jnp.bfloat16, bs=96),
    "rbg128":  dict(rbg=True, moment_dtype=jnp.bfloat16, bs=128),
    "s512":    dict(seq=512, max_pred=76, bs=16, rbg=True,
                    moment_dtype=jnp.bfloat16),
    "s512b32": dict(seq=512, max_pred=76, bs=32, rbg=True,
                    moment_dtype=jnp.bfloat16),
    "s512r":   dict(seq=512, max_pred=76, bs=32, remat=True, rbg=True,
                    moment_dtype=jnp.bfloat16),
    "s512f":   dict(seq=512, max_pred=76, bs=16, flat=True, rbg=True),
    "s512f32": dict(seq=512, max_pred=76, bs=32, flat=True, rbg=True),
    "s512q512": dict(seq=512, max_pred=76, bs=16, rbg=True,
                     moment_dtype=jnp.bfloat16, block_q=512),
    "s512q128": dict(seq=512, max_pred=76, bs=16, rbg=True,
                     moment_dtype=jnp.bfloat16, block_q=128),
    "s512b32n": dict(seq=512, max_pred=76, bs=32, rbg=True,
                     moment_dtype=jnp.bfloat16),
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["base", "bf16mom", "remat", "bs96"]
    print(f"devices: {jax.devices()}", flush=True)
    for n in names:
        if n == "parts":
            run_parts()
        else:
            run_variant(n, **VARIANTS[n])
