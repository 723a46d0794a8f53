"""One-shot TPU measurement batch: everything still unmeasured.

Sections run independently; each prints one JSON line and failures don't
kill the rest. Designed for short stable-tunnel windows: run under a
retry wrapper, sections that already succeeded can be skipped with
--skip.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def section(name):
    def deco(fn):
        fn._section = name
        return fn
    return deco


@section("rn50_serving_online")
def rn50_serving_online():
    from deeplearningexamples_tpu.models.convnets import ARCHS, ResNet
    from deeplearningexamples_tpu.serving.batcher import ContinuousBatcher
    from deeplearningexamples_tpu.serving.clients import online_performance_test

    model = ResNet(ARCHS["resnet50"], num_classes=1000, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)),
                           train=False)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    rng = np.random.default_rng(1)

    def model_fn(inputs):
        return {"logits": np.asarray(fwd(variables,
                                         jnp.asarray(inputs["image"])))}

    batcher = ContinuousBatcher(model_fn, batch_buckets=(1, 2, 4, 8, 16, 32),
                                max_delay_s=0.002)
    batcher.warmup({"image": np.zeros((224, 224, 3), np.float32)})

    def make_input():
        return {"image": rng.normal(size=(224, 224, 3)).astype(np.float32)}

    res = online_performance_test(batcher.infer, make_input, concurrency=8,
                                  requests_per_client=16)
    batcher.close()
    return {k: round(v, 2) for k, v in res.items()}


@section("bert_s512")
def bert_s512():
    import dataclasses as dc

    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step
    from deeplearningexamples_tpu.models.bert import BERT_CONFIGS, BertPretrainTask
    from deeplearningexamples_tpu.ops.lamb import lamb

    bs, seq, max_pred = 16, 512, 76
    bcfg = dc.replace(BERT_CONFIGS["large"], attention_dropout=0.0)
    task = BertPretrainTask(bcfg, jnp.bfloat16, max_predictions=max_pred)
    params, mstate = task.init(jax.random.key(0), seq_len=seq)
    tx = lamb(lambda c: 4e-3, weight_decay=0.01, moment_dtype=jnp.bfloat16)
    state = create_train_state(params, tx, jax.random.key(1, impl="rbg"),
                               mstate)
    step = make_train_step(task.loss_fn, tx)
    rng = np.random.default_rng(0)
    labels = np.full((bs, seq), -1, np.int32)
    for i in range(bs):
        pos = rng.choice(seq, size=max_pred, replace=False)
        labels[i, pos] = rng.integers(0, bcfg.vocab_size, size=max_pred)
    batch = {
        "input_ids": jnp.asarray(
            rng.integers(0, bcfg.vocab_size, (bs, seq)), jnp.int32),
        "attention_mask": jnp.ones((bs, seq), jnp.int32),
        "token_type_ids": jnp.zeros((bs, seq), jnp.int32),
        "mlm_labels": jnp.asarray(labels),
        "nsp_label": jnp.asarray(rng.integers(0, 2, (bs,)), jnp.int32),
    }
    for _ in range(4):
        state, m = step(state, batch)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(15):
        state, m = step(state, batch)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / 15
    v = bs / dt
    return {"seq_s": round(v, 1), "vs_baseline_210": round(v / 210.0, 4)}


@section("tts_pipeline")
def tts_pipeline():
    from deeplearningexamples_tpu.models.tts import Tacotron2Task, WaveGlowTask
    from deeplearningexamples_tpu.models.tts.inference import TTSPipeline

    taco = Tacotron2Task(dtype=jnp.bfloat16)
    wg = WaveGlowTask(dtype=jnp.bfloat16)
    tparams, tstate = taco.init(jax.random.key(0))
    wparams, _ = wg.init(jax.random.key(1), batch=1)
    pipe = TTSPipeline(taco, tparams, tstate, wg, wparams,
                       max_decoder_steps=400)
    text = "the quick brown fox jumps over the lazy dog"
    pipe([text])  # compile
    t0 = time.perf_counter()
    iters, n_samples = 3, 0
    for _ in range(iters):
        audio, _ = pipe([text])
        n_samples += sum(a.shape[-1] for a in audio)
    dt = time.perf_counter() - t0
    return {"samples_s": round(n_samples / dt, 1),
            "rtf": round((n_samples / 22050) / dt, 2)}


@section("flash_kblock_s2048")
def flash_kblock_s2048():
    """Long-context check: K-blocked kernel at s2048 (the whole-K kernel's
    VMEM regime limit) — fwd+bwd throughput on real hardware."""
    from deeplearningexamples_tpu.ops import flash_attention

    b, h, s, d = 4, 16, 2048, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32),
                    jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32),
                    jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32),
                    jnp.bfloat16)

    def loss(q, k, v):
        # 1024/1024 blocks measured optimal at s2048 (round-4 sweep,
        # /tmp/causal_sweep grid: 4.86 ms vs 5.40 at 512/512)
        o = flash_attention(q, k, v, causal=True, block_q=1024, block_k=1024)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    r = g(q, k, v)
    float(jnp.sum(r[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(10):
        r = g(q, k, v)
    float(jnp.sum(r[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / 10
    # attention flops fwd+bwd ~ 3.5 * (2 * b*h*s^2*d * 2) with causal 0.5
    flops = 3.5 * 2 * 2 * b * h * s * s * d * 0.5
    return {"ms_per_fwdbwd": round(dt * 1e3, 2),
            "tflops": round(flops / dt / 1e12, 1)}


ALL = [rn50_serving_online, bert_s512, tts_pipeline, flash_kblock_s2048]


if __name__ == "__main__":
    skip = set(sys.argv[1:])
    for fn in ALL:
        name = fn._section
        if name in skip:
            continue
        t0 = time.perf_counter()
        try:
            out = {"metric": name, **fn(),
                   "wall_s": round(time.perf_counter() - t0, 1)}
        except Exception as e:
            out = {"metric": name, "error": repr(e)[:200]}
        print(json.dumps(out), flush=True)
