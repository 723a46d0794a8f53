"""Serving/inference perf on one TPU chip (VERDICT round-1 item 6).

Measures, against BASELINE.md reference numbers:
- RN50 inference: bs1 latency + bs256 throughput (reference A100
  1,261 img/s @bs256, 106 img/s @bs1 — ConvNets README inference table)
- RN50 through the serving stack: ContinuousBatcher online test at
  concurrency 8 (exercises the dynamic batcher + padding buckets)
- Tacotron2+WaveGlow text-to-audio pipeline samples/s (reference
  Tacotron2 README inference ~600k samples/s fp16 bs1 on A100)

Prints one JSON line per measurement.
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


def sync(x):
    return float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0])).ravel()[0])


def bench_rn50_infer():
    from deeplearningexamples_tpu.models.convnets import ARCHS, ResNet

    model = ResNet(ARCHS["resnet50"], num_classes=1000, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 224, 224, 3)), train=False)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    out = {}
    for bs in (1, 256):
        x = jnp.asarray(rng.normal(size=(bs, 224, 224, 3)).astype(np.float32))
        for _ in range(3):
            sync(fwd(variables, x))
        iters = 50 if bs == 1 else 20
        t0 = time.perf_counter()
        for _ in range(iters):
            sync(fwd(variables, x))
        dt = (time.perf_counter() - t0) / iters
        out[bs] = {"throughput_img_s": bs / dt, "latency_ms": dt * 1e3}
        print(json.dumps({"metric": f"rn50_infer_bs{bs}",
                          "img_s": round(bs / dt, 1),
                          "latency_ms": round(dt * 1e3, 3)}), flush=True)
    return out, variables, fwd


def bench_rn50_serving(variables, fwd):
    from deeplearningexamples_tpu.serving.batcher import ContinuousBatcher
    from deeplearningexamples_tpu.serving.clients import online_performance_test

    rng = np.random.default_rng(1)

    def model_fn(inputs):
        return {"logits": np.asarray(fwd(variables, jnp.asarray(inputs["image"])))}

    batcher = ContinuousBatcher(model_fn, batch_buckets=(1, 2, 4, 8, 16, 32),
                                max_delay_s=0.002)
    batcher.warmup({"image": np.zeros((224, 224, 3), np.float32)})

    def make_input():
        return {"image": rng.normal(size=(224, 224, 3)).astype(np.float32)}

    res = online_performance_test(batcher.infer, make_input, concurrency=8,
                                  requests_per_client=24)
    # in-process latency decomposition: batcher wait vs device time — the
    # split the tunnel RTT can't pollute (VERDICT r3 weak #6)
    split = batcher.stats()
    batcher.close()
    print(json.dumps({"metric": "rn50_serving_online", **{
        k: round(v, 2) for k, v in res.items()}}), flush=True)
    print(json.dumps({"metric": "rn50_serving_latency_split", **{
        k: (round(v, 3) if isinstance(v, float) else v)
        for k, v in split.items()}}), flush=True)


def bench_tts_pipeline():
    from deeplearningexamples_tpu.models.tts.inference import TTSPipeline
    from deeplearningexamples_tpu.models.tts import Tacotron2Task, WaveGlowTask

    taco = Tacotron2Task(dtype=jnp.bfloat16)
    wg = WaveGlowTask(dtype=jnp.bfloat16)
    tparams, tstate = taco.init(jax.random.key(0))
    wparams, _ = wg.init(jax.random.key(1), batch=1)
    pipe = TTSPipeline(taco, tparams, tstate, wg, wparams,
                       max_decoder_steps=400)
    text = "the quick brown fox jumps over the lazy dog"
    # warmup (compiles the scan decoder + flows)
    pipe([text])
    t0 = time.perf_counter()
    iters = 3
    n_samples = 0
    for _ in range(iters):
        audio, _ = pipe([text])
        n_samples += sum(a.shape[-1] for a in audio)
    dt = time.perf_counter() - t0
    print(json.dumps({"metric": "tts_pipeline",
                      "samples_s": round(n_samples / dt, 1),
                      "rtf": round((n_samples / 22050) / dt, 2)}), flush=True)


if __name__ == "__main__":
    out, variables, fwd = bench_rn50_infer()
    bench_rn50_serving(variables, fwd)
    try:
        bench_tts_pipeline()
    except Exception as e:  # TTS pipeline API drift shouldn't kill the probe
        print(json.dumps({"metric": "tts_pipeline", "error": str(e)}),
              flush=True)
