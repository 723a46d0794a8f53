"""Benchmark: ResNet-50 v1.5 training throughput on one TPU chip.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: reference RN50 mixed-precision training on 1xA100 80GB =
2,470 img/s (BASELINE.md, resnet50v1.5/README.md:598).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_S = 2470.0


def main():
    from deeplearningexamples_tpu.core import optimizers as opt
    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step
    from deeplearningexamples_tpu.models.convnets import ARCHS, ClassificationTask, ResNet
    from deeplearningexamples_tpu.parallel import MeshSpec, build_mesh, shard_batch

    batch_size = 256
    mesh = build_mesh(MeshSpec())
    task = ClassificationTask(
        ResNet(ARCHS["resnet50"], num_classes=1000, dtype=jnp.bfloat16),
        label_smoothing=0.1,
        num_classes=1000,
    )
    params, mstate = task.init(jax.random.key(0), image_shape=(224, 224, 3))
    sched = opt.lr_cosine_policy(0.256, 8, 90, steps_per_epoch=500)
    tx = opt.sgd(sched, momentum=0.875, weight_decay=3.05e-5, params_for_mask=params)
    state = create_train_state(params, tx, jax.random.key(1), mstate)
    step = make_train_step(task.loss_fn, tx)

    rng = np.random.default_rng(0)
    batch = shard_batch(
        mesh,
        {
            "image": rng.normal(size=(batch_size, 224, 224, 3)).astype(np.float32),
            "label": rng.integers(0, 1000, size=(batch_size,)).astype(np.int32),
        },
    )

    # warmup (compile + 5 steps); sync by fetching a scalar — on the tunneled
    # axon backend block_until_ready can return before execution completes
    for _ in range(5):
        state, metrics = step(state, batch)
    float(metrics["loss"])

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch)
    float(metrics["loss"])  # forces the whole 30-step chain
    dt = time.perf_counter() - t0
    ips = batch_size * iters / dt

    print(
        json.dumps(
            {
                "metric": "resnet50_train_throughput",
                "value": round(ips, 1),
                "unit": "img/s/chip",
                "vs_baseline": round(ips / BASELINE_IMG_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
