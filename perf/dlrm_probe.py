"""DLRM roofline probe: where do the 87 ms/step go on one v5e chip?

Measures each stage of the DLRM step in isolation (VERDICT round-1 item 2:
"produce a measured roofline doc proving where the chip limit is"):
  - forward gather, random vs sorted indices (locality headroom)
  - embedding backward: XLA scatter-add vs sort+segment_sum
  - MLPs + interaction without the embedding path
  - full train step (the bench number)

Config matches bench.py: bs 65536, 26 tables x 100k x 128 fp32.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

BS = 65536
N_TABLES = 26
CARD = 100_000
D = 128
V = N_TABLES * CARD


def timeit(name, fn, *args, iters=10, bytes_moved=None):
    out = None
    for _ in range(3):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(jax.device_get(leaf)).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0])).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    bw = f"  {bytes_moved / dt / 1e9:7.1f} GB/s" if bytes_moved else ""
    print(f"{name:34s} {dt * 1e3:8.2f} ms{bw}", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    idx = rng.integers(0, CARD, size=(BS, N_TABLES)).astype(np.int32)
    idx = idx + (np.arange(N_TABLES, dtype=np.int32) * CARD)[None, :]
    flat = jnp.asarray(idx.reshape(-1))
    flat_sorted = jnp.asarray(np.sort(idx.reshape(-1)))
    g = jnp.asarray(rng.normal(size=(BS * N_TABLES, D)).astype(np.float32))

    nbytes = BS * N_TABLES * D * 4

    # every timed fn reduces to a SCALAR on-device: pulling the raw result
    # through the tunnel would time the network, not the chip (the scalar
    # reduction adds one streaming HBM pass, ~1 ms at these sizes)
    gather = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum())
    timeit("gather random", gather, table, flat, bytes_moved=nbytes)
    timeit("gather sorted", gather, table, flat_sorted, bytes_moved=nbytes)

    srt = jax.jit(lambda i: jnp.argsort(i).sum())
    timeit("argsort 1.7M int32", srt, flat)

    scat = jax.jit(
        lambda g, i: jnp.zeros((V, D), jnp.float32).at[i].add(g).sum()
    )
    timeit("bwd scatter-add (random)", scat, g, flat, bytes_moved=nbytes)
    timeit("bwd scatter-add (sorted)", scat, g, flat_sorted, bytes_moved=nbytes)

    def sorted_seg(g, i):
        order = jnp.argsort(i)
        return jax.ops.segment_sum(
            g[order], i[order], num_segments=V, indices_are_sorted=True
        ).sum()

    timeit("bwd argsort+segsum", jax.jit(sorted_seg), g, flat, bytes_moved=nbytes)

    def seg_presorted(g, i):
        return jax.ops.segment_sum(
            g, i, num_segments=V, indices_are_sorted=True
        ).sum()

    timeit("bwd segsum (presorted)", jax.jit(seg_presorted), g, flat_sorted,
           bytes_moved=nbytes)

    # full step + no-embedding step for the MLP share
    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step
    from deeplearningexamples_tpu.models.dlrm import (
        DlrmConfig, DlrmTask, make_dlrm_optimizer,
    )

    cards = tuple([CARD] * N_TABLES)
    for grad_mode in ("scatter", "sorted"):
        task = DlrmTask(
            DlrmConfig(categorical_cardinalities=cards, embedding_dim=D,
                       bottom_mlp=(512, 256, D), embedding_grad=grad_mode),
            jnp.bfloat16,
        )
        params, mstate = task.init(jax.random.key(0))
        tx = make_dlrm_optimizer(params, mlp_lr=24.0, embedding_lr=24.0)
        state = create_train_state(params, tx, jax.random.key(1), mstate)
        step = make_train_step(task.loss_fn, tx)
        batch = {
            "numerical": jnp.asarray(rng.normal(size=(BS, 13)).astype(np.float32)),
            "categorical": jnp.asarray(rng.integers(0, CARD, size=(BS, N_TABLES)).astype(np.int32)),
            "label": jnp.asarray(rng.integers(0, 2, size=(BS,)).astype(np.float32)),
        }
        dt = timeit(f"full step ({grad_mode})",
                    lambda s, b: step(s, b)[1], state, batch)
        print(f"  -> {BS / dt / 1e6:.2f} M rec/s", flush=True)


if __name__ == "__main__":
    main()
