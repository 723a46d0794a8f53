"""DLRM double-buffered-gather experiment (round-4 VERDICT #3, last
single-chip lever): overlap the embedding gather of microbatch k+1 with
the dense compute of microbatch k via a software-pipelined ``lax.scan``.

Hypothesis under test: the embedding path is random-access LATENCY-bound
(perf/DLRM_ROOFLINE.md), so if the TensorCore could issue the next
microbatch's gather while the MXU chews the current microbatch's MLPs, the
gather latency would hide behind dense compute. On a TPU TensorCore,
however, ops within one program execute one-at-a-time (no SM-style
concurrency; only DMAs/collectives run async), so the pipelined schedule
can only win if XLA turns the gather into an async copy-like op it can
overlap. This probe measures whether it does — win or negative result.

Three programs over the same global batch (65,536 split into 8 x 8,192
microbatches, bench table shapes 26 x 100k x d128):
  monolithic : one fused forward over the full batch (the bench step's shape)
  scan       : scan over microbatches, gather + dense inside each iteration
  pipelined  : double-buffered scan — iteration k consumes rows gathered at
               iteration k-1 and prefetches rows for k+1

Usage: python perf/dlrm_double_buffer.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

BS, MB = 65536, 8192
N_MB = BS // MB
CARDS = [100_000] * 26


def main():
    from deeplearningexamples_tpu.data.synthetic import SyntheticDlrmLoader
    from deeplearningexamples_tpu.models.dlrm import DlrmConfig, DlrmTask

    task = DlrmTask(
        DlrmConfig(categorical_cardinalities=tuple(CARDS), embedding_dim=128,
                   bottom_mlp=(512, 256, 128)),
        jnp.bfloat16,
    )
    params, _ = task.init(jax.random.key(0))
    batch = {k: jnp.asarray(v) for k, v in
             next(iter(SyntheticDlrmLoader(BS, CARDS, steps=1))).items()}
    table = params["embedding_table"]
    # per-table row offsets into the joint table (model.py joint layout)
    offsets = np.concatenate([[0], np.cumsum(CARDS)[:-1]]).astype(np.int32)
    flat_idx = batch["categorical"] + jnp.asarray(offsets)[None, :]  # (B, 26)

    dense_params = {k: v for k, v in params.items()
                    if k != "embedding_table"}

    def dense_part(p, num, emb):
        """bottom MLP + interaction + top MLP + BCE on one microbatch."""
        from deeplearningexamples_tpu.ops.dot_interaction import dot_interaction
        x = num.astype(jnp.bfloat16)
        for i in range(3):
            w = p[f"bottom_mlp_{i}"]
            x = jax.nn.relu(x @ w["kernel"].astype(jnp.bfloat16)
                            + w["bias"].astype(jnp.bfloat16))
        z = dot_interaction(x, emb.astype(jnp.bfloat16))
        y = z
        i = 0
        while f"top_mlp_{i}" in p:
            w = p[f"top_mlp_{i}"]
            y = y @ w["kernel"].astype(jnp.bfloat16) \
                + w["bias"].astype(jnp.bfloat16)
            if f"top_mlp_{i + 1}" in p:
                y = jax.nn.relu(y)
            i += 1
        return jnp.sum(y.astype(jnp.float32))

    num_mb = batch["numerical"].reshape(N_MB, MB, 13)
    idx_mb = flat_idx.reshape(N_MB, MB, 26)

    @jax.jit
    def monolithic(table, dp):
        emb = jnp.take(table, flat_idx, axis=0)
        return dense_part(dp, batch["numerical"], emb)

    @jax.jit
    def scan_plain(table, dp):
        def body(acc, inp):
            num, idx = inp
            emb = jnp.take(table, idx, axis=0)
            return acc + dense_part(dp, num, emb), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), (num_mb, idx_mb))
        return acc

    @jax.jit
    def scan_pipelined(table, dp):
        emb0 = jnp.take(table, idx_mb[0], axis=0)

        def body(carry, inp):
            acc, emb_cur = carry
            num, idx_next = inp
            # gather for k+1 has no data dependency on dense(k): XLA is
            # free to schedule it first/concurrently if the hardware allows
            emb_next = jnp.take(table, idx_next, axis=0)
            acc = acc + dense_part(dp, num, emb_cur)
            return (acc, emb_next), None
        idx_rot = jnp.roll(idx_mb, -1, axis=0)
        (acc, _), _ = jax.lax.scan(
            body, (jnp.float32(0.0), emb0), (num_mb, idx_rot))
        return acc

    def timeit(name, fn):
        float(fn(table, dense_params))  # compile+warm
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = fn(table, dense_params)
        float(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"  {name:12s} {dt * 1e3:8.2f} ms  "
              f"({BS / dt / 1e6:.2f}M rec/s fwd)", flush=True)
        return dt

    print(f"devices: {jax.devices()}  bs={BS} mb={MB} x{N_MB}", flush=True)
    t_mono = timeit("monolithic", monolithic)
    t_scan = timeit("scan", scan_plain)
    t_pipe = timeit("pipelined", scan_pipelined)
    verdict = ("WIN" if t_pipe < 0.95 * min(t_mono, t_scan)
               else "NEGATIVE RESULT")
    print(f"  pipelined vs best-of-others: "
          f"{t_pipe / min(t_mono, t_scan):.2f}x -> {verdict}")


if __name__ == "__main__":
    main()
