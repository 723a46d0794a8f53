"""DLRM hot-row VMEM cache experiment (VERDICT r3 next #3b).

Question: can a Pallas kernel that keeps the Zipf-hot head of each
embedding table resident in VMEM (serving cold rows via pipelined HBM
row-DMAs) beat XLA's plain gather, the way Criteo's hot rows hit the
A100's 40MB L2 in the reference?

Measures, on the real chip, for bs64k x 26 lookups (1.7M rows) from a
2.6M x 128 f32 joint table:
  1. XLA ``jnp.take`` with UNIFORM indices   (the round-1 baseline, ~22ms)
  2. XLA ``jnp.take`` with ZIPF(1.15) indices (does HBM row reuse help XLA?)
  3. hot/cold Pallas kernel with ZIPF indices (K hot rows/table in VMEM)
plus the measured hot-coverage fraction.

Run: PYTHONPATH=/root/repo python perf/dlrm_hotrow.py
Appends results to perf/DLRM_ROOFLINE.md by hand (see NOTES).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_TABLES = 26
ROWS_PER_TABLE = 100_000
D = 128
BS = 65_536
K_HOT = 256  # hot rows per table resident in VMEM (26*256*128*4B = 3.4MB)
BLOCK = 1024
INFLIGHT = 16


def _hot_kernel(idx_ref, hot_ref, table_ref, out_ref, sems):
    """idx_ref (BLOCK,) SMEM flat joint-table row ids; hot_ref
    (N_TABLES*K_HOT, D) VMEM; table_ref HBM; out (BLOCK, D) VMEM.
    Row r is hot iff (r % ROWS_PER_TABLE) < K_HOT (frequency-ranked ids —
    the reference preproc remaps ids by descending frequency, so the head
    of each table IS the hot set)."""

    def hot_slot(row):
        table = row // ROWS_PER_TABLE
        within = row % ROWS_PER_TABLE
        return table * K_HOT + within, within < K_HOT

    def dma(j):
        row = idx_ref[j]
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(row, 1), :],
            out_ref.at[pl.ds(j, 1), :],
            sems.at[j % INFLIGHT],
        )

    def cold(j):
        _, is_hot = hot_slot(idx_ref[j])
        return jnp.logical_not(is_hot)

    # start the DMA pipeline over COLD rows only
    def start(j, _):
        @pl.when(cold(j))
        def _():
            dma(j).start()
        return 0

    jax.lax.fori_loop(0, INFLIGHT, start, 0)

    def body(j, _):
        slot, is_hot = hot_slot(idx_ref[j])

        @pl.when(is_hot)
        def _():
            out_ref[pl.ds(j, 1), :] = hot_ref[pl.ds(slot, 1), :]

        @pl.when(jnp.logical_not(is_hot))
        def _():
            dma(j).wait()

        @pl.when((j + INFLIGHT < BLOCK) & cold(j + INFLIGHT))
        def _():
            dma(j + INFLIGHT).start()

        return 0

    jax.lax.fori_loop(0, BLOCK, body, 0)


@jax.jit
def hot_gather(table, hot, flat_idx):
    n = flat_idx.shape[0]
    return pl.pallas_call(
        _hot_kernel,
        grid=(n // BLOCK,),
        in_specs=[
            pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole hot table
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((BLOCK, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, D), table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((INFLIGHT,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(flat_idx, hot, table)


def timeit(fn, *args, iters=10):
    out = fn(*args)
    float(jnp.sum(out[:1].astype(jnp.float32)))  # sync (axon: fetch scalar)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[:1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    v = N_TABLES * ROWS_PER_TABLE
    table = jnp.asarray(rng.standard_normal((v, D)).astype(np.float32))
    hot = jnp.asarray(
        np.concatenate([
            np.asarray(table[t * ROWS_PER_TABLE: t * ROWS_PER_TABLE + K_HOT])
            for t in range(N_TABLES)
        ])
    )

    def flat_ids(skew):
        if skew == "uniform":
            within = rng.integers(0, ROWS_PER_TABLE, (BS, N_TABLES))
        else:
            within = np.minimum(rng.zipf(1.15, (BS, N_TABLES)) - 1,
                                ROWS_PER_TABLE - 1)
        offs = np.arange(N_TABLES)[None, :] * ROWS_PER_TABLE
        return (within + offs).reshape(-1).astype(np.int32)

    ids_u = flat_ids("uniform")
    ids_z = flat_ids("zipf")
    hot_frac = float(np.mean((ids_z % ROWS_PER_TABLE) < K_HOT))
    print(f"zipf(1.15) hot coverage at K={K_HOT}: {hot_frac:.3f}")

    take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    n = (len(ids_u) // BLOCK) * BLOCK
    ids_u_j = jnp.asarray(ids_u[:n])
    ids_z_j = jnp.asarray(ids_z[:n])

    t_u = timeit(take, table, ids_u_j)
    print(f"XLA take, uniform: {t_u*1e3:.2f} ms")
    t_z = timeit(take, table, ids_z_j)
    print(f"XLA take, zipf:    {t_z*1e3:.2f} ms")
    t_h = timeit(hot_gather, table, hot, ids_z_j)
    print(f"pallas hot/cold, zipf: {t_h*1e3:.2f} ms "
          f"(hot {hot_frac:.0%} from VMEM)")

    # correctness spot check
    ref = np.asarray(take(table, ids_z_j[:BLOCK]))
    got = np.asarray(hot_gather(table, hot, ids_z_j[:BLOCK]))
    err = float(np.abs(ref - got).max())
    print(f"hot_gather max abs err vs take (first block): {err:.2e}")


if __name__ == "__main__":
    main()
