"""Embedding lookup with a sort-based gradient (DLRM hot path).

The reference's custom CUDA gathers (``dlrm/cuda_src/sparse_gather/``,
``gather_gpu_fused.cu`` — SURVEY.md §2.C) exist because embedding *backward*
is a scatter-add. On TPU, XLA lowers an unsorted scatter-add mostly
serially, which measured 87 ms/step for DLRM bs64k — the single biggest
flagship perf gap. This op replaces the backward with the TPU-friendly
recipe: argsort the flat indices (bitonic sort runs on the VPU at full
tilt), gather-reorder the cotangents (gathers are fast), then
``segment_sum`` with ``indices_are_sorted=True`` so XLA emits the
sorted-scatter fast path.

Forward is a plain gather; semantics identical to ``table[idx]``.

Measured on v5e (DLRM bs64k, 26x100k x128 table): the *forward gather alone*
takes ~22 ms (852MB of random 512B rows -> ~37GB/s effective; bf16 rows are
no faster, so it is access-LATENCY bound, not bandwidth bound), and the
sorted backward (0.64M rec/s end-to-end) did not beat XLA's plain scatter
(0.75M). Conclusion: the win requires a Pallas gather/scatter kernel that
pipelines many row DMAs in flight (SURVEY §2.C "Pallas HBM embedding-bag
gather") — queued for round 2. This op stays as the sorted-segment building
block; DLRM defaults to plain scatter (``DlrmConfig.embedding_grad``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["embedding_lookup"]


@jax.custom_vjp
def embedding_lookup(table: jax.Array, flat_idx: jax.Array) -> jax.Array:
    """table (V, D); flat_idx (...,) int -> (..., D)."""
    return jnp.take(table, flat_idx, axis=0)


def _fwd(table, flat_idx):
    return embedding_lookup(table, flat_idx), (table.shape, flat_idx)


def _bwd(res, g):
    (v, d), flat_idx = res
    idx = flat_idx.reshape(-1)
    grads = g.reshape(-1, d)
    order = jnp.argsort(idx)
    idx_sorted = idx[order]
    grads_sorted = grads[order]
    d_table = jax.ops.segment_sum(
        grads_sorted, idx_sorted, num_segments=v, indices_are_sorted=True
    )
    return d_table.astype(g.dtype), None


embedding_lookup.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Pallas row-gather prototype: many row DMAs in flight
# ---------------------------------------------------------------------------

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

GATHER_BLOCK = 1024  # rows per grid program (matches XLA s32 SMEM layout T(1024))
_INFLIGHT = 16  # concurrent row DMAs


def _gather_kernel(idx_ref, table_ref, out_ref, sems):
    def dma(j):
        row = idx_ref[j]
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(row, 1), :],
            out_ref.at[pl.ds(j, 1), :],
            sems.at[j % _INFLIGHT],
        )

    # pipeline: keep _INFLIGHT row copies outstanding
    def start(j, _):
        dma(j).start()
        return 0

    jax.lax.fori_loop(0, _INFLIGHT, start, 0)

    def body(j, _):
        dma(j).wait()  # frees slot j % _INFLIGHT

        @pl.when(j + _INFLIGHT < GATHER_BLOCK)
        def _():
            dma(j + _INFLIGHT).start()

        return 0

    jax.lax.fori_loop(0, GATHER_BLOCK, body, 0)


def pallas_gather_rows(table: jax.Array, flat_idx: jax.Array) -> jax.Array:
    """Row gather via pipelined per-row DMAs (the SURVEY §2.C embedding-bag
    gather kernel). table (V, D); flat_idx (N,) with N % GATHER_BLOCK == 0.
    Falls back to ``jnp.take`` on CPU.

    Measured on v5e (1.7M random rows from a 2.6M x 128 f32 table): this
    kernel is CORRECT but at 60.5 ms loses to XLA's ``jnp.take`` (22.4 ms) —
    the hardware gather path beats per-row DMAs at 512B granularity, i.e.
    XLA's gather is already near this chip's random-access limit. Kept as
    the baseline for future SparseCore-backed or batched-DMA variants; DLRM
    uses ``jnp.take``. The architectural lever for DLRM is sharding the
    table over the ``model`` mesh axis so each chip gathers 1/N of the rows.
    """
    if jax.default_backend() == "cpu":
        return jnp.take(table, flat_idx, axis=0)
    n = flat_idx.shape[0]
    assert n % GATHER_BLOCK == 0, f"N={n} must be a multiple of {GATHER_BLOCK}"
    d = table.shape[1]
    return pl.pallas_call(
        _gather_kernel,
        grid=(n // GATHER_BLOCK,),
        in_specs=[
            pl.BlockSpec((GATHER_BLOCK,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((GATHER_BLOCK, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_INFLIGHT,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(flat_idx, table)
