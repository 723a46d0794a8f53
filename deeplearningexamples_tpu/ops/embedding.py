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
