"""DLRM dot-based feature interaction.

Semantics of the reference's custom CUDA kernel family
(``PyTorch/Recommendation/DLRM/dlrm/cuda_src/dot_based_interact/`` ~2k LoC,
dispatched by ``cuda_ext/dot_based_interact.py:19-41``; pure-torch fallback
``DotInteraction`` ``dlrm/nn/interactions.py:40-82``):

    input:  bottom-MLP output x0 (B, D) + embeddings (B, F-1, D)
    G     = X X^T  for X = concat([x0, emb])  (B, F, F)
    out   = concat([x0, tril(G, k=-1) flattened, zero-pad], -1)

with the pad sizing the output to ``D + F(F-1)/2 + pad`` (reference
``interactions.py:20`` pads by 1 so 27 features, D=128 gives 480).

TPU-native design note: the CUDA kernel exists because on GPU this is a
launch-bound chain of tiny batched GEMMs + gather + concat; fusing it by hand
was worth 2k lines of CUDA. Under XLA the same chain compiles to a single
fused loop over the batch — the batched 27x27x128 contraction maps onto the
MXU directly and the static lower-triangle gather + concat fuse into its
epilogue. We therefore express it in jnp (below) and keep the op behind this
module boundary so a Pallas kernel can be swapped in if profiling ever shows
a gap; ``dot_interaction_reference`` doubles as the golden test oracle (the
role ``dot_based_interact_ops_test.py`` plays in the reference tree).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["dot_interaction", "dot_interaction_reference", "interaction_output_dim"]


def interaction_output_dim(num_features: int, embed_dim: int, pad_to_multiple: int = 8) -> int:
    raw = embed_dim + num_features * (num_features - 1) // 2
    return ((raw + pad_to_multiple - 1) // pad_to_multiple) * pad_to_multiple


@functools.partial(jax.jit, static_argnames=("pad_to_multiple",))
def dot_interaction(
    bottom_out: jax.Array,  # (B, D)
    embeddings: jax.Array,  # (B, F-1, D)
    pad_to_multiple: int = 8,
) -> jax.Array:
    b, d = bottom_out.shape
    x = jnp.concatenate([bottom_out[:, None, :], embeddings], axis=1)  # (B, F, D)
    f = x.shape[1]
    g = jax.lax.dot_general(
        x, x, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (B, F, F)
    rows, cols = np.tril_indices(f, k=-1)
    flat_idx = jnp.asarray(rows * f + cols)
    tril = g.reshape(b, f * f)[:, flat_idx].astype(bottom_out.dtype)
    out_dim = interaction_output_dim(f, d, pad_to_multiple)
    pad = out_dim - d - tril.shape[1]
    parts = [bottom_out, tril]
    if pad:
        parts.append(jnp.zeros((b, pad), bottom_out.dtype))
    return jnp.concatenate(parts, axis=1)


def dot_interaction_reference(bottom_out, embeddings, pad_to_multiple: int = 8):
    """Numpy oracle with the identical layout."""
    b, d = bottom_out.shape
    x = np.concatenate([bottom_out[:, None, :], embeddings], axis=1)
    f = x.shape[1]
    g = np.einsum("bfd,bgd->bfg", x.astype(np.float64), x.astype(np.float64))
    rows, cols = np.tril_indices(f, k=-1)
    tril = g[:, rows, cols]
    out_dim = interaction_output_dim(f, d, pad_to_multiple)
    out = np.zeros((b, out_dim), np.float64)
    out[:, :d] = bottom_out
    out[:, d : d + tril.shape[1]] = tril
    return out
