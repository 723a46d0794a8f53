"""DLRM — deep learning recommendation model, hybrid-parallel TPU design.

Re-design of the reference DLRM (``PyTorch/Recommendation/DLRM/``):
- ``DlrmBottom`` (``dlrm/nn/parts.py:27``): bottom MLP over 13 numerical
  features + embedding lookups over 26 categorical features
- interaction (``dlrm/nn/interactions.py``): dot interaction (ops/) or concat
- ``DlrmTop`` (``parts.py:112``): top MLP -> click logit
- embeddings (``dlrm/nn/embeddings.py``): the reference ships 5 CUDA-backed
  variants (joint / fused / sparse); on TPU one **joint table** — all 26
  tables concatenated row-wise with per-feature offsets — is the native
  analogue: a single gather from HBM, scatter-add grads, and row-wise
  sharding over the ``model`` mesh axis replaces the greedy table→GPU
  bucketing of ``dlrm/utils/distributed.py:146-176`` (even sharding + XLA
  collectives instead of uneven buckets + hand-written all_to_all).

Parallel layout (SURVEY.md §2.D): joint embedding table sharded over
``model`` axis dim 0; batch sharded over ``data``. XLA GSPMD turns the
gather on a row-sharded operand into the same model-parallel
lookup + all-to-all exchange the reference implements by hand in
``dlrm/model/distributed.py:25-98``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.dot_interaction import dot_interaction, interaction_output_dim
from ...ops.embedding import embedding_lookup

__all__ = ["DlrmConfig", "Dlrm"]


@dataclass(frozen=True)
class DlrmConfig:
    categorical_cardinalities: tuple[int, ...]
    embedding_dim: int = 128
    num_numerical: int = 13
    bottom_mlp: tuple[int, ...] = (512, 256, 128)
    top_mlp: tuple[int, ...] = (1024, 1024, 512, 256, 1)
    interaction: str = "dot"  # dot | cat
    hash_indices: bool = False
    # embedding grad: "scatter" (XLA scatter-add; faster on v5e where the
    # gather is latency-bound anyway) | "sorted" (argsort + sorted
    # segment-sum, ops/embedding.py — wins when scatter dominates)
    embedding_grad: str = "scatter"
    # table storage dtype: the reference's AMP mode stores fp16 embeddings
    # (no master copy, SGD tolerates it on Criteo); bf16 halves the bytes
    # behind every random-row gather/scatter
    table_dtype: str = "fp32"  # fp32 | bf16

    def __post_init__(self):
        assert self.bottom_mlp[-1] == self.embedding_dim, (
            "bottom MLP must end at embedding_dim for dot interaction"
        )

    @property
    def num_features(self) -> int:
        return len(self.categorical_cardinalities) + 1

    @property
    def offsets(self) -> np.ndarray:
        return np.concatenate(
            [[0], np.cumsum(self.categorical_cardinalities)[:-1]]
        ).astype(np.int64)

    @property
    def total_rows(self) -> int:
        # padded to a multiple of 8 so the joint table row-shards evenly
        # over any power-of-2 model axis (pad rows are never indexed:
        # offsets+cardinalities stay within the true range)
        n = int(sum(self.categorical_cardinalities))
        return -(-n // 8) * 8


def _mlp(x, sizes: Sequence[int], dtype, name: str, final_relu: bool = True):
    """Plain MLP; XLA fuses bias+ReLU into the matmul epilogue — the role of
    apex.mlp's fused cuBLAS path (reference ``dlrm/nn/mlps.py:18-45``)."""
    for i, w in enumerate(sizes):
        x = nn.Dense(
            w, dtype=dtype,
            kernel_init=nn.initializers.normal(np.sqrt(2.0 / (x.shape[-1] + w))),
            bias_init=nn.initializers.normal(np.sqrt(1.0 / w)),
            name=f"{name}_{i}",
        )(x)
        if i < len(sizes) - 1 or final_relu:
            x = nn.relu(x)
    return x


class Dlrm(nn.Module):
    cfg: DlrmConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, numerical, categorical):
        """numerical (B, 13) float; categorical (B, 26) int32. -> (B,) logit."""
        cfg = self.cfg

        # joint embedding table; init matches reference uniform(-1/sqrt(c), 1/sqrt(c))
        def init_table(key, shape, dtype):
            parts = []
            for c in cfg.categorical_cardinalities:
                key, sub = jax.random.split(key)
                bound = 1.0 / np.sqrt(c)
                parts.append(
                    jax.random.uniform(sub, (c, cfg.embedding_dim), dtype,
                                       minval=-bound, maxval=bound)
                )
            pad = shape[0] - sum(cfg.categorical_cardinalities)
            if pad:  # shard-alignment rows (never indexed)
                parts.append(jnp.zeros((pad, cfg.embedding_dim), dtype))
            return jnp.concatenate(parts, axis=0)

        table = self.param(
            "embedding_table", init_table, (cfg.total_rows, cfg.embedding_dim),
            jnp.bfloat16 if cfg.table_dtype == "bf16" else jnp.float32,
        )

        if cfg.hash_indices:
            cards = jnp.asarray(cfg.categorical_cardinalities)
            categorical = categorical % cards[None, :]
        # int32 suffices: Criteo-1TB joint table is ~880M rows < 2^31
        flat_idx = categorical.astype(jnp.int32) + jnp.asarray(cfg.offsets, jnp.int32)[None, :]
        if cfg.embedding_grad == "sorted":
            emb = embedding_lookup(table, flat_idx).astype(self.dtype)
        else:
            emb = jnp.take(table, flat_idx, axis=0).astype(self.dtype)  # (B, 26, D)

        bottom = _mlp(
            numerical.astype(self.dtype), cfg.bottom_mlp, self.dtype, "bottom_mlp"
        )  # (B, D)

        if cfg.interaction == "dot":
            inter = dot_interaction(bottom, emb)
        else:  # cat (reference CatInteraction)
            inter = jnp.concatenate(
                [bottom, emb.reshape(emb.shape[0], -1)], axis=1
            )

        logit = _mlp(
            inter.astype(self.dtype), cfg.top_mlp, self.dtype, "top_mlp",
            final_relu=False,
        )
        return logit[:, 0].astype(jnp.float32)
