"""NCF — neural collaborative filtering (NeuMF).

Breadth recipe (reference ``PyTorch/Recommendation/NCF/neumf.py``): GMF
branch (elementwise product of user/item embeddings) + MLP branch
(concatenated embeddings through a pyramid MLP), fused into one sigmoid
logit. Evaluation is the reference's leave-one-out protocol: each positive
ranked against N sampled negatives → HR@K and NDCG@K
(``ncf.py``/``dataloading.py``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from ..ops.dropout import RegenDropout

__all__ = ["NcfConfig", "NeuMF", "NcfTask", "hit_rate_ndcg"]


@dataclass(frozen=True)
class NcfConfig:
    nb_users: int = 138493
    nb_items: int = 26744
    mf_dim: int = 64
    mlp_layer_sizes: tuple[int, ...] = (256, 256, 128, 64)
    dropout: float = 0.5


class NeuMF(nn.Module):
    cfg: NcfConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, users, items, deterministic: bool = True):
        cfg = self.cfg
        init = nn.initializers.normal(0.01)
        mf_u = nn.Embed(cfg.nb_users, cfg.mf_dim, embedding_init=init,
                        dtype=self.dtype, name="mf_user")(users)
        mf_i = nn.Embed(cfg.nb_items, cfg.mf_dim, embedding_init=init,
                        dtype=self.dtype, name="mf_item")(items)
        gmf = mf_u * mf_i

        half = cfg.mlp_layer_sizes[0] // 2
        mlp_u = nn.Embed(cfg.nb_users, half, embedding_init=init,
                         dtype=self.dtype, name="mlp_user")(users)
        mlp_i = nn.Embed(cfg.nb_items, half, embedding_init=init,
                         dtype=self.dtype, name="mlp_item")(items)
        x = jnp.concatenate([mlp_u, mlp_i], axis=-1)
        for i, w in enumerate(cfg.mlp_layer_sizes[1:]):
            x = nn.Dense(w, dtype=self.dtype,
                         kernel_init=nn.initializers.glorot_uniform(),
                         name=f"mlp_{i}")(x)
            x = nn.relu(x)
            # reference drops after EVERY MLP relu (neumf.py:91-92), not on
            # the fused concat
            x = RegenDropout(cfg.dropout)(x, deterministic=deterministic)
        x = jnp.concatenate([gmf, x], axis=-1)
        logit = nn.Dense(1, dtype=jnp.float32,
                         kernel_init=nn.initializers.lecun_normal(),
                         name="final")(x.astype(jnp.float32))
        return logit[..., 0]


def hit_rate_ndcg(scores: jax.Array, k: int = 10) -> tuple[jax.Array, jax.Array]:
    """scores (B, 1 + n_neg): column 0 is the positive item. Returns
    (HR@k, NDCG@k) means — the reference's ``val_epoch`` metrics."""
    rank = jnp.sum(scores[:, 1:] >= scores[:, :1], axis=1)  # 0 = top
    hit = rank < k
    ndcg = jnp.where(hit, 1.0 / jnp.log2(rank.astype(jnp.float32) + 2.0), 0.0)
    return jnp.mean(hit.astype(jnp.float32)), jnp.mean(ndcg)


@dataclass
class NcfTask:
    cfg: NcfConfig
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        self.model = NeuMF(self.cfg, self.dtype)

    def init(self, rng, batch=2):
        u = jnp.zeros((batch,), jnp.int32)
        return self.model.init(rng, u, u)["params"], {}

    def loss_fn(self, params, model_state, batch, rng):
        logits = self.model.apply(
            {"params": params}, batch["user"], batch["item"],
            deterministic=False, rngs={"dropout": rng},
        )
        loss = jnp.mean(
            optax.sigmoid_binary_cross_entropy(logits, batch["label"])
        )
        return loss, (model_state, {})

    def metric_fn(self, params, model_state, batch):
        """batch: user (B,), pos_item (B,), neg_items (B, N)."""
        items = jnp.concatenate(
            [batch["pos_item"][:, None], batch["neg_items"]], axis=1
        )
        users = jnp.broadcast_to(batch["user"][:, None], items.shape)
        scores = self.model.apply(
            {"params": params}, users.reshape(-1), items.reshape(-1)
        ).reshape(items.shape)
        hr, ndcg = hit_rate_ndcg(scores)
        return {"hr@10": hr, "ndcg@10": ndcg}
