"""DLRM training task: BCE loss, dual optimizer, AUC evaluation.

Reference harness: ``dlrm/scripts/main.py:387-731`` — BCEWithLogits loss,
dual optimizers (embedding SGD vs MLP FusedSGD, :456-482), AUC-thresholded
early stop, ``dist_evaluate`` :733.

Under SPMD the reference's "embedding lr / world_size" compensation
(:444-452) is unnecessary: gradients are globally averaged by the mesh
psum regardless of which axis a parameter is sharded on. The dual-optimizer
capability survives as an optax ``multi_transform`` partition
(embedding table vs everything else).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ...core.metrics import roc_auc
from .model import Dlrm, DlrmConfig

__all__ = ["DlrmTask", "make_dlrm_optimizer"]


def make_dlrm_optimizer(
    params,
    mlp_lr: float | Any = 24.0,
    embedding_lr: float | Any = 24.0,
    beta1: float = 0.9,
    use_adam_for_mlp: bool = False,
) -> optax.GradientTransformation:
    """Dual optimizer: plain SGD for the embedding table (the reference uses
    torch SGD with sparse grads there), SGD-with-momentum/Adam for MLPs."""
    mlp_tx = (
        optax.adam(mlp_lr) if use_adam_for_mlp else optax.sgd(mlp_lr)
    )
    emb_tx = optax.sgd(embedding_lr)

    def label(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "emb"
            if any(getattr(k, "key", "") == "embedding_table" for k in path)
            else "mlp",
            params,
        )

    return optax.multi_transform({"mlp": mlp_tx, "emb": emb_tx}, label(params))


@dataclass
class DlrmTask:
    cfg: DlrmConfig
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        self.model = Dlrm(self.cfg, self.dtype)

    def init(self, rng, batch=2):
        num = jnp.zeros((batch, self.cfg.num_numerical), jnp.float32)
        cat = jnp.zeros((batch, len(self.cfg.categorical_cardinalities)), jnp.int32)
        variables = self.model.init(rng, num, cat)
        return variables["params"], {}

    def loss_fn(self, params, model_state, batch, rng):
        logits = self.model.apply(
            {"params": params}, batch["numerical"], batch["categorical"]
        )
        loss = jnp.mean(optax.sigmoid_binary_cross_entropy(logits, batch["label"]))
        return loss, (model_state, {})

    def metric_fn(self, params, model_state, batch):
        logits = self.model.apply(
            {"params": params}, batch["numerical"], batch["categorical"]
        )
        return {
            "auc": roc_auc(logits, batch["label"]),
            "val_loss": jnp.mean(
                optax.sigmoid_binary_cross_entropy(logits, batch["label"])
            ),
        }

    def eval_collect_fn(self, params, model_state, batch):
        """Per-batch raw outputs for dataset-level reduction (the reference's
        ``dist_evaluate`` gathers all scores before one AUC,
        ``dlrm/scripts/main.py:733-780``; a mean of per-batch AUCs is biased)."""
        logits = self.model.apply(
            {"params": params}, batch["numerical"], batch["categorical"]
        )
        return {
            "score": logits.astype(jnp.float32),
            "label": batch["label"].astype(jnp.float32),
            "bce": optax.sigmoid_binary_cross_entropy(logits, batch["label"]),
        }

    @staticmethod
    def eval_reduce(flat: dict) -> dict:
        """Full-eval-set AUC + loss from concatenated per-batch outputs."""
        import numpy as np

        scores, labels = flat["score"], flat["label"]
        order = np.argsort(-scores, kind="stable")
        y = labels[order]
        tps = np.cumsum(y)
        fps = np.cumsum(1.0 - y)
        tpr = np.concatenate([[0.0], tps / max(tps[-1], 1.0)])
        fpr = np.concatenate([[0.0], fps / max(fps[-1], 1.0)])
        return {
            "auc": float(np.trapezoid(tpr, fpr)),
            "val_loss": float(np.mean(flat["bce"])),
        }
