"""BERT training tasks: pretraining (MLM+NSP) and SQuAD fine-tuning.

Losses mirror the reference exactly:
- pretraining criterion ``run_pretraining.py:75-95`` (``BertPretrainingCriterion``):
  CE over masked positions (labels == -1 ignored) + NSP CE, summed
- SQuAD ``run_squad.py`` train loss: mean of start/end CE with positions
  clamped to the sequence length
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import optax

from .modeling import BertConfig, BertForPreTraining, BertForQuestionAnswering

__all__ = ["BertPretrainTask", "BertSquadTask"]


def _masked_lm_loss(mlm_logits, labels):
    """CE over positions with label >= 0; ignore_index=-1 semantics."""
    vocab = mlm_logits.shape[-1]
    valid = labels >= 0
    safe = jnp.where(valid, labels, 0)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        mlm_logits.astype(jnp.float32), safe
    )
    ce = jnp.where(valid, ce, 0.0)
    return jnp.sum(ce) / jnp.maximum(jnp.sum(valid), 1)


@dataclass
class BertPretrainTask:
    cfg: BertConfig
    dtype: Any = jnp.bfloat16
    max_predictions: int = 20  # dense-sequence-output width (76 for seq512)

    def __post_init__(self):
        self.model = BertForPreTraining(self.cfg, self.dtype)

    def init(self, rng, seq_len=128, batch=2):
        ids = jnp.zeros((batch, seq_len), jnp.int32)
        variables = self.model.init(rng, ids, ids, ids, deterministic=True)
        return variables["params"], {}

    def loss_fn(self, params, model_state, batch, rng):
        # dense-seq-output: pick the (static) top-P masked positions from the
        # dense label tensor; surplus slots get weight 0
        labels = batch["mlm_labels"]
        is_masked = (labels >= 0).astype(jnp.int32)
        k = min(self.max_predictions, labels.shape[-1])
        weights, positions = jax.lax.top_k(is_masked, k)
        gathered = jnp.take_along_axis(labels, positions, axis=1)

        mlm_logits, nsp_logits = self.model.apply(
            {"params": params},
            batch["input_ids"], batch["attention_mask"], batch["token_type_ids"],
            masked_positions=positions,
            deterministic=False, rngs={"dropout": rng},
        )
        safe = jnp.where(weights > 0, gathered, 0)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            mlm_logits.astype(jnp.float32), safe
        )
        mlm = jnp.sum(ce * weights) / jnp.maximum(jnp.sum(weights), 1)
        nsp = jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(
                nsp_logits, batch["nsp_label"]
            )
        )
        loss = mlm + nsp
        return loss, (model_state, {"mlm_loss": mlm, "nsp_loss": nsp})

    def metric_fn(self, params, model_state, batch):
        mlm_logits, nsp_logits = self.model.apply(
            {"params": params},
            batch["input_ids"], batch["attention_mask"], batch["token_type_ids"],
            deterministic=True,
        )
        valid = batch["mlm_labels"] >= 0
        pred = jnp.argmax(mlm_logits, axis=-1)
        acc = jnp.sum((pred == batch["mlm_labels"]) & valid) / jnp.maximum(
            jnp.sum(valid), 1
        )
        return {
            "mlm_acc": acc,
            "nsp_acc": jnp.mean(
                (jnp.argmax(nsp_logits, -1) == batch["nsp_label"]).astype(jnp.float32)
            ),
        }


@dataclass
class BertSquadTask:
    cfg: BertConfig
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        self.model = BertForQuestionAnswering(self.cfg, self.dtype)

    def init(self, rng, seq_len=384, batch=2):
        ids = jnp.zeros((batch, seq_len), jnp.int32)
        variables = self.model.init(rng, ids, ids, ids, deterministic=True)
        return variables["params"], {}

    def loss_fn(self, params, model_state, batch, rng):
        start_logits, end_logits = self.model.apply(
            {"params": params},
            batch["input_ids"], batch["attention_mask"], batch["token_type_ids"],
            deterministic=False, rngs={"dropout": rng},
        )
        seq_len = start_logits.shape[-1]
        start = jnp.clip(batch["start_positions"], 0, seq_len - 1)
        end = jnp.clip(batch["end_positions"], 0, seq_len - 1)
        loss = 0.5 * (
            jnp.mean(optax.softmax_cross_entropy_with_integer_labels(start_logits, start))
            + jnp.mean(optax.softmax_cross_entropy_with_integer_labels(end_logits, end))
        )
        return loss, (model_state, {})

    def predict_fn(self, params, batch):
        return self.model.apply(
            {"params": params},
            batch["input_ids"], batch["attention_mask"], batch["token_type_ids"],
            deterministic=True,
        )
