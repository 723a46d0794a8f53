"""ConvNets training task: binds a flax image model to the harness contract.

Replaces the reference's ``Executor`` model+loss assembly
(``image_classification/training.py:46-134``) and the loss selection in
``main.py:453-457`` (CE vs label smoothing vs mixup-smooth).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ...core import losses

__all__ = ["ClassificationTask"]


@dataclass
class ClassificationTask:
    model: Any  # flax module with (x, train) -> logits
    label_smoothing: float = 0.0
    mixup_alpha: float = 0.0
    num_classes: int = 1000

    def init(self, rng: jax.Array, image_shape=(224, 224, 3)):
        x = jnp.zeros((2, *image_shape), jnp.float32)
        variables = self.model.init(rng, x, train=False)
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        return params, model_state

    def _criterion(self, logits, labels):
        if self.label_smoothing > 0:
            return losses.smoothed_cross_entropy(logits, labels, self.label_smoothing)
        return losses.cross_entropy(logits, labels)

    def loss_fn(self, params, model_state, batch, rng):
        images, labels = batch["image"], batch["label"]
        if self.mixup_alpha > 0:
            if labels.ndim == 1:
                labels = jax.nn.one_hot(labels, self.num_classes)
            images, labels = losses.mixup(rng, self.mixup_alpha, images, labels)
        logits, mutated = self.model.apply(
            {"params": params, **model_state}, images, train=True,
            mutable=list(model_state.keys()) or False,
            rngs={"dropout": rng},
        )
        if not model_state:
            mutated = {}
        loss = self._criterion(logits, labels)
        return loss, (dict(mutated), {})

    def metric_fn(self, params, model_state, batch):
        logits = self.model.apply(
            {"params": params, **model_state}, batch["image"], train=False
        )
        metrics = losses.top_k_accuracy(logits, batch["label"])
        metrics["val_loss"] = losses.cross_entropy(logits, batch["label"])
        return metrics
