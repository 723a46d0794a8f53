"""GLUE fine-tuning (sequence classification / regression).

Covers the reference's ``run_glue.py`` (815 LoC): TSV processors for the
classification tasks (MRPC/SST-2/MNLI-style two- or one-sentence inputs),
pair feature conversion ([CLS] a [SEP] b [SEP] with segment ids), accuracy /
Matthews-correlation metrics, and the fine-tune task over
``BertForSequenceClassification``.
"""

from __future__ import annotations

import csv
from dataclasses import dataclass
from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...data.tokenization import BertTokenizer
from .modeling import BertConfig, BertForSequenceClassification

__all__ = ["convert_pair_features", "GlueTask", "read_tsv", "matthews_corrcoef"]


def read_tsv(path: str, text_a_col: int, text_b_col: int | None,
             label_col: int, skip_header: bool = True,
             label_map: dict | None = None) -> list[tuple[str, str | None, int]]:
    rows = []
    with open(path, encoding="utf-8") as f:
        reader = csv.reader(f, delimiter="\t", quotechar=None)
        for i, parts in enumerate(reader):
            if skip_header and i == 0:
                continue
            label = parts[label_col]
            label = label_map[label] if label_map else int(label)
            rows.append(
                (parts[text_a_col],
                 parts[text_b_col] if text_b_col is not None else None,
                 label)
            )
    return rows


def convert_pair_features(
    rows, tokenizer: BertTokenizer, max_seq_length: int = 128
) -> dict[str, np.ndarray]:
    ids_l, mask_l, seg_l, y = [], [], [], []
    for a, b, label in rows:
        ta = tokenizer.tokenize(a)
        tb = tokenizer.tokenize(b) if b else []
        # truncate pair to fit (reference _truncate_seq_pair: pop longest)
        budget = max_seq_length - (3 if tb else 2)
        while len(ta) + len(tb) > budget:
            (ta if len(ta) > len(tb) else tb).pop()
        tokens = ["[CLS]"] + ta + ["[SEP]"]
        seg = [0] * len(tokens)
        if tb:
            tokens += tb + ["[SEP]"]
            seg += [1] * (len(tb) + 1)
        ids = tokenizer.convert_tokens_to_ids(tokens)
        mask = [1] * len(ids)
        pad = max_seq_length - len(ids)
        ids_l.append(ids + [0] * pad)
        mask_l.append(mask + [0] * pad)
        seg_l.append(seg + [0] * pad)
        y.append(label)
    return {
        "input_ids": np.asarray(ids_l, np.int32),
        "attention_mask": np.asarray(mask_l, np.int32),
        "token_type_ids": np.asarray(seg_l, np.int32),
        "label": np.asarray(y, np.int32),
    }


def matthews_corrcoef(preds: np.ndarray, labels: np.ndarray) -> float:
    """MCC for CoLA (reference uses sklearn; closed form here)."""
    tp = float(((preds == 1) & (labels == 1)).sum())
    tn = float(((preds == 0) & (labels == 0)).sum())
    fp = float(((preds == 1) & (labels == 0)).sum())
    fn = float(((preds == 0) & (labels == 1)).sum())
    denom = np.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    return (tp * tn - fp * fn) / denom if denom else 0.0


@dataclass
class GlueTask:
    cfg: BertConfig
    num_labels: int = 2
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        self.model = BertForSequenceClassification(
            self.cfg, self.num_labels, self.dtype
        )

    def init(self, rng, seq_len=128, batch=2):
        ids = jnp.zeros((batch, seq_len), jnp.int32)
        return self.model.init(rng, ids, ids, ids)["params"], {}

    def loss_fn(self, params, model_state, batch, rng):
        logits = self.model.apply(
            {"params": params},
            batch["input_ids"], batch["attention_mask"], batch["token_type_ids"],
            deterministic=False, rngs={"dropout": rng},
        )
        loss = jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(logits, batch["label"])
        )
        return loss, (model_state, {})

    def metric_fn(self, params, model_state, batch):
        logits = self.model.apply(
            {"params": params},
            batch["input_ids"], batch["attention_mask"], batch["token_type_ids"],
        )
        acc = jnp.mean((jnp.argmax(logits, -1) == batch["label"]).astype(jnp.float32))
        return {"accuracy": acc}
