"""SQuAD dev-set prediction: features → batched inference → answer texts.

The role of the reference's predict path (``run_squad.py:427-478``
``get_answers``: per-feature prelim predictions filtered to max-context doc
tokens, best span across the doc-stride windows of each question, token span
→ original-document text). Output is ``{qid: answer_text}`` ready for the
official EM/F1 scorer (``squad_eval.squad_evaluate``).

Deviation noted: the reference refines ``orig_text`` against the detokenized
prediction with ``get_final_text`` (casing/byte alignment); here the answer
is the whitespace-joined original document tokens of the span. The official
scorer normalizes punctuation/case/articles, so the metric impact is nil for
v1.1-style answers.
"""

from __future__ import annotations

import json
from typing import Sequence

import jax
import numpy as np

from ...data.squad import SquadFeature
from .squad_eval import decode_span

__all__ = ["predict_squad", "read_squad_references", "write_predictions"]


def read_squad_references(dev_json_path: str) -> dict[str, list[str]]:
    """{qid: [gold answer texts]} from a SQuAD v1.1/v2 dev json."""
    with open(dev_json_path, encoding="utf-8") as f:
        data = json.load(f)["data"]
    refs: dict[str, list[str]] = {}
    for article in data:
        for para in article["paragraphs"]:
            for qa in para["qas"]:
                refs[qa["id"]] = [a["text"] for a in qa["answers"]] or [""]
    return refs


def predict_squad(
    task,
    params,
    features: Sequence[SquadFeature],
    batch_size: int = 32,
    n_best: int = 20,
    max_answer_length: int = 30,
) -> dict[str, str]:
    """Best answer text per question across its doc-stride features."""
    predict = jax.jit(
        lambda p, ids, mask, seg: task.model.apply(
            {"params": p}, ids, mask, seg, deterministic=True
        )
    )
    best: dict[str, tuple[float, str]] = {}
    for i in range(0, len(features), batch_size):
        chunk = list(features[i : i + batch_size])
        real = len(chunk)
        while len(chunk) < batch_size:  # pad to the compiled batch shape
            chunk.append(chunk[-1])
        ids = np.stack([f.input_ids for f in chunk])
        mask = np.stack([f.attention_mask for f in chunk])
        seg = np.stack([f.token_type_ids for f in chunk])
        start_logits, end_logits = predict(params, ids, mask, seg)
        start_logits = np.asarray(start_logits, np.float32)
        end_logits = np.asarray(end_logits, np.float32)
        for j in range(real):
            f = chunk[j]
            valid = np.zeros(ids.shape[1], bool)
            for pos in f.token_to_orig:
                # reference get_valid_prelim_predictions: start must be a
                # max-context doc token of this feature
                valid[pos] = f.token_is_max_context.get(pos, False)
            s, e, score = decode_span(
                start_logits[j], end_logits[j], valid,
                n_best=n_best, max_answer_length=max_answer_length,
            )
            if s not in f.token_to_orig or e not in f.token_to_orig:
                continue
            text = " ".join(f.doc_tokens[f.token_to_orig[s] : f.token_to_orig[e] + 1])
            if f.qid not in best or score > best[f.qid][0]:
                best[f.qid] = (score, text)
    return {qid: text for qid, (_, text) in best.items()}


def write_predictions(predictions: dict[str, str], path: str) -> None:
    """The reference's ``predictions.json`` artifact (``run_squad.py:1102``)."""
    with open(path, "w", encoding="utf-8") as f:
        json.dump(predictions, f, indent=2, ensure_ascii=False)
