"""SQuAD v1.1 span decoding + EM/F1 metrics.

Re-implements the reference's n-best span decoding
(``PyTorch/LanguageModeling/BERT/run_squad.py:427-478`` ``get_answers`` /
``get_valid_prelim_predictions``) and the official EM/F1 scoring
(``evaluate-v1.1.py`` semantics: whitespace/articles/punctuation-normalized
exact match and token-overlap F1, max over references).
"""

from __future__ import annotations

import collections
import re
import string

import numpy as np

__all__ = [
    "decode_span",
    "exact_match_score",
    "f1_score",
    "squad_evaluate",
    "apply_null_threshold",
    "find_best_null_threshold",
]


def decode_span(
    start_logits: np.ndarray,  # (S,)
    end_logits: np.ndarray,  # (S,)
    valid_mask: np.ndarray,  # (S,) bool: context (non-question, non-special) tokens
    n_best: int = 20,
    max_answer_length: int = 30,
) -> tuple[int, int, float]:
    """Best (start, end, score) with end >= start, length-capped, both valid."""
    start_logits = np.where(valid_mask, start_logits, -1e9)
    end_logits = np.where(valid_mask, end_logits, -1e9)
    start_idx = np.argsort(start_logits)[-n_best:][::-1]
    end_idx = np.argsort(end_logits)[-n_best:][::-1]
    best = (0, 0, -np.inf)
    for s in start_idx:
        for e in end_idx:
            if e < s or e - s + 1 > max_answer_length:
                continue
            score = start_logits[s] + end_logits[e]
            if score > best[2]:
                best = (int(s), int(e), float(score))
    return best


def _normalize(s: str) -> str:
    s = s.lower()
    s = "".join(ch for ch in s if ch not in set(string.punctuation))
    s = re.sub(r"\b(a|an|the)\b", " ", s)
    return " ".join(s.split())


def exact_match_score(prediction: str, ground_truth: str) -> float:
    return float(_normalize(prediction) == _normalize(ground_truth))


def f1_score(prediction: str, ground_truth: str) -> float:
    pred_tokens = _normalize(prediction).split()
    gt_tokens = _normalize(ground_truth).split()
    common = collections.Counter(pred_tokens) & collections.Counter(gt_tokens)
    num_same = sum(common.values())
    if num_same == 0:
        return 0.0
    precision = num_same / len(pred_tokens)
    recall = num_same / len(gt_tokens)
    return 2 * precision * recall / (precision + recall)


def squad_evaluate(predictions: dict[str, str], references: dict[str, list[str]]):
    """{qid: pred_text} vs {qid: [answers]} -> {"exact_match", "f1"} (%).

    v2-compatible: a reference of ``[""]`` (unanswerable) scores 1.0 iff the
    prediction is empty (the official evaluate-v2.0 convention)."""
    em, f1 = 0.0, 0.0
    for qid, refs in references.items():
        pred = predictions.get(qid, "")
        if refs == [""]:  # unanswerable question
            em += float(pred == "")
            f1 += float(pred == "")
            continue
        em += max(exact_match_score(pred, r) for r in refs)
        f1 += max(f1_score(pred, r) for r in refs)
    n = max(len(references), 1)
    return {"exact_match": 100.0 * em / n, "f1": 100.0 * f1 / n}


def apply_null_threshold(
    predictions: dict[str, str],
    null_odds: dict[str, float],
    threshold: float,
) -> dict[str, str]:
    """Empty-out predictions whose null odds exceed the threshold
    (the reference's na-prob thresholding, ``run_squad.py:467-471``)."""
    return {
        qid: "" if null_odds.get(qid, float("-inf")) > threshold else text
        for qid, text in predictions.items()
    }


def find_best_null_threshold(
    predictions: dict[str, str],
    null_odds: dict[str, float],
    references: dict[str, list[str]],
):
    """Sweep the na-prob threshold over observed null-odds values and return
    (best_threshold, best_metrics) by F1 — the official evaluate-v2.0
    ``find_best_thresh`` role. ``predictions`` must be unthresholded
    (best span text for every question)."""
    candidates = sorted(set(null_odds.values()))
    # thresholds between consecutive odds values + the extremes
    sweep = [float("-inf")] + [
        (a + b) / 2 for a, b in zip(candidates, candidates[1:])
    ] + [float("inf")]
    best = (float("inf"), {"exact_match": -1.0, "f1": -1.0})
    for t in sweep:
        m = squad_evaluate(
            apply_null_threshold(predictions, null_odds, t), references
        )
        if m["f1"] > best[1]["f1"]:
            best = (t, m)
    return best
