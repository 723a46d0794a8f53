"""Tokenizer, SQuAD EM/F1, and COCO mAP evaluator tests."""

import numpy as np
import pytest

from deeplearningexamples_tpu.data.tokenization import BertTokenizer
from deeplearningexamples_tpu.models.bert.squad_eval import (
    decode_span,
    exact_match_score,
    f1_score,
    squad_evaluate,
)
from deeplearningexamples_tpu.models.ssd.coco_eval import CocoMAP


VOCAB = {t: i for i, t in enumerate(
    ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
     "the", "quick", "brown", "fox", "jump", "##ed", "##s", "over", "lazy",
     "dog", ",", ".", "un", "##want", "##ed", "run", "##ning"]
)}


def test_wordpiece_greedy_longest_match():
    tok = BertTokenizer(VOCAB)
    assert tok.tokenize("The quick brown fox jumped") == [
        "the", "quick", "brown", "fox", "jump", "##ed"
    ]
    # punctuation split + unknown word
    out = tok.tokenize("zebra, dog.")
    assert out == ["[UNK]", ",", "dog", "."]
    ids = tok.convert_tokens_to_ids(["dog", "bogus"])
    assert ids == [VOCAB["dog"], VOCAB["[UNK]"]]


def test_squad_metrics():
    assert exact_match_score("The Cat", "cat") == 1.0  # article + case stripped
    assert f1_score("the brown fox", "a brown dog") == pytest.approx(0.5)
    res = squad_evaluate(
        {"q1": "Denver Broncos", "q2": "wrong"},
        {"q1": ["Denver Broncos", "Broncos"], "q2": ["right answer"]},
    )
    assert res["exact_match"] == 50.0
    assert 0 < res["f1"] <= 100


def test_decode_span_respects_constraints():
    start = np.asarray([0.0, 5.0, 1.0, 0.0, 9.0])
    end = np.asarray([0.0, 1.0, 6.0, 0.0, 9.0])
    valid = np.asarray([False, True, True, True, False])  # best joint (4,4) invalid
    s, e, score = decode_span(start, end, valid, max_answer_length=3)
    assert (s, e) == (1, 2)


def test_coco_map_perfect_and_miss():
    ev = CocoMAP()
    gt = np.asarray([[0.1, 0.1, 0.5, 0.5], [0.6, 0.6, 0.9, 0.9]], np.float32)
    labels = np.asarray([1, 2])
    # perfect detections
    ev.add_image(gt, labels, np.asarray([0.9, 0.8]), gt, labels)
    res = ev.compute()
    assert res["mAP"] == pytest.approx(1.0)

    ev2 = CocoMAP()
    # detection at IoU ~0.58 with gt: counts at low thresholds only
    det = np.asarray([[0.1, 0.1, 0.45, 0.45]], np.float32)
    ev2.add_image(det, np.asarray([1]), np.asarray([0.9]),
                  np.asarray([[0.1, 0.1, 0.5, 0.5]], np.float32), np.asarray([1]))
    res2 = ev2.compute()
    assert 0.0 < res2["mAP"] < 1.0
    assert res2["mAP50"] == pytest.approx(1.0)

    # false positive on empty image lowers precision
    ev3 = CocoMAP()
    ev3.add_image(gt, labels, np.asarray([0.9, 0.8]), gt, labels)
    ev3.add_image(det, np.asarray([1]), np.asarray([0.95]),
                  np.zeros((0, 4), np.float32), np.zeros((0,), np.int64))
    assert ev3.compute()["mAP"] < 1.0


def test_mask_map_perfect_and_degraded():
    from deeplearningexamples_tpu.models.ssd.coco_eval import MaskMAP, paste_mask

    grid, s = 64, 128.0
    rng = np.random.default_rng(0)
    ev_perfect = MaskMAP(image_size=s)
    ev_shifted = MaskMAP(image_size=s)
    for _ in range(4):
        # one square instance per image
        x1, y1 = rng.uniform(10, 50, 2)
        w, h = rng.uniform(30, 60, 2)
        box = np.asarray([x1, y1, x1 + w, y1 + h], np.float32)
        gt = paste_mask(box, np.ones((28, 28), np.float32), grid, s)[None]
        labels = np.asarray([1])
        scores = np.asarray([0.9])
        full = np.ones((1, 28, 28), np.float32)
        ev_perfect.add_image_masks(box[None], full, labels, scores, gt, labels)
        shifted = box + np.asarray([18, 18, 18, 18], np.float32)
        ev_shifted.add_image_masks(shifted[None], full, labels, scores, gt,
                                   labels)
    perfect = ev_perfect.compute()
    shifted = ev_shifted.compute()
    assert perfect["mAP"] > 0.99
    assert shifted["mAP"] < perfect["mAP"] * 0.6


def test_paste_mask_geometry():
    from deeplearningexamples_tpu.models.ssd.coco_eval import paste_mask

    # half-left mask pasted into the right half of the canvas
    m28 = np.zeros((28, 28), np.float32)
    m28[:, :14] = 1.0
    box = np.asarray([32.0, 0.0, 64.0, 64.0])
    out = paste_mask(box, m28, 64, 64.0)
    assert out[:, :32].sum() == 0  # nothing left of the box
    assert out[10, 34] and not out[10, 60]  # left half of the box only
