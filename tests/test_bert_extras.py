"""GLUE task, distillation, profiling utilities."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from deeplearningexamples_tpu.models.bert import BertConfig
from deeplearningexamples_tpu.models.bert.distillation import DistillationTask
from deeplearningexamples_tpu.models.bert.glue import (
    GlueTask,
    convert_pair_features,
    matthews_corrcoef,
    read_tsv,
)
from deeplearningexamples_tpu.data.tokenization import BertTokenizer
from deeplearningexamples_tpu.utils.profiling import StepTimer

VOCAB = {t: i for i, t in enumerate(
    ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
     "good", "bad", "movie", "great", "terrible", "a", "the"]
)}

TINY = BertConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
                  intermediate_size=64, max_position_embeddings=64)


def test_glue_features_and_training(tmp_path):
    tsv = tmp_path / "train.tsv"
    tsv.write_text(
        "sentence\tlabel\n"
        "a good movie\t1\n"
        "a terrible movie\t0\n"
        "the great movie\t1\n"
        "the bad movie\t0\n"
    )
    rows = read_tsv(str(tsv), text_a_col=0, text_b_col=None, label_col=1)
    assert len(rows) == 4
    tok = BertTokenizer(VOCAB)
    feats = convert_pair_features(rows, tok, max_seq_length=16)
    assert feats["input_ids"].shape == (4, 16)
    assert feats["token_type_ids"].max() == 0  # single sentence

    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step

    task = GlueTask(TINY, num_labels=2, dtype=jnp.float32)
    params, _ = task.init(jax.random.key(0), seq_len=16)
    tx = optax.adam(5e-3)
    state = create_train_state(params, tx, jax.random.key(1))
    step = make_train_step(task.loss_fn, tx, donate=False)
    batch = jax.tree.map(jnp.asarray, feats)
    for _ in range(25):
        state, m = step(state, batch)
    metrics = task.metric_fn(state.params, {}, batch)
    assert float(metrics["accuracy"]) == 1.0  # memorizes 4 examples


def test_pair_truncation():
    tok = BertTokenizer(VOCAB)
    rows = [("good " * 20, "bad " * 20, 1)]
    feats = convert_pair_features(rows, tok, max_seq_length=16)
    assert feats["input_ids"].shape == (1, 16)
    assert feats["token_type_ids"][0].max() == 1  # pair retained


def test_matthews():
    assert matthews_corrcoef(np.asarray([1, 0, 1, 0]), np.asarray([1, 0, 1, 0])) == 1.0
    assert matthews_corrcoef(np.asarray([0, 1, 0, 1]), np.asarray([1, 0, 1, 0])) == -1.0


def test_distillation_reduces_hidden_gap():
    teacher_cfg = BertConfig(vocab_size=64, hidden_size=32, num_layers=4,
                             num_heads=2, intermediate_size=64,
                             max_position_embeddings=32, hidden_dropout=0.0)
    student_cfg = BertConfig(vocab_size=64, hidden_size=16, num_layers=2,
                             num_heads=2, intermediate_size=32,
                             max_position_embeddings=32, hidden_dropout=0.0)
    task = DistillationTask(teacher_cfg, student_cfg, dtype=jnp.float32)
    assert task.layer_map == [(0, 1), (1, 3)]

    ids = jnp.zeros((2, 16), jnp.int32)
    teacher_params = task.teacher.init(jax.random.key(0), ids, ids, ids)["params"]
    params, _ = task.init(jax.random.key(1), teacher_params, seq_len=16)
    assert "distill_proj" in params

    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step

    loss_fn = task.loss_fn(teacher_params)
    tx = optax.adam(1e-3)
    state = create_train_state(params, tx, jax.random.key(2))
    step = make_train_step(loss_fn, tx, donate=False)
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(5, 60, (4, 16)), jnp.int32),
        "attention_mask": jnp.ones((4, 16), jnp.int32),
        "token_type_ids": jnp.zeros((4, 16), jnp.int32),
    }
    losses = []
    for _ in range(15):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_task_distill_loss():
    s = jnp.asarray([[2.0, 0.0], [0.0, 2.0]])
    t = jnp.asarray([[3.0, 0.0], [0.0, 3.0]])
    y = jnp.asarray([0, 1])
    l_aligned = DistillationTask.task_distill_loss(s, t, y)
    l_opposed = DistillationTask.task_distill_loss(s, -t, y)
    assert float(l_aligned) < float(l_opposed)


def test_step_timer():
    import time

    t = StepTimer(warmup=1)
    for _ in range(4):
        t.start()
        time.sleep(0.01)
        t.stop()
    s = t.summary(batch_size=8)
    assert 5 < s["mean_ms"] < 100
    assert s["ips"] > 0


def test_multiple_choice_head():
    from deeplearningexamples_tpu.models.bert import BertForMultipleChoice

    model = BertForMultipleChoice(TINY, num_choices=4, dtype=jnp.float32)
    ids = jnp.ones((2, 4, 12), jnp.int32)
    variables = model.init(jax.random.key(0), ids, ids, jnp.zeros_like(ids))
    logits = model.apply(variables, ids, ids, jnp.zeros_like(ids))
    assert logits.shape == (2, 4)
    # trainable: overfit picking choice index (i % 4)
    import optax as _optax
    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 60, (4, 4, 12)), jnp.int32)
    labels = jnp.asarray([0, 1, 2, 3])

    def loss_fn(params, ms, batch, r):
        lg = model.apply({"params": params}, batch["ids"], batch["mask"],
                         batch["seg"], deterministic=False,
                         rngs={"dropout": r})
        return jnp.mean(_optax.softmax_cross_entropy_with_integer_labels(
            lg, batch["y"])), (ms, {})

    tx = _optax.adam(5e-3)
    state = create_train_state(variables["params"], tx, jax.random.key(1))
    step = make_train_step(loss_fn, tx, donate=False)
    batch = {"ids": ids, "mask": jnp.ones_like(ids), "seg": jnp.zeros_like(ids),
             "y": labels}
    for _ in range(25):
        state, m = step(state, batch)
    lg = model.apply({"params": state.params}, ids, jnp.ones_like(ids),
                     jnp.zeros_like(ids))
    assert (jnp.argmax(lg, -1) == labels).all()


def test_attention_dropout_applied_in_training():
    """With attention_dropout > 0 the training path must (a) actually
    randomize (two rngs give different loss) and (b) agree with the flash
    path when the rate is 0 (ADVICE round-1: the field was silently dead)."""
    import dataclasses as dc

    from deeplearningexamples_tpu.models.bert import BERT_CONFIGS
    from deeplearningexamples_tpu.models.bert.modeling import BertModel

    cfg = dc.replace(
        BERT_CONFIGS["base"], num_layers=2, hidden_size=64, num_heads=2,
        intermediate_size=128, vocab_size=100, hidden_dropout=0.0,
        attention_dropout=0.5,
    )
    model = BertModel(cfg, jnp.float32)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 100, (2, 16)),
                      jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    tt = jnp.zeros((2, 16), jnp.int32)
    variables = model.init(jax.random.key(0), ids, mask, tt,
                           deterministic=True)
    o1 = model.apply(variables, ids, mask, tt, deterministic=False,
                     rngs={"dropout": jax.random.key(1)})[0]
    o2 = model.apply(variables, ids, mask, tt, deterministic=False,
                     rngs={"dropout": jax.random.key(2)})[0]
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    # rate 0: training path falls back to flash and matches deterministic
    cfg0 = dc.replace(cfg, attention_dropout=0.0)
    model0 = BertModel(cfg0, jnp.float32)
    det = model0.apply(variables, ids, mask, tt, deterministic=True)[0]
    trn = model0.apply(variables, ids, mask, tt, deterministic=False,
                       rngs={"dropout": jax.random.key(3)})[0]
    np.testing.assert_allclose(np.asarray(det), np.asarray(trn), atol=1e-5)


def test_squad_v2_null_answer_machinery():
    """v2 null-odds flow (reference run_squad.py:430-478): an unanswerable
    question whose [CLS] logits dominate predicts empty; the threshold sweep
    recovers perfect EM/F1 on a mixed fixture."""
    import numpy as np

    from deeplearningexamples_tpu.data.squad import SquadFeature
    from deeplearningexamples_tpu.models.bert.predict import (
        aggregate_predictions,
    )
    from deeplearningexamples_tpu.models.bert.squad_eval import (
        apply_null_threshold, find_best_null_threshold, squad_evaluate,
    )

    s = 8

    def feat(qid):
        return SquadFeature(
            qid=qid,
            input_ids=np.zeros(s, np.int32),
            attention_mask=np.ones(s, np.int32),
            token_type_ids=np.zeros(s, np.int32),
            start_position=0, end_position=0,
            tokens=["[CLS]"] * s,
            token_to_orig={3: 0, 4: 1, 5: 2},
            token_is_max_context={3: True, 4: True, 5: True},
            doc_tokens=["the", "answer", "here"],
        )

    features = [feat("q1"), feat("q2")]
    start = np.full((2, s), -5.0, np.float32)
    end = np.full((2, s), -5.0, np.float32)
    # q1 answerable: span [3, 4] scores above null
    start[0, 3], end[0, 4], start[0, 0], end[0, 0] = 4.0, 4.0, 0.0, 0.0
    # q2 unanswerable: [CLS] dominates every span
    start[1, 0], end[1, 0], start[1, 3], end[1, 3] = 6.0, 6.0, 1.0, 1.0

    preds, odds = aggregate_predictions(
        features, start, end, version_2_with_negative=True,
        null_score_diff_threshold=0.0,
    )
    assert preds == {"q1": "the answer", "q2": ""}
    assert odds["q1"] < 0 < odds["q2"]

    # v1 path unchanged: no empties, no odds
    preds_v1, odds_v1 = aggregate_predictions(features, start, end)
    assert preds_v1["q2"] == "the"  # best span (3,3), no null option
    assert odds_v1 == {}

    # threshold sweep on unthresholded predictions recovers 100/100
    raw, odds2 = aggregate_predictions(
        features, start, end, version_2_with_negative=True,
        null_score_diff_threshold=float("inf"),
    )
    refs = {"q1": ["the answer"], "q2": [""]}
    t, m = find_best_null_threshold(raw, odds2, refs)
    assert m["exact_match"] == 100.0 and m["f1"] == 100.0
    assert odds2["q1"] <= t <= odds2["q2"]
    # an extreme threshold kills the answerable question too
    bad = squad_evaluate(apply_null_threshold(raw, odds2, float("-inf")), refs)
    assert bad["f1"] == 50.0
