"""BART summarization recipe: data path, ROUGE, CLI fine-tune e2e."""

import numpy as np

from deeplearningexamples_tpu.data.summarization import (
    SummarizationDataset,
    rouge_l,
    rouge_n,
    rouge_scores,
    write_synthetic_summarization,
)


def test_rouge_known_values():
    hyp = "the cat sat on the mat".split()
    ref = "the cat lay on the mat".split()
    # unigram overlap: the, cat, on, the, mat = 5 of 6
    np.testing.assert_allclose(rouge_n(hyp, ref, 1), 5 / 6, rtol=1e-9)
    # bigrams: (the,cat) (on,the) (the,mat) = 3 of 5
    np.testing.assert_allclose(rouge_n(hyp, ref, 2), 3 / 5, rtol=1e-9)
    # LCS = the cat on the mat (5) -> F1 = 5/6
    np.testing.assert_allclose(rouge_l(hyp, ref), 5 / 6, rtol=1e-9)
    assert rouge_n(hyp, [], 1) == 0.0
    s = rouge_scores([hyp], [hyp])
    assert s == {"rouge1": 1.0, "rouge2": 1.0, "rougeL": 1.0}


def test_summarization_dataset_batches(tmp_path):
    from deeplearningexamples_tpu.data.tokenization import BertTokenizer

    write_synthetic_summarization(str(tmp_path), n=16)
    vocab = {"<s>": 0, "[PAD]": 1, "</s>": 2, "[UNK]": 3}
    with open(tmp_path / "train.source") as f:
        for line in f:
            for w in line.lower().split():
                vocab.setdefault(w, len(vocab))
    tok = BertTokenizer(vocab)
    ds = SummarizationDataset(str(tmp_path), "train", tok, 4,
                              max_source_len=48, max_target_len=12)
    b = next(iter(ds))
    assert b["src"].shape == (4, 48)
    assert b["tgt"].shape == (4, 14)
    assert (b["tgt"][:, 0] == 0).all()  # BOS first
    # every target ends with EOS before padding
    for row in b["tgt"]:
        nonpad = row[row != 1]
        assert nonpad[-1] == 2


def test_bart_cli_summarize_e2e(tmp_path):
    from deeplearningexamples_tpu.cli.main import cli

    ws = tmp_path / "ws"
    cli([
        "bart", "--batch-size", "8", "--epochs", "2", "--lr", "3e-3",
        "--workspace", str(ws), "--max-source-len", "48",
        "--max-target-len", "12", "--beam-size", "2", "--amp", "false",
        "--rng-impl", "threefry",
    ])
    report = (ws / "bart_raport.json").read_text()
    assert "val.rouge1" in report and "val.rougeL" in report


def test_bart_cli_pretrain(tmp_path):
    from deeplearningexamples_tpu.cli.main import cli

    ws = tmp_path / "ws"
    cli([
        "bart", "--task", "pretrain", "--batch-size", "8", "--epochs", "1",
        "--steps-per-epoch", "4", "--lr", "1e-3", "--workspace", str(ws),
        "--max-source-len", "48", "--amp", "false",
        "--rng-impl", "threefry",
    ])
    assert "train.loss" in (ws / "bart_raport.json").read_text()
