"""Real-data pipeline tests: SQuAD features, BERT masking, COCO+SSD crop,
LJSpeech, Criteo binary/transcode."""

import io
import json
import os
import wave

import numpy as np
import pytest

from deeplearningexamples_tpu.data.bert_pretrain import (
    BertPretrainLoader,
    MaskingConfig,
    create_masked_instance,
)
from deeplearningexamples_tpu.data.criteo import (
    CriteoBinaryDataset,
    FeatureSpec,
    transcode_tsv,
    write_synthetic_dataset,
)
from deeplearningexamples_tpu.data.squad import (
    SquadLoader,
    convert_examples_to_features,
    read_squad_examples,
)
from deeplearningexamples_tpu.data.tokenization import BertTokenizer

VOCAB = {t: i for i, t in enumerate(
    ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
     "the", "capital", "of", "france", "is", "paris", "what", "?", ".",
     "big", "city", "a"]
)}


# -- SQuAD ------------------------------------------------------------------


@pytest.fixture()
def squad_file(tmp_path):
    doc = {
        "data": [{
            "title": "t",
            "paragraphs": [{
                "context": "The capital of France is Paris. Paris is a big city.",
                "qas": [{
                    "id": "q1",
                    "question": "What is the capital of France?",
                    "answers": [{"text": "Paris", "answer_start": 25}],
                }],
            }],
        }]
    }
    p = tmp_path / "train.json"
    p.write_text(json.dumps(doc))
    return str(p)


def test_squad_features(squad_file):
    tok = BertTokenizer(VOCAB)
    examples = read_squad_examples(squad_file)
    assert len(examples) == 1
    ex = examples[0]
    assert ex.doc_tokens[ex.start_position].rstrip(".") == "Paris"

    feats = convert_examples_to_features(examples, tok, max_seq_length=48,
                                         doc_stride=16)
    assert len(feats) >= 1
    f = feats[0]
    assert f.input_ids.shape == (48,)
    # the answer span tokens decode back to "paris"
    assert f.start_position > 0
    span = f.tokens[f.start_position : f.end_position + 1]
    assert span == ["paris"]
    loader = SquadLoader(feats * 4, batch_size=2)
    batch = next(iter(loader))
    assert batch["input_ids"].shape == (2, 48)
    assert batch["start_positions"].shape == (2,)


def test_squad_doc_stride_windows(squad_file):
    tok = BertTokenizer(VOCAB)
    examples = read_squad_examples(squad_file)
    feats = convert_examples_to_features(examples, tok, max_seq_length=20,
                                         doc_stride=4)
    assert len(feats) > 1  # context splits into multiple windows
    # every window has exactly one [CLS] and two [SEP]
    for f in feats:
        assert f.tokens[0] == "[CLS]" and f.tokens.count("[SEP]") == 2


# -- BERT pretrain masking --------------------------------------------------


def test_masking_statistics():
    cfg = MaskingConfig(vocab_size=1000, max_predictions_per_seq=40)
    rng = np.random.default_rng(0)
    a = np.arange(200, 260)
    b = np.arange(300, 360)
    inst = create_masked_instance(a, b, 128, cfg, rng)
    labels = inst["mlm_labels"]
    n_masked = (labels >= 0).sum()
    # ~15% of ~121 non-special tokens, capped at 40
    assert 10 <= n_masked <= 40
    # masked positions must store the ORIGINAL token
    pos = np.where(labels >= 0)[0]
    orig = np.concatenate([[101], a, [102], b, [102]])
    for p in pos:
        assert labels[p] == orig[p]
    # structure: CLS/SEP in place, segment ids split
    assert inst["input_ids"][0] == cfg.cls_token_id
    assert inst["token_type_ids"][0] == 0 and inst["token_type_ids"][70] == 1


def test_pretrain_loader_shapes_and_nsp_balance():
    rng = np.random.default_rng(0)
    docs = [
        [rng.integers(200, 900, rng.integers(8, 20)) for _ in range(6)]
        for _ in range(4)
    ]
    loader = BertPretrainLoader(docs, batch_size=8, seq_len=64,
                                steps_per_epoch=10)
    batches = list(loader)
    assert len(batches) == 10
    b = batches[0]
    assert b["input_ids"].shape == (8, 64)
    assert set(np.unique(b["nsp_label"])) <= {0, 1}
    all_nsp = np.concatenate([x["nsp_label"] for x in batches])
    assert 0.2 < all_nsp.mean() < 0.8  # both classes present
    # masking is re-drawn across epochs
    b2 = next(iter(loader))
    assert not np.array_equal(b["input_ids"], b2["input_ids"])


# -- COCO / SSD crop --------------------------------------------------------


def test_ssd_random_crop_semantics():
    from deeplearningexamples_tpu.data.coco import ssd_random_crop

    rng = np.random.default_rng(3)
    boxes = np.asarray([[0.4, 0.4, 0.6, 0.6]], np.float32)
    labels = np.asarray([5])
    saw_crop = saw_none = False
    for _ in range(50):
        out = ssd_random_crop(boxes, labels, rng)
        if out is None:
            saw_none = True
            continue
        saw_crop = True
        (x, y, w, h), nb, nl = out
        assert 0.3 <= w <= 1.0 and 0.3 <= h <= 1.0
        assert len(nb) == 1 and nl[0] == 5
        assert (nb >= -1e-6).all() and (nb <= 1 + 1e-6).all()
    assert saw_crop and saw_none


def test_coco_loader_end_to_end(tmp_path):
    from PIL import Image

    from deeplearningexamples_tpu.data.coco import CocoDetectionDataset, CocoSSDLoader

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(4):
        name = f"img{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
        ).save(img_dir / name, "JPEG")
        images.append({"id": i, "file_name": name, "width": 160, "height": 120})
        annotations.append({
            "id": i * 10, "image_id": i, "category_id": 18,
            "bbox": [20, 20, 60, 50], "iscrowd": 0, "area": 3000,
        })
    ann = {
        "images": images, "annotations": annotations,
        "categories": [{"id": 18, "name": "dog"}, {"id": 44, "name": "bottle"}],
    }
    ann_path = tmp_path / "instances.json"
    ann_path.write_text(json.dumps(ann))

    ds = CocoDetectionDataset(str(img_dir), str(ann_path))
    assert len(ds) == 4
    assert ds.cat_to_label == {18: 1, 44: 2}

    loader = CocoSSDLoader(ds, batch_size=2, n_threads=2)
    batch = next(iter(loader))
    assert batch["image"].shape == (2, 300, 300, 3)
    assert batch["loc_targets"].shape == (2, 8732, 4)
    assert (batch["cls_targets"] >= 0).all()

    val = CocoSSDLoader(ds, batch_size=2, train=False, n_threads=2)
    vb = next(iter(val))
    assert "gt" in vb and len(vb["gt"]) == 2


# -- LJSpeech ---------------------------------------------------------------


@pytest.fixture()
def lj_root(tmp_path):
    wavs = tmp_path / "wavs"
    wavs.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(4):
        name = f"LJ001-{i:04d}"
        audio = (0.1 * rng.normal(size=12000) * 32767).astype(np.int16)
        with wave.open(str(wavs / f"{name}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(22050)
            w.writeframes(audio.tobytes())
        lines.append(f"{name}|Some text {i}|Some text {i}")
    (tmp_path / "metadata.csv").write_text("\n".join(lines))
    return str(tmp_path)


def test_ljspeech_tacotron_loader(lj_root):
    from deeplearningexamples_tpu.data.ljspeech import LJSpeechDataset, TacotronLoader

    ds = LJSpeechDataset(lj_root)
    assert len(ds) == 4
    loader = TacotronLoader(ds, batch_size=2, max_text_len=32, max_mel_len=64)
    batch = next(iter(loader))
    assert batch["text"].shape == (2, 32)
    assert batch["mel"].shape == (2, 64, 80)
    assert (batch["mel_lengths"] > 0).all()
    # padded region is zero
    for k in range(2):
        assert np.all(batch["text"][k, batch["text_lengths"][k]:] == 0)


def test_ljspeech_waveglow_loader_and_mel_cache(lj_root, tmp_path):
    from deeplearningexamples_tpu.data.ljspeech import (
        LJSpeechDataset, TacotronLoader, WaveGlowLoader, precompute_mels,
    )

    ds = LJSpeechDataset(lj_root)
    wg = WaveGlowLoader(ds, batch_size=2, segment_length=4096)
    b = next(iter(wg))
    assert b["audio"].shape == (2, 4096)
    assert b["mel"].shape[2] == 80

    mel_dir = str(tmp_path / "mels")
    precompute_mels(ds, mel_dir)
    cached = TacotronLoader(ds, batch_size=2, max_text_len=32, max_mel_len=64,
                            mel_dir=mel_dir)
    b2 = next(iter(cached))
    assert b2["mel"].shape == (2, 64, 80)


# -- Criteo -----------------------------------------------------------------


def test_criteo_binary_roundtrip(tmp_path):
    spec = FeatureSpec(categorical_cardinalities=[10, 20, 30])
    write_synthetic_dataset(str(tmp_path / "d"), spec, n_rows=100)
    ds = CriteoBinaryDataset(str(tmp_path / "d"), spec, batch_size=32)
    batches = list(ds)
    assert len(batches) == 3
    b = batches[0]
    assert b["numerical"].shape == (32, 13)
    assert b["categorical"].shape == (32, 3)
    assert (b["categorical"] < [10, 20, 30]).all()
    assert set(np.unique(b["label"])) <= {0.0, 1.0}
    # feature spec yaml roundtrip
    spec2 = FeatureSpec.from_yaml(str(tmp_path / "d" / "feature_spec.yaml"))
    assert spec2.categorical_cardinalities == [10, 20, 30]


def test_criteo_transcode_tsv(tmp_path):
    spec = FeatureSpec(categorical_cardinalities=[100, 100], num_numerical=2)
    tsv = tmp_path / "day_0"
    tsv.write_text(
        "1\t3\t7\tab12\tffee\n"
        "0\t\t2\t\tdead\n"
    )
    n = transcode_tsv(str(tsv), str(tmp_path / "out"), spec)
    assert n == 2
    ds = CriteoBinaryDataset(str(tmp_path / "out"), spec, batch_size=2)
    b = next(iter(ds))
    assert b["label"].tolist() == [1.0, 0.0]
    assert b["numerical"].shape == (2, 2)
    assert (b["categorical"] < 100).all()
    # missing fields -> 0
    assert b["categorical"][1, 0] == 0


def test_criteo_sharding(tmp_path):
    spec = FeatureSpec(categorical_cardinalities=[10])
    write_synthetic_dataset(str(tmp_path / "d"), spec, n_rows=100)
    a = CriteoBinaryDataset(str(tmp_path / "d"), spec, 10, shard=(0, 2))
    b = CriteoBinaryDataset(str(tmp_path / "d"), spec, 10, shard=(1, 2))
    assert a.stop == 50 and b.start == 50 and b.stop == 100


def test_criteo_frequency_threshold_preproc(tmp_path):
    from deeplearningexamples_tpu.data.criteo import preprocess_criteo_tsv

    # table 0: "aa" x3, "bb" x1; table 1: "cc" x2, "dd" x2
    day0 = tmp_path / "day_0"
    day0.write_text(
        "1\t1\taa\tcc\n"
        "0\t2\taa\tdd\n"
        "1\t3\tbb\tcc\n"
    )
    day1 = tmp_path / "day_1"
    day1.write_text("0\t4\taa\tdd\n")
    spec = preprocess_criteo_tsv(
        [str(day0), str(day1)], str(tmp_path / "out"),
        frequency_threshold=2, num_numerical=1, n_cat=2,
        test_split_last=True,
    )
    # table 0: only "aa" (3 >= 2) survives -> card 2; "bb" -> rare bucket 0
    # table 1: "cc" and "dd" both x2 -> card 3
    assert spec.categorical_cardinalities == [2, 3]
    train = CriteoBinaryDataset(
        str(tmp_path / "out" / "train"), spec, batch_size=3,
    )
    b = next(iter(train))
    # "aa" -> 1 (most frequent), "bb" -> 0 (rare)
    assert b["categorical"][:, 0].tolist() == [1, 1, 0]
    # "cc"/"dd" tie at 2 -> lexicographic: cc=1, dd=2
    assert b["categorical"][:, 1].tolist() == [1, 2, 1]
    test = CriteoBinaryDataset(
        str(tmp_path / "out" / "test"), spec, batch_size=1,
        drop_last=False,
    )
    tb = next(iter(test))
    assert tb["categorical"].tolist() == [[1, 2]]
    assert tb["label"].tolist() == [0.0]


def test_coco_raw_loader_for_detectors(tmp_path):
    from PIL import Image

    from deeplearningexamples_tpu.data.coco import CocoDetectionDataset, CocoRawLoader

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(1)
    images, annotations = [], []
    for i in range(4):
        name = f"img{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
        ).save(img_dir / name, "JPEG")
        images.append({"id": i, "file_name": name, "width": 160, "height": 120})
        annotations.append({
            "id": i * 10, "image_id": i, "category_id": 44,
            "bbox": [30, 25, 70, 60], "iscrowd": 0, "area": 4200,
        })
    ann = {"images": images, "annotations": annotations,
           "categories": [{"id": 18, "name": "dog"},
                          {"id": 44, "name": "bottle"}]}
    ann_path = tmp_path / "instances.json"
    ann_path.write_text(json.dumps(ann))

    ds = CocoDetectionDataset(str(img_dir), str(ann_path))
    loader = CocoRawLoader(ds, batch_size=2, image_size=128, max_gt=8,
                           train=False, n_threads=2)
    b = next(iter(loader))
    assert b["image"].shape == (2, 128, 128, 3)
    assert b["boxes"].shape == (2, 8, 4)
    assert b["labels"].shape == (2, 8)
    # category 44 -> 1-based label 2 -> 0-based id 1
    assert b["labels"][b["valid"]].tolist() == [1, 1]
    # boxes are pixel xyxy inside the canvas
    valid_boxes = b["boxes"][b["valid"]]
    assert (valid_boxes[:, 2] > valid_boxes[:, 0]).all()
    assert (valid_boxes <= 128).all() and (valid_boxes >= 0).all()
    assert "image_ids" in b


def test_binned_pretrain_loader_cuts_padding():
    from deeplearningexamples_tpu.data.bert_pretrain import (
        BertPretrainLoader, BinnedBertPretrainLoader,
    )

    rng = np.random.default_rng(0)
    # documents with mostly-short sentences -> binning should pay off
    docs = [
        [rng.integers(5, 1000, rng.integers(4, 30)).astype(np.int32)
         for _ in range(6)]
        for _ in range(8)
    ]
    flat = BertPretrainLoader(docs, batch_size=4, seq_len=256,
                              steps_per_epoch=12)
    binned = BinnedBertPretrainLoader(docs, batch_size=4, seq_len=256,
                                      steps_per_epoch=12, bin_multiple=64)
    flat_tokens = sum(b["input_ids"].size for b in flat)
    seqs = set()
    binned_tokens = 0
    for b in binned:
        assert b["input_ids"].shape[0] == 4
        assert b["input_ids"].shape[1] % 64 == 0
        assert b["input_ids"].shape == b["mlm_labels"].shape
        seqs.add(b["input_ids"].shape[1])
        binned_tokens += b["input_ids"].size
    # shorter-than-max buckets actually occur, and total padded tokens drop
    assert min(seqs) < 256
    assert binned_tokens < flat_tokens * 0.75


def test_polygon_rasterization_and_mask_loader(tmp_path):
    from PIL import Image

    from deeplearningexamples_tpu.data.coco import (
        CocoDetectionDataset, CocoRawLoader, rasterize_polygons,
    )

    # unit-square triangle occupying the lower-left half
    tri = [0.0, 0.0, 1.0, 1.0, 0.0, 1.0]
    m = rasterize_polygons([tri], 32)
    assert 0.35 < m.mean() < 0.65  # ~half the grid
    assert m[30, 1] == 1.0 and m[1, 30] == 0.0  # below vs above diagonal
    # flip mirrors horizontally
    mf = rasterize_polygons([tri], 32, flip=True)
    np.testing.assert_array_equal(mf, m[:, ::-1])

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(2)
    Image.fromarray(rng.integers(0, 255, (100, 100, 3), dtype=np.uint8)
                    ).save(img_dir / "a.jpg", "JPEG")
    Image.fromarray(rng.integers(0, 255, (100, 100, 3), dtype=np.uint8)
                    ).save(img_dir / "b.jpg", "JPEG")
    ann = {
        "images": [{"id": 0, "file_name": "a.jpg", "width": 100, "height": 100},
                   {"id": 1, "file_name": "b.jpg", "width": 100, "height": 100}],
        "annotations": [
            {"id": 1, "image_id": 0, "category_id": 18,
             "bbox": [10, 10, 50, 50], "iscrowd": 0, "area": 2500,
             "segmentation": [[10, 10, 60, 10, 60, 60, 10, 60]]},
            {"id": 2, "image_id": 1, "category_id": 18,
             "bbox": [20, 20, 40, 40], "iscrowd": 0, "area": 1600,
             "segmentation": [[20, 20, 60, 20, 60, 60, 20, 60]]},
        ],
        "categories": [{"id": 18, "name": "dog"}],
    }
    p = tmp_path / "inst.json"
    p.write_text(json.dumps(ann))
    ds = CocoDetectionDataset(str(img_dir), str(p))
    loader = CocoRawLoader(ds, batch_size=2, image_size=128, max_gt=4,
                           train=False, with_masks=True, mask_grid=32,
                           n_threads=2)
    b = next(iter(loader))
    assert b["masks"].shape == (2, 4, 32, 32)
    m0 = b["masks"][0, 0]
    # instance 0 is a square covering fractions [0.1, 0.6]^2 -> ~25% fill
    assert 0.15 < m0.mean() < 0.35
    assert m0[11, 11] == 1.0 and m0[30, 30] == 0.0
