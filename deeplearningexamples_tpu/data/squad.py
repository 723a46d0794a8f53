"""SQuAD v1.1/v2 feature pipeline.

Re-implements the reference's example/feature conversion
(``PyTorch/LanguageModeling/BERT/run_squad.py``: ``read_squad_examples``,
``convert_examples_to_features`` — doc-stride sliding windows, char→token
answer mapping with ``_improve_answer_span``, ``max_query_length`` trim) so
fine-tuning runs from the official ``train-v1.1.json``.

Output features: input_ids / attention_mask / token_type_ids /
start_positions / end_positions (+ bookkeeping for eval span→text mapping).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Iterator

import numpy as np

from .tokenization import BertTokenizer

__all__ = ["SquadExample", "SquadFeature", "read_squad_examples",
           "convert_examples_to_features", "SquadLoader"]


@dataclass
class SquadExample:
    qid: str
    question: str
    doc_tokens: list[str]
    answer_text: str = ""
    start_position: int = -1  # token index into doc_tokens
    end_position: int = -1
    is_impossible: bool = False


@dataclass
class SquadFeature:
    qid: str
    input_ids: np.ndarray
    attention_mask: np.ndarray
    token_type_ids: np.ndarray
    start_position: int
    end_position: int
    tokens: list[str]
    token_to_orig: dict[int, int]  # feature token idx -> doc token idx
    token_is_max_context: dict[int, bool]
    doc_tokens: list[str]


def read_squad_examples(path: str, is_training: bool = True) -> list[SquadExample]:
    with open(path, encoding="utf-8") as f:
        data = json.load(f)["data"]
    examples = []
    for article in data:
        for para in article["paragraphs"]:
            text = para["context"]
            doc_tokens: list[str] = []
            char_to_word: list[int] = []
            prev_ws = True
            for c in text:
                if c in " \t\r\n" or ord(c) == 0x202F:
                    prev_ws = True
                else:
                    if prev_ws:
                        doc_tokens.append(c)
                    else:
                        doc_tokens[-1] += c
                    prev_ws = False
                char_to_word.append(len(doc_tokens) - 1)
            for qa in para["qas"]:
                ex = SquadExample(qa["id"], qa["question"], doc_tokens)
                if is_training:
                    if qa.get("is_impossible"):
                        ex.is_impossible = True
                    elif qa["answers"]:
                        ans = qa["answers"][0]
                        ex.answer_text = ans["text"]
                        start_c = ans["answer_start"]
                        ex.start_position = char_to_word[start_c]
                        ex.end_position = char_to_word[
                            min(start_c + len(ans["text"]) - 1, len(text) - 1)
                        ]
                examples.append(ex)
    return examples


def convert_examples_to_features(
    examples: list[SquadExample],
    tokenizer: BertTokenizer,
    max_seq_length: int = 384,
    doc_stride: int = 128,
    max_query_length: int = 64,
    is_training: bool = True,
) -> list[SquadFeature]:
    features = []
    for ex in examples:
        query = tokenizer.tokenize(ex.question)[:max_query_length]
        # subtokenize doc with orig mapping
        all_doc_tokens: list[str] = []
        tok_to_orig: list[int] = []
        orig_to_tok: list[int] = []
        for i, tok in enumerate(ex.doc_tokens):
            orig_to_tok.append(len(all_doc_tokens))
            for sub in tokenizer.tokenize(tok):
                all_doc_tokens.append(sub)
                tok_to_orig.append(i)

        tok_start = tok_end = -1
        if is_training and ex.start_position >= 0:
            tok_start = orig_to_tok[ex.start_position]
            tok_end = (
                orig_to_tok[ex.end_position + 1] - 1
                if ex.end_position + 1 < len(ex.doc_tokens)
                else len(all_doc_tokens) - 1
            )
            # improve span: prefer sub-span whose text equals the answer
            ans_toks = tokenizer.tokenize(ex.answer_text)
            for s in range(tok_start, tok_end + 1):
                for e in range(tok_end, s - 1, -1):
                    if all_doc_tokens[s : e + 1] == ans_toks:
                        tok_start, tok_end = s, e
                        break

        max_doc = max_seq_length - len(query) - 3
        spans = []
        offset = 0
        while offset < len(all_doc_tokens):
            spans.append((offset, min(max_doc, len(all_doc_tokens) - offset)))
            if offset + max_doc >= len(all_doc_tokens):
                break
            offset += min(max_doc, doc_stride)

        for si, (span_start, span_len) in enumerate(spans):
            tokens = ["[CLS]"] + query + ["[SEP]"]
            seg = [0] * len(tokens)
            token_to_orig: dict[int, int] = {}
            token_is_max: dict[int, bool] = {}
            for j in range(span_len):
                di = span_start + j
                token_to_orig[len(tokens)] = tok_to_orig[di]
                token_is_max[len(tokens)] = _is_max_context(spans, si, di)
                tokens.append(all_doc_tokens[di])
                seg.append(1)
            tokens.append("[SEP]")
            seg.append(1)

            ids = tokenizer.convert_tokens_to_ids(tokens)
            mask = [1] * len(ids)
            pad = max_seq_length - len(ids)
            ids += [0] * pad
            mask += [0] * pad
            seg += [0] * pad

            start = end = 0
            if is_training and not ex.is_impossible and tok_start >= 0:
                in_span = span_start <= tok_start and tok_end < span_start + span_len
                if in_span:
                    doc_offset = len(query) + 2
                    start = tok_start - span_start + doc_offset
                    end = tok_end - span_start + doc_offset
            features.append(
                SquadFeature(
                    ex.qid,
                    np.asarray(ids, np.int32), np.asarray(mask, np.int32),
                    np.asarray(seg, np.int32), start, end, tokens,
                    token_to_orig, token_is_max, ex.doc_tokens,
                )
            )
    return features


def _is_max_context(spans, span_index, doc_index) -> bool:
    """Reference ``_check_is_max_context``: a token's best span maximizes
    min(left_ctx, right_ctx) + 0.01 * span_len."""
    best, best_i = None, None
    for i, (start, length) in enumerate(spans):
        end = start + length - 1
        if doc_index < start or doc_index > end:
            continue
        score = min(doc_index - start, end - doc_index) + 0.01 * length
        if best is None or score > best:
            best, best_i = score, i
    return best_i == span_index


class SquadLoader:
    """Batches features into the BertSquadTask batch dict."""

    def __init__(self, features: list[SquadFeature], batch_size: int,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = True):
        self.features = features
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.drop_last = drop_last

    def __len__(self):
        return len(self.features) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        order = np.arange(len(self.features))
        if self.shuffle:
            order = np.random.default_rng(self.seed + self.epoch).permutation(order)
        self.epoch += 1
        bs = self.batch_size
        for i in range(0, len(order) - bs + 1, bs):
            fs = [self.features[j] for j in order[i : i + bs]]
            yield {
                "input_ids": np.stack([f.input_ids for f in fs]),
                "attention_mask": np.stack([f.attention_mask for f in fs]),
                "token_type_ids": np.stack([f.token_type_ids for f in fs]),
                "start_positions": np.asarray([f.start_position for f in fs], np.int32),
                "end_positions": np.asarray([f.end_position for f in fs], np.int32),
            }
