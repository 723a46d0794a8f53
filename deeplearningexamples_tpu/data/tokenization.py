"""WordPiece tokenization for BERT.

Re-implements the reference tokenizer
(``PyTorch/LanguageModeling/BERT/tokenization.py``): ``BasicTokenizer``
(lowercase, accent-strip, punctuation split, CJK spacing) and
``WordpieceTokenizer`` (greedy longest-match-first with ``##`` continuations,
``[UNK]`` for >200-char or unmatchable tokens), plus vocab loading and the
``convert_tokens_to_ids`` surface.
"""

from __future__ import annotations

import collections
import unicodedata

__all__ = ["BertTokenizer", "BasicTokenizer", "WordpieceTokenizer", "load_vocab"]


def load_vocab(vocab_file: str) -> dict[str, int]:
    vocab: dict[str, int] = collections.OrderedDict()
    with open(vocab_file, encoding="utf-8") as f:
        for i, line in enumerate(f):
            token = line.rstrip("\n")
            if token:
                vocab[token] = i
    return vocab


def _is_whitespace(ch: str) -> bool:
    return ch in " \t\n\r" or unicodedata.category(ch) == "Zs"


def _is_control(ch: str) -> bool:
    if ch in "\t\n\r":
        return False
    return unicodedata.category(ch).startswith("C")


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return (
        0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F or 0x2B820 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF or 0x2F800 <= cp <= 0x2FA1F
    )


class BasicTokenizer:
    def __init__(self, do_lower_case: bool = True):
        self.do_lower_case = do_lower_case

    def tokenize(self, text: str) -> list[str]:
        # clean: drop control chars, normalize whitespace
        text = "".join(
            " " if _is_whitespace(c) else c
            for c in text
            if not (_is_control(c) or ord(c) == 0 or ord(c) == 0xFFFD)
        )
        # CJK spacing
        text = "".join(
            f" {c} " if _is_cjk(ord(c)) else c for c in text
        )
        tokens = []
        for tok in text.strip().split():
            if self.do_lower_case:
                tok = tok.lower()
                tok = "".join(
                    c for c in unicodedata.normalize("NFD", tok)
                    if unicodedata.category(c) != "Mn"
                )
            # split on punctuation
            cur: list[str] = []
            for c in tok:
                if _is_punctuation(c):
                    tokens.append("".join(cur)) if cur else None
                    tokens.append(c)
                    cur = []
                else:
                    cur.append(c)
            if cur:
                tokens.append("".join(cur))
        return [t for t in tokens if t]


class WordpieceTokenizer:
    def __init__(self, vocab: dict[str, int], unk_token: str = "[UNK]",
                 max_chars_per_word: int = 200):
        self.vocab = vocab
        self.unk_token = unk_token
        self.max_chars_per_word = max_chars_per_word

    def tokenize(self, token: str) -> list[str]:
        if len(token) > self.max_chars_per_word:
            return [self.unk_token]
        out: list[str] = []
        start = 0
        while start < len(token):
            end = len(token)
            cur = None
            while start < end:
                sub = token[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [self.unk_token]
            out.append(cur)
            start = end
        return out


class BertTokenizer:
    def __init__(self, vocab_file: str | dict, do_lower_case: bool = True):
        self.vocab = (
            load_vocab(vocab_file) if isinstance(vocab_file, str) else dict(vocab_file)
        )
        self.ids_to_tokens = {v: k for k, v in self.vocab.items()}
        self.basic = BasicTokenizer(do_lower_case)
        self.wordpiece = WordpieceTokenizer(self.vocab)

    def tokenize(self, text: str) -> list[str]:
        out = []
        for tok in self.basic.tokenize(text):
            out.extend(self.wordpiece.tokenize(tok))
        return out

    def convert_tokens_to_ids(self, tokens: list[str]) -> list[int]:
        unk = self.vocab.get("[UNK]", 0)
        return [self.vocab.get(t, unk) for t in tokens]

    def convert_ids_to_tokens(self, ids) -> list[str]:
        return [self.ids_to_tokens.get(int(i), "[UNK]") for i in ids]
