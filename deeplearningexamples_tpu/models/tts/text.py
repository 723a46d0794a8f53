"""Text frontend: symbol set + text→sequence conversion.

Compact re-implementation of the reference's text module
(``PyTorch/SpeechSynthesis/Tacotron2/tacotron2/text/``): the 148-symbol
inventory (pad + punctuation + letters + ARPAbet phonemes prefixed with
``@``), english cleaners (lowercase, abbreviation expansion, whitespace
collapse), and curly-brace ARPAbet sequences (``{HH AH0 L OW1}``).
"""

from __future__ import annotations

import re

__all__ = ["symbols", "text_to_sequence", "sequence_to_text", "N_SYMBOLS"]

_pad = "_"
_punctuation = "!'(),.:;? "
_special = "-"
_letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"

_arpabet_phonemes = [
    "AA", "AA0", "AA1", "AA2", "AE", "AE0", "AE1", "AE2", "AH", "AH0", "AH1",
    "AH2", "AO", "AO0", "AO1", "AO2", "AW", "AW0", "AW1", "AW2", "AY", "AY0",
    "AY1", "AY2", "B", "CH", "D", "DH", "EH", "EH0", "EH1", "EH2", "ER", "ER0",
    "ER1", "ER2", "EY", "EY0", "EY1", "EY2", "F", "G", "HH", "IH", "IH0",
    "IH1", "IH2", "IY", "IY0", "IY1", "IY2", "JH", "K", "L", "M", "N", "NG",
    "OW", "OW0", "OW1", "OW2", "OY", "OY0", "OY1", "OY2", "P", "R", "S", "SH",
    "T", "TH", "UH", "UH0", "UH1", "UH2", "UW", "UW0", "UW1", "UW2", "V", "W",
    "Y", "Z", "ZH",
]
_arpabet = ["@" + p for p in _arpabet_phonemes]

symbols = [_pad] + list(_special) + list(_punctuation) + list(_letters) + _arpabet
N_SYMBOLS = len(symbols)

_symbol_to_id = {s: i for i, s in enumerate(symbols)}
_id_to_symbol = {i: s for i, s in enumerate(symbols)}

_abbreviations = [
    (re.compile(rf"\b{abbr}\.", re.IGNORECASE), full)
    for abbr, full in [
        ("mrs", "misess"), ("mr", "mister"), ("dr", "doctor"), ("st", "saint"),
        ("co", "company"), ("jr", "junior"), ("maj", "major"), ("gen", "general"),
        ("drs", "doctors"), ("rev", "reverend"), ("lt", "lieutenant"),
        ("hon", "honorable"), ("sgt", "sergeant"), ("capt", "captain"),
        ("esq", "esquire"), ("ltd", "limited"), ("col", "colonel"), ("ft", "fort"),
    ]
]
_whitespace_re = re.compile(r"\s+")
_curly_re = re.compile(r"(.*?)\{(.+?)\}(.*)")


def english_cleaners(text: str) -> str:
    text = text.lower()
    for pattern, replacement in _abbreviations:
        text = pattern.sub(replacement, text)
    text = _whitespace_re.sub(" ", text)
    return text


def _symbols_to_ids(text: str) -> list[int]:
    return [_symbol_to_id[c] for c in text if c in _symbol_to_id]


def _arpabet_to_ids(text: str) -> list[int]:
    return [
        _symbol_to_id["@" + p] for p in text.split() if "@" + p in _symbol_to_id
    ]


def text_to_sequence(text: str, cleaner=english_cleaners) -> list[int]:
    """Text (optionally with {ARPABET} spans) -> symbol id list."""
    seq: list[int] = []
    while text:
        m = _curly_re.match(text)
        if not m:
            seq.extend(_symbols_to_ids(cleaner(text)))
            break
        seq.extend(_symbols_to_ids(cleaner(m.group(1))))
        seq.extend(_arpabet_to_ids(m.group(2)))
        text = m.group(3)
    return seq


def sequence_to_text(sequence) -> str:
    out = []
    for i in sequence:
        s = _id_to_symbol.get(int(i), "")
        out.append(f"{{{s[1:]}}}" if s.startswith("@") else s)
    return "".join(out)
