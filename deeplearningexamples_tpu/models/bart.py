"""BART — denoising seq2seq pretraining + summarization fine-tuning.

Breadth recipe (reference ``PyTorch/LanguageModeling/BART`` — HF-derived
seq2seq with beam-search summarization). Architecture-wise BART *is* the
Transformer encoder-decoder (``models/translation/transformer.py``, learned
positions aside); what defines it is the denoising objective. This module
supplies the noising functions (text infilling with Poisson(3) span lengths
collapsed to a single mask token, sentence permutation) and a task wrapper:
pretraining reconstructs the original text from the corrupted source;
summarization fine-tuning is the same seq2seq loss on (article, summary)
pairs, decoded with ``beam_search``/``beam_search_cached``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np

from .translation.transformer import Transformer, TransformerConfig, TransformerTask

__all__ = ["bart_text_infilling", "bart_sentence_permute", "BartTask"]


def bart_text_infilling(
    tokens: np.ndarray,  # (T,) one document's token ids
    mask_token: int,
    rng: np.random.Generator,
    mask_ratio: float = 0.3,
    poisson_lam: float = 3.0,
) -> np.ndarray:
    """Replace ~mask_ratio of tokens with single <mask> tokens covering
    Poisson-length spans (BART's text infilling — the model must also infer
    span LENGTH, unlike BERT masking). Length-0 spans insert a mask."""
    out = []
    i = 0
    n = len(tokens)
    budget = int(mask_ratio * n)
    masked = 0
    while i < n:
        if masked < budget and rng.random() < mask_ratio:
            span = int(rng.poisson(poisson_lam))
            out.append(mask_token)
            i += span  # span tokens collapse into ONE mask (possibly 0)
            masked += span
        else:
            out.append(tokens[i])
            i += 1
    return np.asarray(out, tokens.dtype)


def bart_sentence_permute(
    tokens: np.ndarray, sep_token: int, rng: np.random.Generator
) -> np.ndarray:
    """Shuffle sentences (split on sep_token) — BART's sentence permutation."""
    idx = np.where(tokens == sep_token)[0]
    pieces = np.split(tokens, idx + 1)
    pieces = [p for p in pieces if len(p)]
    order = rng.permutation(len(pieces))
    return np.concatenate([pieces[i] for i in order])


@dataclass
class BartTask:
    """Denoising pretraining / summarization over the shared Transformer."""

    cfg: TransformerConfig = TransformerConfig()
    dtype: Any = None
    mask_token: int = 3
    mask_ratio: float = 0.3

    def __post_init__(self):
        import jax.numpy as jnp

        self.seq2seq = TransformerTask(
            self.cfg, self.dtype if self.dtype is not None else jnp.bfloat16
        )
        self.model: Transformer = self.seq2seq.model

    def init(self, rng, seq=16, batch=2):
        return self.seq2seq.init(rng, seq=seq, batch=batch)

    # pretraining: corrupt on the host, reconstruct on device
    def make_denoising_batch(
        self, docs: list[np.ndarray], seq_len: int, rng: np.random.Generator
    ) -> dict:
        cfg = self.cfg
        src = np.full((len(docs), seq_len), cfg.pad_id, np.int32)
        tgt = np.full((len(docs), seq_len + 2), cfg.pad_id, np.int32)
        for i, doc in enumerate(docs):
            corrupted = bart_text_infilling(doc, self.mask_token, rng,
                                            self.mask_ratio)
            src[i, : min(len(corrupted), seq_len)] = corrupted[:seq_len]
            clean = doc[: seq_len]
            tgt[i, 0] = cfg.bos_id
            tgt[i, 1 : 1 + len(clean)] = clean
            tgt[i, 1 + len(clean)] = cfg.eos_id
        return {"src": src, "tgt": tgt}

    def loss_fn(self, params, model_state, batch, rng):
        return self.seq2seq.loss_fn(params, model_state, batch, rng)
