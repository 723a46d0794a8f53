"""BART — denoising seq2seq pretraining + summarization fine-tuning.

Breadth recipe (reference ``PyTorch/LanguageModeling/BART`` — the vendored
HF ``bart/modeling/modeling_bart.py``). ``BartModel`` is the faithful
architecture: learned positional embeddings with the fairseq +2 offset
(``modeling_bart.py:118-137``), ``layernorm_embedding`` after embed+pos
(``:733,804``), post-LN encoder/decoder layers with exact-erf GELU
(``BartEncoderLayer``/``BartDecoderLayer``, ``normalize_before=False``
default), tied lm head. This module also supplies the noising functions
(text infilling with Poisson(3) span lengths collapsed to a single mask
token, sentence permutation) and a task wrapper: pretraining reconstructs
the original text from the corrupted source; summarization fine-tuning is
the same seq2seq loss on (article, summary) pairs, decoded with
``beam_search``/``beam_search_cached`` (the model keeps the shared
Transformer's encode/decode/decode_step interface).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .translation.transformer import MHA, TransformerConfig

__all__ = ["BartConfig", "BartModel", "bart_text_infilling",
           "bart_sentence_permute", "BartTask"]


@dataclass(frozen=True)
class BartConfig:
    """bart-large defaults (``bart/configuration/configuration_bart.py:102``:
    normalize_before=False -> post-LN, scale_embedding=False,
    normalize_embedding=True, learned positions, gelu)."""

    vocab_size: int = 50265
    d_model: int = 1024
    d_ff: int = 4096
    num_heads: int = 16
    encoder_layers: int = 12
    decoder_layers: int = 12
    dropout: float = 0.1
    max_len: int = 1024
    label_smoothing: float = 0.1
    pad_id: int = 1
    bos_id: int = 0
    eos_id: int = 2
    pre_ln: bool = False
    scale_embedding: bool = False

    @property
    def padded_vocab(self) -> int:
        return ((self.vocab_size + 127) // 128) * 128

    @classmethod
    def from_transformer(cls, t: TransformerConfig) -> "BartConfig":
        return cls(vocab_size=t.vocab_size, d_model=t.d_model, d_ff=t.d_ff,
                   num_heads=t.num_heads, encoder_layers=t.encoder_layers,
                   decoder_layers=t.decoder_layers, dropout=t.dropout,
                   max_len=t.max_len, label_smoothing=t.label_smoothing,
                   pad_id=t.pad_id, bos_id=t.bos_id, eos_id=t.eos_id)


class BartBlock(nn.Module):
    """Post-LN (default) or pre-LN encoder/decoder layer with GELU FF —
    ``BartEncoderLayer`` (``modeling_bart.py:279``) / ``BartDecoderLayer``
    (``:368``). Reuses the shared MHA (separate q/k/v/out Denses — the HF
    layout — with the flash kernel)."""

    cfg: Any
    causal: bool
    cross: bool
    dtype: Any

    @nn.compact
    def __call__(self, x, x_mask, memory, memory_mask, deterministic,
                 decode: bool = False):
        cfg = self.cfg
        ln1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")
        ln2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")

        def attn(y):
            return MHA(cfg, self.causal, self.dtype, name="self_attn")(
                y, y, x_mask, deterministic, decode=decode)

        def ff(y):
            y = nn.Dense(cfg.d_ff, dtype=self.dtype, name="ff1")(y)
            y = nn.gelu(y, approximate=False)
            return nn.Dense(cfg.d_model, dtype=self.dtype, name="ff2")(y)

        drop = nn.Dropout(cfg.dropout)
        if cfg.pre_ln:
            x = x + attn(ln1(x))
            if self.cross:
                lnc = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_cross")
                x = x + MHA(cfg, False, self.dtype, name="cross_attn")(
                    lnc(x), memory, memory_mask, deterministic)
            return x + drop(ff(ln2(x)), deterministic=deterministic)
        x = ln1(x + attn(x))
        if self.cross:
            c = MHA(cfg, False, self.dtype, name="cross_attn")(
                x, memory, memory_mask, deterministic)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_cross")(x + c)
        return ln2(x + drop(ff(x), deterministic=deterministic))


class BartModel(nn.Module):
    """Interface-compatible with ``translation.Transformer`` (encode /
    decode / decode_step / __call__) so ``beam_search``/``beam_search_cached``
    and the summarization pipeline drive it unchanged."""

    cfg: BartConfig = BartConfig()
    dtype: Any = jnp.bfloat16

    # fairseq/HF positional offset: positions are looked up at index+2
    # (BartLearnedPositionalEmbedding, modeling_bart.py:118-137)
    POS_OFFSET = 2

    def setup(self):
        cfg = self.cfg
        self.embed = nn.Embed(
            cfg.padded_vocab, cfg.d_model,
            embedding_init=nn.initializers.normal(0.02), dtype=self.dtype)
        self.enc_pos = nn.Embed(
            cfg.max_len + self.POS_OFFSET, cfg.d_model,
            embedding_init=nn.initializers.normal(0.02), dtype=self.dtype)
        self.dec_pos = nn.Embed(
            cfg.max_len + self.POS_OFFSET, cfg.d_model,
            embedding_init=nn.initializers.normal(0.02), dtype=self.dtype)
        self.enc_emb_ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.dec_emb_ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.enc_layers = [
            BartBlock(cfg, False, False, self.dtype, name=f"enc_{i}")
            for i in range(cfg.encoder_layers)]
        self.dec_layers = [
            BartBlock(cfg, True, True, self.dtype, name=f"dec_{i}")
            for i in range(cfg.decoder_layers)]
        self.drop = nn.Dropout(cfg.dropout)

    def _embed(self, ids, pos_table, emb_ln, deterministic, pos_start=0):
        cfg = self.cfg
        x = self.embed(ids)
        if cfg.scale_embedding:
            x = x * jnp.asarray(cfg.d_model**0.5, self.dtype)
        positions = pos_start + jnp.arange(ids.shape[1]) + self.POS_OFFSET
        x = x + pos_table(positions)[None]
        x = emb_ln(x)
        return self.drop(x, deterministic=deterministic)

    def encode(self, src_ids, deterministic: bool = True):
        mask = (src_ids != self.cfg.pad_id).astype(jnp.int32)
        x = self._embed(src_ids, self.enc_pos, self.enc_emb_ln, deterministic)
        for layer in self.enc_layers:
            x = layer(x, mask, None, None, deterministic)
        return x, mask

    def decode(self, tgt_ids, memory, memory_mask, deterministic: bool = True):
        x = self._embed(tgt_ids, self.dec_pos, self.dec_emb_ln, deterministic)
        tgt_mask = (tgt_ids != self.cfg.pad_id).astype(jnp.int32)
        for layer in self.dec_layers:
            x = layer(x, tgt_mask, memory, memory_mask, deterministic)
        # tied lm head (BartForConditionalGeneration.lm_head, bias-free;
        # final_logits_bias is a zeros buffer upstream — folded out)
        return jax.lax.dot_general(
            x, self.embed.embedding.astype(self.dtype),
            (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    def decode_step(self, token, pos, memory, memory_mask):
        """Incremental decode: token (B,) at position pos -> logits (B, V).
        Requires a mutable "cache" collection (see ``beam_search_cached``)."""
        x = self.embed(token[:, None])
        if self.cfg.scale_embedding:
            x = x * jnp.asarray(self.cfg.d_model**0.5, self.dtype)
        ptab = self.dec_pos.embedding
        x = x + jax.lax.dynamic_slice_in_dim(
            ptab, pos + self.POS_OFFSET, 1)[None].astype(self.dtype)
        x = self.dec_emb_ln(x)
        ones = jnp.ones((x.shape[0], 1), jnp.int32)
        for layer in self.dec_layers:
            x = layer(x, ones, memory, memory_mask, True, decode=True)
        logits = jax.lax.dot_general(
            x, self.embed.embedding.astype(self.dtype),
            (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        return logits[:, 0]

    def __call__(self, src_ids, tgt_in, deterministic: bool = True):
        memory, memory_mask = self.encode(src_ids, deterministic)
        return self.decode(tgt_in, memory, memory_mask, deterministic)


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
    """Denoising pretraining / summarization over ``BartModel``. Accepts a
    ``BartConfig`` or (for CLI/back-compat) a ``TransformerConfig``."""

    cfg: Any = None
    dtype: Any = None
    mask_token: int = 3
    mask_ratio: float = 0.3

    def __post_init__(self):
        if self.cfg is None:
            self.cfg = BartConfig()
        elif isinstance(self.cfg, TransformerConfig):
            self.cfg = BartConfig.from_transformer(self.cfg)
        self.model = BartModel(
            self.cfg, self.dtype if self.dtype is not None else jnp.bfloat16)

    def init(self, rng, seq=16, batch=2):
        ids = jnp.full((batch, seq), self.cfg.pad_id, jnp.int32)
        return self.model.init(rng, ids, ids)["params"], {}

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
        """batch: src (B,S), tgt (B,T) — tgt includes BOS...EOS; teacher
        forcing shifts internally; pads are excluded from the label-smoothed
        CE (the reference recipe's 0.1 smoothing)."""
        cfg = self.cfg
        tgt_in = batch["tgt"][:, :-1]
        tgt_out = batch["tgt"][:, 1:]
        logits = self.model.apply(
            {"params": params}, batch["src"], tgt_in,
            deterministic=False, rngs={"dropout": rng},
        )
        valid = (tgt_out != cfg.pad_id).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, tgt_out[..., None], axis=-1)[..., 0]
        smooth = -jnp.mean(logp, axis=-1)
        ls = cfg.label_smoothing
        ce = (1.0 - ls) * nll + ls * smooth
        loss = jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        return loss, (model_state, {})
