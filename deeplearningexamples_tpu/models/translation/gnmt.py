"""GNMT v2 — LSTM seq2seq with attention.

Breadth recipe (reference ``PyTorch/Translation/GNMT/seq2seq/models/``):
4-layer encoder (layer 1 bidirectional), 4-layer residual decoder with
normalized-Bahdanau attention feeding every layer, label-smoothed CE 0.1,
beam-search inference (shared ``beam_search``). LSTMs run as
``flax.linen.RNN`` scans (XLA unrolls onto the VPU/MXU); hidden 1024.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["GnmtConfig", "Gnmt", "GnmtTask"]


@dataclass(frozen=True)
class GnmtConfig:
    vocab_size: int = 32320
    hidden_size: int = 1024
    num_layers: int = 4
    dropout: float = 0.2
    pad_id: int = 0
    bos_id: int = 2
    eos_id: int = 3
    label_smoothing: float = 0.1

    @property
    def padded_vocab(self) -> int:
        return ((self.vocab_size + 127) // 128) * 128


class BahdanauAttention(nn.Module):
    """Normalized Bahdanau score (reference ``seq2seq/models/attention.py``)."""

    hidden: int
    dtype: Any

    @nn.compact
    def __call__(self, query, keys, mask):
        # query (B, H); keys (B, S, H); mask (B, S)
        q = nn.Dense(self.hidden, use_bias=False, dtype=self.dtype, name="q")(query)
        k = nn.Dense(self.hidden, use_bias=False, dtype=self.dtype, name="k")(keys)
        b = self.param("bias", nn.initializers.zeros, (self.hidden,))
        v = self.param("v", nn.initializers.normal(1.0 / np.sqrt(self.hidden)),
                       (self.hidden,))
        g = self.param("g", nn.initializers.ones, ())
        v_norm = v / jnp.linalg.norm(v) * g
        scores = jnp.einsum(
            "bsh,h->bs",
            jnp.tanh(q[:, None, :] + k + b.astype(self.dtype)),
            v_norm.astype(self.dtype),
        )
        scores = jnp.where(mask > 0, scores, -1e9)
        w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        return jnp.einsum("bs,bsh->bh", w, keys), w


class GnmtDecoderCell(nn.Module):
    cfg: GnmtConfig
    dtype: Any

    @nn.compact
    def __call__(self, carry, tok_emb, memory, mask):
        cfg = self.cfg
        states, context = carry
        new_states = []
        # layer 0: input = [emb, context]
        x = jnp.concatenate([tok_emb, context], axis=-1)
        cell0 = nn.OptimizedLSTMCell(cfg.hidden_size, dtype=self.dtype, name="l0")
        (c0, h0), _ = cell0((states[0][0], states[0][1]), x)
        new_states.append((c0, h0))
        context, align = BahdanauAttention(cfg.hidden_size, self.dtype,
                                           name="attn")(h0, memory, mask)
        x = h0
        for i in range(1, cfg.num_layers):
            inp = jnp.concatenate([x, context], axis=-1)
            cell = nn.OptimizedLSTMCell(cfg.hidden_size, dtype=self.dtype,
                                        name=f"l{i}")
            (ci, hi), _ = cell((states[i][0], states[i][1]), inp)
            new_states.append((ci, hi))
            x = hi + x if i > 1 else hi  # residual from layer 2 on
        return (tuple(new_states), context), (x, align)


class Gnmt(nn.Module):
    cfg: GnmtConfig = GnmtConfig()
    dtype: Any = jnp.bfloat16

    def setup(self):
        cfg = self.cfg
        self.embed = nn.Embed(cfg.padded_vocab, cfg.hidden_size,
                              embedding_init=nn.initializers.uniform(0.1),
                              dtype=self.dtype)
        h = cfg.hidden_size
        self.enc_fwd = nn.RNN(nn.OptimizedLSTMCell(h // 2, dtype=self.dtype))
        self.enc_bwd = nn.RNN(nn.OptimizedLSTMCell(h // 2, dtype=self.dtype),
                              reverse=True, keep_order=True)
        self.enc_layers = [
            nn.RNN(nn.OptimizedLSTMCell(h, dtype=self.dtype), name=f"enc_{i}")
            for i in range(1, cfg.num_layers)
        ]
        self.cell = GnmtDecoderCell(cfg, self.dtype)
        self.classifier = nn.Dense(cfg.padded_vocab, dtype=jnp.float32)
        self.drop = nn.Dropout(cfg.dropout)

    def encode(self, src_ids, deterministic: bool = True):
        cfg = self.cfg
        lengths = jnp.sum(src_ids != cfg.pad_id, axis=1)
        mask = (src_ids != cfg.pad_id).astype(jnp.int32)
        x = self.embed(src_ids)
        x = self.drop(x, deterministic=deterministic)
        x = jnp.concatenate(
            [self.enc_fwd(x, seq_lengths=lengths),
             self.enc_bwd(x, seq_lengths=lengths)], axis=-1,
        )
        for i, rnn in enumerate(self.enc_layers):
            y = self.drop(rnn(x, seq_lengths=lengths), deterministic=deterministic)
            x = x + y if i > 0 else y  # residual from 3rd layer on
        return x * mask[:, :, None], mask

    def _init_carry(self, batch):
        cfg = self.cfg
        z = lambda: jnp.zeros((batch, cfg.hidden_size), self.dtype)
        return (tuple((z(), z()) for _ in range(cfg.num_layers)), z())

    def decode(self, tgt_in, memory, mask, deterministic: bool = True):
        emb = self.drop(self.embed(tgt_in), deterministic=deterministic)

        def body(mdl, carry, x):
            return mdl.cell(carry, x, memory, mask)

        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False, "dropout": True},
                       in_axes=1, out_axes=1)
        carry = self._init_carry(tgt_in.shape[0])
        _, (hidden, _aligns) = scan(self, carry, emb)
        return self.classifier(hidden.astype(jnp.float32))

    def __call__(self, src_ids, tgt_in, deterministic: bool = True):
        memory, mask = self.encode(src_ids, deterministic)
        return self.decode(tgt_in, memory, mask, deterministic)


@dataclass
class GnmtTask:
    cfg: GnmtConfig = GnmtConfig()
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        self.model = Gnmt(self.cfg, self.dtype)

    def init(self, rng, seq=8, batch=2):
        ids = jnp.full((batch, seq), self.cfg.pad_id, jnp.int32)
        variables = self.model.init(
            {"params": rng, "dropout": jax.random.key(1)}, ids, ids
        )
        return variables["params"], {}

    def loss_fn(self, params, model_state, batch, rng):
        cfg = self.cfg
        tgt_in, tgt_out = batch["tgt"][:, :-1], batch["tgt"][:, 1:]
        logits = self.model.apply(
            {"params": params}, batch["src"], tgt_in,
            deterministic=False, rngs={"dropout": rng},
        )
        valid = (tgt_out != cfg.pad_id).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, tgt_out[..., None], axis=-1)[..., 0]
        smooth = -jnp.mean(logp, axis=-1)
        ce = (1 - cfg.label_smoothing) * nll + cfg.label_smoothing * smooth
        loss = jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        return loss, (model_state, {})
