"""GNMT v2 — LSTM seq2seq with attention.

Breadth recipe matching the reference architecture exactly
(``PyTorch/Translation/GNMT/seq2seq/models/``):

- encoder (``encoder.py:30-120``): shared embedding, layer 0 bidirectional
  LSTM (hidden H per direction -> 2H), layer 1 takes 2H -> H, residual
  connections from the 3rd layer on, dropout on the INPUT of every LSTM
  (residual taken pre-dropout);
- decoder (``decoder.py:113-244``): NO input feeding — layer 0 LSTM runs
  over the embedded target sequence, normalized Bahdanau attention
  (``attention.py:30-140``) is computed from layer-0 outputs over all
  timesteps AT ONCE, and every later layer consumes ``[x, attn]`` with
  residuals from the 3rd layer; classifier on the last layer's output.

The no-input-feeding structure is also the TPU-friendly one: each LSTM is
one ``nn.RNN`` scan and the attention is a single batched einsum — nothing
sequential crosses the attention, so the decoder is layer-parallel over
time everywhere except inside the LSTM scans themselves.

Numerics-parity with the reference torch modules is asserted by
``tests/test_reference_parity.py::test_gnmt_forward_parity`` via
``utils/torch_import.convert_gnmt``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...ops.dropout import RegenDropout

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
    """Normalized Bahdanau score over all query timesteps at once
    (reference ``attention.py:30-140``, ``normalize=True``)."""

    hidden: int
    dtype: Any

    @nn.compact
    def __call__(self, queries, keys, mask):
        # queries (B, T, H); keys (B, S, H); mask (B, S)
        q = nn.Dense(self.hidden, use_bias=False, dtype=self.dtype,
                     kernel_init=_u01, name="q")(queries)
        k = nn.Dense(self.hidden, use_bias=False, dtype=self.dtype,
                     kernel_init=_u01, name="k")(keys)
        b = self.param("bias", nn.initializers.zeros, (self.hidden,))
        v = self.param("v", _u01, (self.hidden,))
        g = self.param(
            "g", lambda *_: jnp.float32(1.0 / np.sqrt(self.hidden)), ())
        v_norm = v / jnp.linalg.norm(v) * g
        sum_qk = (q[:, :, None, :] + k[:, None, :, :]
                  + b.astype(self.dtype))  # (B, T, S, H)
        scores = jnp.einsum("btsh,h->bts", jnp.tanh(sum_qk),
                            v_norm.astype(self.dtype))
        scores = jnp.where(mask[:, None, :] > 0, scores, -1e9)
        w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        return jnp.einsum("bts,bsh->bth", w, keys), w


def _u01(key, shape, dtype=jnp.float32):
    """uniform(-0.1, 0.1) — the reference's ``init_weight`` initializer."""
    return jax.random.uniform(key, shape, dtype, -0.1, 0.1)


class Gnmt(nn.Module):
    cfg: GnmtConfig = GnmtConfig()
    dtype: Any = jnp.bfloat16

    def setup(self):
        cfg = self.cfg
        h = cfg.hidden_size
        cell = lambda: nn.OptimizedLSTMCell(
            h, dtype=self.dtype, kernel_init=_u01, recurrent_kernel_init=_u01,
            bias_init=nn.initializers.zeros)
        # shared source/target embedding (reference gnmt.py share_embedding)
        self.embed = nn.Embed(cfg.padded_vocab, h, embedding_init=_u01,
                              dtype=self.dtype)
        # encoder: bidirectional layer 0 (H per direction -> 2H output)
        self.enc_fwd = nn.RNN(cell())
        self.enc_bwd = nn.RNN(cell(), reverse=True, keep_order=True)
        self.enc_layers = [
            nn.RNN(cell(), name=f"enc_{i}") for i in range(1, cfg.num_layers)
        ]
        # decoder: layer 0 + attention, then num_layers-1 [x, attn] layers
        self.dec_l0 = nn.RNN(cell())
        self.attn = BahdanauAttention(h, self.dtype)
        self.dec_layers = [
            nn.RNN(cell(), name=f"dec_{i}") for i in range(1, cfg.num_layers)
        ]
        self.classifier = nn.Dense(cfg.padded_vocab, dtype=jnp.float32,
                                   kernel_init=_u01, bias_init=_u01)
        self.drop = RegenDropout(cfg.dropout)

    def encode(self, src_ids, deterministic: bool = True):
        cfg = self.cfg
        lengths = jnp.sum(src_ids != cfg.pad_id, axis=1)
        mask = (src_ids != cfg.pad_id).astype(jnp.int32)
        x = self.embed(src_ids)
        # dropout on LSTM INPUTS; residual from the 3rd layer, taken
        # PRE-dropout (encoder.py:109-117)
        x = self.drop(x, deterministic=deterministic)
        x = jnp.concatenate(
            [self.enc_fwd(x, seq_lengths=lengths),
             self.enc_bwd(x, seq_lengths=lengths)], axis=-1,
        )
        x = self.enc_layers[0](self.drop(x, deterministic=deterministic),
                               seq_lengths=lengths)
        for rnn in self.enc_layers[1:]:
            residual = x
            x = rnn(self.drop(x, deterministic=deterministic),
                    seq_lengths=lengths)
            x = x + residual
        return x * mask[:, :, None], mask

    def decode(self, tgt_in, memory, mask, deterministic: bool = True):
        x = self.drop(self.embed(tgt_in), deterministic=deterministic)
        x = self.dec_l0(x)
        attn, _scores = self.attn(x, memory, mask)
        x = self.dec_layers[0](self.drop(
            jnp.concatenate([x, attn], axis=-1), deterministic=deterministic))
        for rnn in self.dec_layers[1:]:
            residual = x
            x = rnn(self.drop(jnp.concatenate([x, attn], axis=-1),
                              deterministic=deterministic))
            x = x + residual
        return self.classifier(x.astype(jnp.float32))

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
