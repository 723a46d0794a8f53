"""Tacotron2 — attention-based mel-spectrogram synthesis.

Re-design of the reference Tacotron2
(``PyTorch/SpeechSynthesis/Tacotron2/tacotron2/model.py``): text embedding →
3-conv + BiLSTM encoder (:185-248); autoregressive decoder with Prenet
(:119), location-sensitive attention (:59-117), two LSTM cells (:400-448),
teacher-forced ``forward`` (:450-513) and gated ``infer`` (:515-596); 5-conv
Postnet (:133); masked output parsing (:646-656).

TPU-first: the reference's per-frame python loop becomes ``flax.linen.scan``
over the time axis (one compiled step body, sequential grid); inference runs
the same scan to a static ``max_decoder_steps`` with a gate-driven
"finished" mask instead of a data-dependent ``while`` break — XLA-friendly
static shapes, outputs masked exactly like ``parse_output``.
Convs are NWC (time on sublanes, channels on lanes).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["Tacotron2Config", "Tacotron2", "tacotron2_loss"]


@dataclass(frozen=True)
class Tacotron2Config:
    n_symbols: int = 148
    symbols_embedding_dim: int = 512
    encoder_kernel_size: int = 5
    encoder_n_convolutions: int = 3
    encoder_embedding_dim: int = 512
    n_mel_channels: int = 80
    attention_rnn_dim: int = 1024
    decoder_rnn_dim: int = 1024
    prenet_dim: int = 256
    max_decoder_steps: int = 2000
    gate_threshold: float = 0.5
    attention_dim: int = 128
    attention_location_n_filters: int = 32
    attention_location_kernel_size: int = 31
    postnet_embedding_dim: int = 512
    postnet_kernel_size: int = 5
    postnet_n_convolutions: int = 5
    p_attention_dropout: float = 0.1
    p_decoder_dropout: float = 0.1
    dropout: float = 0.5


class Prenet(nn.Module):
    """Two ReLU layers with *always-on* dropout (reference quirk, :119-131)."""

    cfg: Tacotron2Config
    dtype: Any

    @nn.compact
    def __call__(self, x):
        for i in range(2):
            x = nn.Dense(self.cfg.prenet_dim, use_bias=False, dtype=self.dtype,
                         name=f"fc{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.cfg.dropout, deterministic=False)(x)
        return x


class Encoder(nn.Module):
    cfg: Tacotron2Config
    dtype: Any

    @nn.compact
    def __call__(self, token_ids, lengths, deterministic: bool):
        cfg = self.cfg
        x = nn.Embed(cfg.n_symbols, cfg.symbols_embedding_dim,
                     embedding_init=nn.initializers.variance_scaling(
                         1.0, "fan_avg", "uniform"),
                     dtype=self.dtype, name="embedding")(token_ids)
        mask = (jnp.arange(x.shape[1])[None, :] < lengths[:, None])
        for i in range(cfg.encoder_n_convolutions):
            x = nn.Conv(cfg.encoder_embedding_dim,
                        (cfg.encoder_kernel_size,), dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(0.5)(x, deterministic=deterministic)
        # NOTE: no per-conv length masking — the reference convs read the
        # pad-symbol embeddings (``Encoder.forward`` :210-214); only the LSTM
        # respects lengths (pack_padded), and pad positions are zeroed below
        # exactly like pad_packed_sequence.
        half = cfg.encoder_embedding_dim // 2
        fwd = nn.RNN(nn.OptimizedLSTMCell(half, dtype=self.dtype), name="lstm_fwd")
        bwd = nn.RNN(nn.OptimizedLSTMCell(half, dtype=self.dtype), name="lstm_bwd",
                     reverse=True, keep_order=True)
        x = jnp.concatenate(
            [fwd(x, seq_lengths=lengths), bwd(x, seq_lengths=lengths)], axis=-1
        )
        return x * mask[:, :, None], mask


class DecoderCell(nn.Module):
    """One autoregressive step (reference ``decode`` :400-448)."""

    cfg: Tacotron2Config
    dtype: Any

    @nn.compact
    def __call__(self, carry, frame_input, memory, processed_memory, mask):
        cfg = self.cfg
        (attn_h, attn_c, dec_h, dec_c, attn_w, attn_w_cum, context) = carry

        prenet_out = Prenet(cfg, self.dtype, name="prenet")(frame_input)

        # attention LSTM
        cell_in = jnp.concatenate([prenet_out, context], axis=-1)
        attn_cell = nn.OptimizedLSTMCell(cfg.attention_rnn_dim, dtype=self.dtype,
                                         name="attention_rnn")
        (attn_c, attn_h), _ = attn_cell((attn_c, attn_h), cell_in)
        attn_h = nn.Dropout(cfg.p_attention_dropout, deterministic=False)(attn_h)

        # location-sensitive attention (reference ``Attention`` :59-117)
        loc = jnp.stack([attn_w, attn_w_cum], axis=-1)  # (B, T, 2)
        loc_f = nn.Conv(cfg.attention_location_n_filters,
                        (cfg.attention_location_kernel_size,), use_bias=False,
                        dtype=self.dtype, name="location_conv")(loc)
        loc_p = nn.Dense(cfg.attention_dim, use_bias=False, dtype=self.dtype,
                         name="location_dense")(loc_f)
        query = nn.Dense(cfg.attention_dim, use_bias=False, dtype=self.dtype,
                         name="query_layer")(attn_h)[:, None, :]
        energies = nn.Dense(1, use_bias=False, dtype=self.dtype, name="v")(
            jnp.tanh(query + processed_memory + loc_p)
        )[..., 0]  # (B, T)
        energies = jnp.where(mask, energies, -1e9)
        attn_w = jax.nn.softmax(energies.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn_w_cum = attn_w_cum + attn_w
        # cast: under bf16 the einsum can promote (memory may be fp32 from
        # the encoder's fp32 mask math), and scan carries must keep dtype
        context = jnp.einsum("bt,bte->be", attn_w, memory).astype(self.dtype)

        # decoder LSTM
        dec_in = jnp.concatenate([attn_h, context], axis=-1)
        dec_cell = nn.OptimizedLSTMCell(cfg.decoder_rnn_dim, dtype=self.dtype,
                                        name="decoder_rnn")
        (dec_c, dec_h), _ = dec_cell((dec_c, dec_h), dec_in)
        dec_h = nn.Dropout(cfg.p_decoder_dropout, deterministic=False)(dec_h)

        proj_in = jnp.concatenate([dec_h, context], axis=-1)
        mel_out = nn.Dense(cfg.n_mel_channels, dtype=self.dtype,
                           name="linear_projection")(proj_in)
        gate = nn.Dense(1, dtype=self.dtype, name="gate_layer")(proj_in)[:, 0]

        carry = (attn_h, attn_c, dec_h, dec_c, attn_w, attn_w_cum, context)
        return carry, (mel_out, gate, attn_w)


class Postnet(nn.Module):
    cfg: Tacotron2Config
    dtype: Any

    @nn.compact
    def __call__(self, mel, deterministic: bool):
        cfg = self.cfg
        x = mel  # (B, T, n_mel)
        for i in range(cfg.postnet_n_convolutions):
            last = i == cfg.postnet_n_convolutions - 1
            ch = cfg.n_mel_channels if last else cfg.postnet_embedding_dim
            x = nn.Conv(ch, (cfg.postnet_kernel_size,), dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name=f"bn{i}")(x)
            if not last:
                x = jnp.tanh(x)
            x = nn.Dropout(0.5)(x, deterministic=deterministic)
        return x


class Tacotron2(nn.Module):
    cfg: Tacotron2Config = Tacotron2Config()
    dtype: Any = jnp.bfloat16

    def setup(self):
        cfg = self.cfg
        self.encoder = Encoder(cfg, self.dtype)
        self.memory_layer = nn.Dense(cfg.attention_dim, use_bias=False,
                                     dtype=self.dtype)
        self.cell = DecoderCell(cfg, self.dtype)
        self.postnet = Postnet(cfg, self.dtype)

    def _init_carry(self, batch, t_in, dtype):
        cfg = self.cfg
        z = lambda d: jnp.zeros((batch, d), dtype)
        return (
            z(cfg.attention_rnn_dim), z(cfg.attention_rnn_dim),
            z(cfg.decoder_rnn_dim), z(cfg.decoder_rnn_dim),
            jnp.zeros((batch, t_in), dtype), jnp.zeros((batch, t_in), dtype),
            z(cfg.encoder_embedding_dim),
        )

    def __call__(self, token_ids, text_lengths, teacher_mels, mel_lengths,
                 deterministic: bool = False):
        """Teacher-forced training forward. teacher_mels (B, T_out, n_mel).
        Returns (mel_before, mel_after_postnet, gates, alignments)."""
        cfg = self.cfg
        memory, mask = self.encoder(token_ids, text_lengths, deterministic)
        processed_memory = self.memory_layer(memory)

        b, t_out, _ = teacher_mels.shape
        go = jnp.zeros((b, 1, cfg.n_mel_channels), teacher_mels.dtype)
        dec_in = jnp.concatenate([go, teacher_mels[:, :-1]], axis=1).astype(self.dtype)

        def body(mdl, carry, frame):
            return mdl.cell(carry, frame, memory, processed_memory, mask)

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=1, out_axes=1,
        )
        carry = self._init_carry(b, memory.shape[1], self.dtype)
        _, (mel, gates, align) = scan(self, carry, dec_in)

        mel = mel.astype(jnp.float32)
        post = self.postnet(mel, deterministic)
        mel_post = mel + post.astype(jnp.float32)

        # mask outputs beyond mel_lengths (reference parse_output :646-656)
        out_mask = (jnp.arange(t_out)[None, :] < mel_lengths[:, None])
        mel = mel * out_mask[:, :, None]
        mel_post = mel_post * out_mask[:, :, None]
        gates = jnp.where(out_mask, gates.astype(jnp.float32), 1e3)
        return mel, mel_post, gates, align

    def infer(self, token_ids, text_lengths, max_steps: int | None = None):
        """Autoregressive inference (reference ``infer`` :515-596): scan to a
        static step budget; gate > threshold freezes the "finished" flag and
        the mel length. Returns (mel_post, mel_lengths, alignments)."""
        cfg = self.cfg
        max_steps = max_steps or cfg.max_decoder_steps
        memory, mask = self.encoder(token_ids, text_lengths, True)
        processed_memory = self.memory_layer(memory)
        b = token_ids.shape[0]

        def body(mdl, carry_all, _):
            carry, frame, finished, length = carry_all
            carry, (mel, gate, align) = mdl.cell(
                carry, frame, memory, processed_memory, mask
            )
            stop = jax.nn.sigmoid(gate.astype(jnp.float32)) > cfg.gate_threshold
            length = jnp.where(finished, length, length + 1)
            finished = finished | stop
            return (carry, mel.astype(self.dtype), finished, length), (mel, align, finished)

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            length=max_steps, out_axes=1,
        )
        carry0 = (
            self._init_carry(b, memory.shape[1], self.dtype),
            jnp.zeros((b, cfg.n_mel_channels), self.dtype),
            jnp.zeros((b,), bool),
            jnp.zeros((b,), jnp.int32),
        )
        (_, _, _, lengths), (mels, aligns, finished_seq) = scan(self, carry0, None)
        mels = mels.astype(jnp.float32)
        post = self.postnet(mels, True)
        mel_post = mels + post.astype(jnp.float32)
        # zero frames after finish
        valid = ~jnp.concatenate(
            [jnp.zeros((b, 1), bool), finished_seq[:, :-1]], axis=1
        )
        mel_post = mel_post * valid[:, :, None]
        return mel_post, lengths, aligns


def tacotron2_loss(mel, mel_post, gates, target_mel, target_gate):
    """MSE(pre) + MSE(post) + BCE(gate) (reference ``loss_function.py:30-45``)."""
    import optax

    mse = jnp.mean((mel - target_mel) ** 2) + jnp.mean((mel_post - target_mel) ** 2)
    gate_loss = jnp.mean(optax.sigmoid_binary_cross_entropy(gates, target_gate))
    return mse + gate_loss
