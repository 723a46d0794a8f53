"""FastPitch — parallel (non-autoregressive) mel synthesis.

Breadth recipe (reference ``PyTorch/SpeechSynthesis/FastPitch/fastpitch/
model.py``): FFT-block transformer encoder over symbols, explicit duration
and pitch predictors, pitch embedding added to encoder output, length
regulator expanding tokens by durations, FFT-block decoder to mels. Training
uses ground-truth durations/pitch (extracted offline from alignments, as the
reference does); losses are mel MSE + log-duration MSE + pitch MSE.

The length regulator — a data-dependent expansion — is jit-safe here via a
searchsorted gather to a static ``max_mel_len`` with a validity mask.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import flash_attention
from ...ops.dropout import RegenDropout

__all__ = ["FastPitchConfig", "FastPitch", "FastPitchTask", "length_regulate"]


@dataclass(frozen=True)
class FastPitchConfig:
    n_symbols: int = 148
    d_model: int = 384
    n_heads: int = 1
    encoder_layers: int = 6
    decoder_layers: int = 6
    conv_kernel: int = 3
    conv_filters: int = 1536
    n_mels: int = 80
    max_mel_len: int = 900
    dropout: float = 0.1
    head_dim: int = 64


def length_regulate(x, durations, max_len):
    """Expand (B, T, D) by integer durations -> (B, max_len, D) + mask.

    Output position j takes the token whose cumulative-duration interval
    contains j (searchsorted); positions past total duration are masked.
    """
    ends = jnp.cumsum(durations, axis=1)  # (B, T)
    pos = jnp.arange(max_len)[None, :]  # (1, L)
    src = jax.vmap(lambda e, p: jnp.searchsorted(e, p, side="right"))(
        ends, jnp.broadcast_to(pos, (x.shape[0], max_len))
    )
    src = jnp.clip(src, 0, x.shape[1] - 1)
    out = jnp.take_along_axis(x, src[:, :, None], axis=1)
    mask = pos < ends[:, -1:]
    return out * mask[:, :, None].astype(x.dtype), mask


class FFTBlock(nn.Module):
    cfg: FastPitchConfig
    dtype: Any

    @nn.compact
    def __call__(self, x, mask, deterministic):
        cfg = self.cfg
        b, s, _ = x.shape
        h = max(cfg.n_heads, cfg.d_model // cfg.head_dim)
        hd = cfg.d_model // h
        qkv = nn.Dense(3 * cfg.d_model, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        heads = lambda t: t.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        ctx = flash_attention(heads(q), heads(k), heads(v), key_mask=mask)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, cfg.d_model)
        ctx = nn.Dense(cfg.d_model, dtype=self.dtype, name="attn_out")(ctx)
        ctx = RegenDropout(cfg.dropout)(ctx, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="ln1")(x + ctx)
        y = nn.Conv(cfg.conv_filters, (cfg.conv_kernel,), dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(y)
        y = nn.Conv(cfg.d_model, (cfg.conv_kernel,), dtype=self.dtype,
                    name="conv2")(y)
        y = RegenDropout(cfg.dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="ln2")(x + y)


class Predictor(nn.Module):
    """Duration/pitch predictor: 2x (conv + relu + LN + dropout) + proj."""

    cfg: FastPitchConfig
    dtype: Any

    @nn.compact
    def __call__(self, x, deterministic):
        cfg = self.cfg
        for i in range(2):
            x = nn.Conv(256, (3,), dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.relu(x)
            x = nn.LayerNorm(dtype=self.dtype, name=f"ln{i}")(x)
            x = RegenDropout(0.1)(x, deterministic=deterministic)
        return nn.Dense(1, dtype=jnp.float32, name="proj")(
            x.astype(jnp.float32)
        )[..., 0]


class FastPitch(nn.Module):
    cfg: FastPitchConfig = FastPitchConfig()
    dtype: Any = jnp.bfloat16

    def setup(self):
        cfg = self.cfg
        self.embed = nn.Embed(cfg.n_symbols, cfg.d_model,
                              embedding_init=nn.initializers.normal(0.02),
                              dtype=self.dtype)
        pos = np.zeros((max(cfg.max_mel_len, 2048), cfg.d_model), np.float32)
        p = np.arange(pos.shape[0])[:, None]
        div = np.exp(np.arange(0, cfg.d_model, 2) * (-np.log(10000.0) / cfg.d_model))
        pos[:, 0::2] = np.sin(p * div)
        pos[:, 1::2] = np.cos(p * div)
        self.pos = jnp.asarray(pos)
        self.enc = [FFTBlock(cfg, self.dtype, name=f"enc_{i}")
                    for i in range(cfg.encoder_layers)]
        self.dec = [FFTBlock(cfg, self.dtype, name=f"dec_{i}")
                    for i in range(cfg.decoder_layers)]
        self.duration_predictor = Predictor(cfg, self.dtype)
        self.pitch_predictor = Predictor(cfg, self.dtype)
        self.pitch_embed = nn.Conv(cfg.d_model, (3,), dtype=self.dtype)
        self.mel_proj = nn.Dense(cfg.n_mels, dtype=jnp.float32)

    def _encode(self, text, text_mask, deterministic):
        x = self.embed(text) + self.pos[None, : text.shape[1]].astype(self.dtype)
        for blk in self.enc:
            x = blk(x, text_mask, deterministic)
        return x * text_mask[:, :, None].astype(x.dtype)

    def __call__(self, text, durations, pitch, max_mel_len=None,
                 deterministic: bool = True):
        """Training forward with ground-truth durations/pitch.
        Returns (mel (B, L, n_mels), log_dur_pred (B, T), pitch_pred (B, T),
        mel_mask (B, L))."""
        cfg = self.cfg
        max_mel_len = max_mel_len or cfg.max_mel_len
        text_mask = (text != 0).astype(jnp.int32)
        x = self._encode(text, text_mask, deterministic)
        log_dur_pred = self.duration_predictor(x, deterministic)
        pitch_pred = self.pitch_predictor(x, deterministic)
        # condition on ground-truth pitch (training) — reference behavior
        x = x + self.pitch_embed(pitch[:, :, None].astype(self.dtype))
        y, mel_mask = length_regulate(x, durations, max_mel_len)
        y = y + self.pos[None, : y.shape[1]].astype(self.dtype)
        for blk in self.dec:
            y = blk(y, mel_mask.astype(jnp.int32), deterministic)
        mel = self.mel_proj(y.astype(jnp.float32))
        return mel, log_dur_pred, pitch_pred, mel_mask

    def infer(self, text, pace: float = 1.0, max_mel_len=None):
        cfg = self.cfg
        max_mel_len = max_mel_len or cfg.max_mel_len
        text_mask = (text != 0).astype(jnp.int32)
        x = self._encode(text, text_mask, True)
        dur = jnp.clip(
            jnp.round(jnp.exp(self.duration_predictor(x, True)) - 1.0) / pace,
            0, None,
        ).astype(jnp.int32) * text_mask
        pitch = self.pitch_predictor(x, True)
        x = x + self.pitch_embed(pitch[:, :, None].astype(self.dtype))
        y, mel_mask = length_regulate(x, dur, max_mel_len)
        y = y + self.pos[None, : y.shape[1]].astype(self.dtype)
        for blk in self.dec:
            y = blk(y, mel_mask.astype(jnp.int32), True)
        mel = self.mel_proj(y.astype(jnp.float32))
        mel_len = jnp.sum(dur, axis=1)
        return mel, mel_len


@dataclass
class FastPitchTask:
    cfg: FastPitchConfig = FastPitchConfig()
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        self.model = FastPitch(self.cfg, self.dtype)

    def init(self, rng, text_len=16, batch=2):
        init_rng, drop = jax.random.split(rng)
        text = jnp.ones((batch, text_len), jnp.int32)
        dur = jnp.ones((batch, text_len), jnp.int32)
        pitch = jnp.zeros((batch, text_len))
        variables = self.model.init(
            {"params": init_rng, "dropout": drop}, text, dur, pitch,
            max_mel_len=32,
        )
        return variables["params"], {}

    def loss_fn(self, params, model_state, batch, rng):
        mel, log_dur, pitch_pred, mel_mask = self.model.apply(
            {"params": params},
            batch["text"], batch["durations"], batch["pitch"],
            max_mel_len=batch["mel"].shape[1],
            deterministic=False, rngs={"dropout": rng},
        )
        m = mel_mask[:, :, None].astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(m), 1.0)
        mel_loss = jnp.sum(((mel - batch["mel"]) ** 2) * m) / (
            denom * self.cfg.n_mels
        )
        tmask = (batch["text"] != 0).astype(jnp.float32)
        tdenom = jnp.maximum(jnp.sum(tmask), 1.0)
        dur_loss = jnp.sum(
            (log_dur - jnp.log1p(batch["durations"].astype(jnp.float32))) ** 2
            * tmask
        ) / tdenom
        pitch_loss = jnp.sum((pitch_pred - batch["pitch"]) ** 2 * tmask) / tdenom
        loss = mel_loss + 0.1 * dur_loss + 0.1 * pitch_loss
        return loss, (model_state, {"mel_loss": mel_loss, "dur_loss": dur_loss})
