"""FastPitch — parallel (non-autoregressive) mel synthesis.

Architecture matches the reference
(``PyTorch/SpeechSynthesis/FastPitch/fastpitch/{model,transformer}.py``):

- FFTransformer (``transformer.py:152-213``): word embedding (padding row
  zero), concatenated [sin|cos] positional embedding masked and ADDED, then
  post-LN transformer layers whose outputs are re-masked after both the
  attention and the conv-FF sublayer;
- MultiHeadAttn (``transformer.py:81-149``): one fused qkv Linear of width
  3*n_head*d_head (n_head*d_head need NOT equal d_model — the LJSpeech
  recipe uses 1 head of 64 against d_model 384), output projection without
  bias, post layer-norm;
- PositionwiseConvFF (``transformer.py:38-77``): conv(k)-relu-conv(k),
  dropout, post layer-norm;
- TemporalPredictor (``model.py:90-109``): masked input, ConvReLUNorm
  stack (``common/layers.py:76-88``), linear head, masked output;
- pitch/energy conditioning (``model.py:175-207, 262-283``): per-symbol
  pitch (and mel-energy) averaged over durations, embedded by a conv and
  added to the encoder output — energy AFTER pitch, matching the 1.1
  recipe's energy_conditioning default;
- regulate_len (``model.py:44-66``) as a jit-safe searchsorted gather to a
  static ``max_mel_len`` with a validity mask.

Training here uses ground-truth durations (the reference's external-
alignment mode; its ConvAttention+MAS online aligner is training-data
machinery, not part of the synthesis network). Numerics parity of the
synthesis path is asserted by
``tests/test_reference_parity.py::test_fastpitch_forward_parity``.
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

__all__ = ["FastPitchConfig", "FastPitch", "FastPitchTask",
           "length_regulate", "average_over_durations"]


@dataclass(frozen=True)
class FastPitchConfig:
    n_symbols: int = 148
    d_model: int = 384
    n_heads: int = 1
    head_dim: int = 64
    encoder_layers: int = 6
    decoder_layers: int = 6
    conv_kernel: int = 3
    conv_filters: int = 1536
    n_mels: int = 80
    max_mel_len: int = 900
    dropout: float = 0.1
    dropatt: float = 0.1
    predictor_filters: int = 256
    predictor_kernel: int = 3
    predictor_layers: int = 2
    predictor_dropout: float = 0.1
    pitch_kernel: int = 3
    energy: bool = True  # reference energy_conditioning default
    energy_kernel: int = 3


def length_regulate(x, durations, max_len):
    """Expand (B, T, D) by integer durations -> (B, max_len, D) + mask.

    Output position j takes the token whose cumulative-duration interval
    contains j (searchsorted) — the same mapping as the reference's
    interval-matmul ``regulate_len`` (model.py:44-66); positions past the
    total duration are masked.
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


def average_over_durations(values, durations):
    """Per-symbol mean of frame-level ``values`` (B, L) over each symbol's
    duration span — the reference's ``average_pitch`` (model.py:69-87),
    counting only nonzero frames. Returns (B, T)."""
    ends = jnp.cumsum(durations, axis=1)
    starts = jnp.concatenate([jnp.zeros_like(ends[:, :1]), ends[:, :-1]], 1)
    csum = jnp.concatenate(
        [jnp.zeros_like(values[:, :1]), jnp.cumsum(values, axis=1)], 1)
    cnz = jnp.concatenate(
        [jnp.zeros_like(values[:, :1]),
         jnp.cumsum((values != 0.0).astype(values.dtype), axis=1)], 1)
    L = values.shape[1]
    sums = (jnp.take_along_axis(csum, jnp.clip(ends, 0, L), 1)
            - jnp.take_along_axis(csum, jnp.clip(starts, 0, L), 1))
    nelems = (jnp.take_along_axis(cnz, jnp.clip(ends, 0, L), 1)
              - jnp.take_along_axis(cnz, jnp.clip(starts, 0, L), 1))
    return jnp.where(nelems == 0.0, 0.0, sums / jnp.maximum(nelems, 1.0))


def _positional(max_len, d_model):
    """Concatenated [sin | cos] layout (reference PositionalEmbedding,
    transformer.py:20-36) — NOT interleaved."""
    inv = 1.0 / (10000 ** (np.arange(0.0, d_model, 2.0) / d_model))
    ang = np.arange(max_len)[:, None] * inv[None, :]
    return np.concatenate([np.sin(ang), np.cos(ang)], axis=1).astype(np.float32)


class FFTBlock(nn.Module):
    """TransformerLayer (transformer.py:152-166): post-LN attention with a
    re-mask, then PositionwiseConvFF with a re-mask."""

    cfg: FastPitchConfig
    dtype: Any

    @nn.compact
    def __call__(self, x, mask, deterministic, dropout_seed=None):
        cfg = self.cfg
        b, s, _ = x.shape
        nh, dh = cfg.n_heads, cfg.head_dim
        qkv = nn.Dense(3 * nh * dh, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        heads = lambda t: t.reshape(b, s, nh, dh)
        if not deterministic and cfg.dropatt > 0.0 and dropout_seed is not None:
            ctx = flash_attention(heads(q), heads(k), heads(v),
                                  key_mask=mask, layout="bshd",
                                  dropout_rate=cfg.dropatt,
                                  dropout_seed=dropout_seed)
        else:
            ctx = flash_attention(heads(q), heads(k), heads(v),
                                  key_mask=mask, layout="bshd")
        ctx = ctx.reshape(b, s, nh * dh)
        ctx = nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype,
                       name="o_net")(ctx)
        ctx = RegenDropout(cfg.dropout)(ctx, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(x + ctx)
        x = x * mask[:, :, None].astype(x.dtype)
        y = nn.Conv(cfg.conv_filters, (cfg.conv_kernel,), dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(y)
        y = nn.Conv(cfg.d_model, (cfg.conv_kernel,), dtype=self.dtype,
                    name="conv2")(y)
        y = RegenDropout(cfg.dropout)(y, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")(x + y)
        return x * mask[:, :, None].astype(x.dtype)


class Predictor(nn.Module):
    """TemporalPredictor (model.py:90-109): ConvReLUNorm stack + linear."""

    cfg: FastPitchConfig
    dtype: Any

    @nn.compact
    def __call__(self, x, mask, deterministic):
        cfg = self.cfg
        x = x * mask[:, :, None].astype(x.dtype)
        for i in range(cfg.predictor_layers):
            x = nn.Conv(cfg.predictor_filters, (cfg.predictor_kernel,),
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.relu(x)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"ln{i}")(x)
            x = RegenDropout(cfg.predictor_dropout)(
                x, deterministic=deterministic)
        out = nn.Dense(1, dtype=jnp.float32, name="fc")(
            x.astype(jnp.float32))[..., 0]
        return out * mask.astype(jnp.float32)


class FastPitch(nn.Module):
    cfg: FastPitchConfig = FastPitchConfig()
    dtype: Any = jnp.bfloat16

    def setup(self):
        cfg = self.cfg
        self.embed = nn.Embed(cfg.n_symbols, cfg.d_model,
                              embedding_init=nn.initializers.normal(0.02),
                              dtype=self.dtype)
        self.pos = jnp.asarray(
            _positional(max(cfg.max_mel_len, 2048), cfg.d_model))
        self.enc = [FFTBlock(cfg, self.dtype, name=f"enc_{i}")
                    for i in range(cfg.encoder_layers)]
        self.dec = [FFTBlock(cfg, self.dtype, name=f"dec_{i}")
                    for i in range(cfg.decoder_layers)]
        self.duration_predictor = Predictor(cfg, self.dtype)
        self.pitch_predictor = Predictor(cfg, self.dtype)
        self.pitch_embed = nn.Conv(cfg.d_model, (cfg.pitch_kernel,),
                                   dtype=self.dtype)
        if cfg.energy:
            self.energy_predictor = Predictor(cfg, self.dtype)
            self.energy_embed = nn.Conv(cfg.d_model, (cfg.energy_kernel,),
                                        dtype=self.dtype)
        self.mel_proj = nn.Dense(cfg.n_mels, dtype=jnp.float32)

    def _seed(self, deterministic):
        if deterministic:
            return None
        return jax.random.randint(self.make_rng("dropout"), (),
                                  -2**31, 2**31 - 1, dtype=jnp.int32)

    def _fft(self, blocks, x, mask, deterministic):
        x = x + (self.pos[None, : x.shape[1]].astype(x.dtype)
                 * mask[:, :, None].astype(x.dtype))
        for blk in blocks:
            x = blk(x, mask, deterministic, self._seed(deterministic))
        return x

    def _encode(self, text, text_mask, deterministic):
        return self._fft(self.enc, self.embed(text), text_mask, deterministic)

    def __call__(self, text, durations, pitch, energy=None, max_mel_len=None,
                 deterministic: bool = True):
        """Training forward with ground-truth durations / per-symbol pitch
        (and per-symbol energy when conditioning is on). Returns (mel,
        log_dur_pred, pitch_pred, energy_pred | None, mel_mask)."""
        cfg = self.cfg
        max_mel_len = max_mel_len or cfg.max_mel_len
        text_mask = (text != 0).astype(jnp.int32)
        x = self._encode(text, text_mask, deterministic)
        log_dur_pred = self.duration_predictor(x, text_mask, deterministic)
        pitch_pred = self.pitch_predictor(x, text_mask, deterministic)
        x = x + self.pitch_embed(pitch[:, :, None].astype(self.dtype))
        energy_pred = None
        if cfg.energy:
            # reference predicts energy from the PITCH-CONDITIONED encoder
            # output (model.py:270-281)
            energy_pred = self.energy_predictor(x, text_mask, deterministic)
            e = energy_pred if energy is None else energy
            x = x + self.energy_embed(e[:, :, None].astype(self.dtype))
        y, mel_mask = length_regulate(x, durations, max_mel_len)
        y = self._fft(self.dec, y, mel_mask.astype(jnp.int32), deterministic)
        mel = self.mel_proj(y.astype(jnp.float32))
        return mel, log_dur_pred, pitch_pred, energy_pred, mel_mask

    def infer(self, text, pace: float = 1.0, max_mel_len=None,
              max_duration: float = 75.0):
        cfg = self.cfg
        max_mel_len = max_mel_len or cfg.max_mel_len
        text_mask = (text != 0).astype(jnp.int32)
        x = self._encode(text, text_mask, True)
        log_dur = self.duration_predictor(x, text_mask, True)
        dur = jnp.clip(jnp.exp(log_dur) - 1.0, 0.0, max_duration)
        dur = jnp.round(dur / pace).astype(jnp.int32) * text_mask
        pitch = self.pitch_predictor(x, text_mask, True)
        x = x + self.pitch_embed(pitch[:, :, None].astype(self.dtype))
        if cfg.energy:
            energy = self.energy_predictor(x, text_mask, True)
            x = x + self.energy_embed(energy[:, :, None].astype(self.dtype))
        y, mel_mask = length_regulate(x, dur, max_mel_len)
        y = self._fft(self.dec, y, mel_mask.astype(jnp.int32), True)
        mel = self.mel_proj(y.astype(jnp.float32))
        # total predicted duration can exceed the padded buffer; the mel past
        # max_mel_len does not exist, so the reported length must saturate
        mel_len = jnp.minimum(jnp.sum(dur, axis=1), max_mel_len)
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
        cfg = self.cfg
        # per-symbol energy target from the mel (reference extracts frame
        # energy as the mel-frame L2 norm averaged over durations)
        energy_tgt = None
        if cfg.energy:
            frame_energy = jnp.linalg.norm(
                batch["mel"].astype(jnp.float32), axis=-1)
            energy_tgt = average_over_durations(frame_energy,
                                                batch["durations"])
        mel, log_dur, pitch_pred, energy_pred, mel_mask = self.model.apply(
            {"params": params},
            batch["text"], batch["durations"], batch["pitch"],
            energy=energy_tgt,
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
        metrics = {"mel_loss": mel_loss, "dur_loss": dur_loss}
        if cfg.energy:
            energy_loss = jnp.sum(
                (energy_pred - energy_tgt) ** 2 * tmask) / tdenom
            loss = loss + 0.1 * energy_loss
            metrics["energy_loss"] = energy_loss
        return loss, (model_state, metrics)
