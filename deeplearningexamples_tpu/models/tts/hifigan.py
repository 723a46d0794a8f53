"""HiFi-GAN vocoder (generator + MPD/MSD discriminators, GAN training).

Breadth recipe (reference ``PyTorch/SpeechSynthesis/HiFiGAN/models.py``):
- Generator: transposed-conv upsampling [8,8,2,2] with multi-receptive-field
  fusion (ResBlocks k=3/7/11, dilations 1/3/5), leaky-relu 0.1, tanh out
- MultiPeriodDiscriminator (periods 2,3,5,7,11; 2D convs over (T/p, p)) and
  MultiScaleDiscriminator (3 average-pooled scales)
- LSGAN adversarial loss + feature matching (x2) + mel-spectrogram L1 (x45)

GAN training needs two optimizers; ``HiFiGanTask`` exposes ``g_step`` /
``d_step`` jitted functions instead of the single-loss harness contract.
Weight norm is replaced by plain convs + LR schedule (weight-norm's
benefit is largely optimizer-conditioning; XLA has no native weight-norm
and the reference removes it for inference anyway).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["HiFiGanConfig", "HiFiGanGenerator", "HiFiGanTask"]


@dataclass(frozen=True)
class HiFiGanConfig:
    n_mels: int = 80
    upsample_rates: tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernels: tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernels: tuple[int, ...] = (3, 7, 11)
    resblock_dilations: tuple[tuple[int, ...], ...] = ((1, 3, 5),) * 3
    periods: tuple[int, ...] = (2, 3, 5, 7, 11)
    segment_length: int = 8192
    hop_length: int = 256
    lrelu: float = 0.1
    # discriminator widths (reference models.py hardcodes these; configurable
    # here so tests/dryruns can exercise the full GAN structure at tiny cost)
    mpd_channels: tuple[int, ...] = (32, 128, 512, 1024)
    msd_channels: tuple[int, ...] = (128, 128, 256, 512, 1024, 1024, 1024)
    msd_scales: int = 3


class ResBlock(nn.Module):
    ch: int
    kernel: int
    dilations: tuple[int, ...]
    lrelu: float
    dtype: Any

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            y = nn.leaky_relu(x, self.lrelu)
            y = nn.Conv(self.ch, (self.kernel,), kernel_dilation=(d,),
                        dtype=self.dtype, name=f"c1_{i}")(y)
            y = nn.leaky_relu(y, self.lrelu)
            y = nn.Conv(self.ch, (self.kernel,), dtype=self.dtype,
                        name=f"c2_{i}")(y)
            x = x + y
        return x


class HiFiGanGenerator(nn.Module):
    cfg: HiFiGanConfig = HiFiGanConfig()
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, mel):
        """mel (B, T, n_mels) -> audio (B, T * hop)."""
        cfg = self.cfg
        x = nn.Conv(cfg.upsample_initial_channel, (7,), dtype=self.dtype,
                    name="pre")(mel.astype(self.dtype))
        for i, (r, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, cfg.lrelu)
            x = nn.ConvTranspose(ch, (k,), strides=(r,), padding="SAME",
                                 dtype=self.dtype, name=f"up_{i}")(x)
            acc = None
            for j, (rk, rd) in enumerate(
                zip(cfg.resblock_kernels, cfg.resblock_dilations)
            ):
                y = ResBlock(ch, rk, rd, cfg.lrelu, self.dtype,
                             name=f"mrf_{i}_{j}")(x)
                acc = y if acc is None else acc + y
            x = acc / len(cfg.resblock_kernels)
        # the reference's final activation is F.leaky_relu(x) with the torch
        # DEFAULT 0.01 slope (models.py:222), unlike the 0.1 used elsewhere
        x = nn.leaky_relu(x, 0.01)
        x = nn.Conv(1, (7,), dtype=jnp.float32, name="post")(x.astype(jnp.float32))
        return jnp.tanh(x)[..., 0]


class PeriodDiscriminator(nn.Module):
    period: int
    lrelu: float
    dtype: Any
    channels: tuple[int, ...] = (32, 128, 512, 1024)

    @nn.compact
    def __call__(self, audio):
        b, t = audio.shape
        p = self.period
        pad = (-t) % p
        x = jnp.pad(audio, ((0, 0), (0, pad)), mode="reflect")
        x = x.reshape(b, -1, p, 1)  # (B, T/p, p, 1)
        feats = []
        for i, ch in enumerate(self.channels):
            x = nn.Conv(ch, (5, 1), strides=(3, 1), dtype=self.dtype,
                        name=f"c{i}")(x)
            x = nn.leaky_relu(x, self.lrelu)
            feats.append(x)
        x = nn.Conv(self.channels[-1], (5, 1), dtype=self.dtype,
                    name=f"c{len(self.channels)}")(x)
        x = nn.leaky_relu(x, self.lrelu)
        feats.append(x)
        score = nn.Conv(1, (3, 1), dtype=jnp.float32, name="out")(
            x.astype(jnp.float32)
        )
        return score.reshape(b, -1), feats


class ScaleDiscriminator(nn.Module):
    lrelu: float
    dtype: Any
    channels: tuple[int, ...] = (128, 128, 256, 512, 1024, 1024, 1024)

    @nn.compact
    def __call__(self, audio):
        x = audio[..., None]  # (B, T, 1)
        feats = []
        chs = self.channels
        strides = (1, 2, 2, 4, 4, 1, 1)[: len(chs)]
        groups = (1, 4, 16, 16, 16, 16, 1)[: len(chs)]
        kernels = (15, 41, 41, 41, 41, 41, 5)[: len(chs)]
        for i, (c, s, g, k) in enumerate(zip(chs, strides, groups, kernels)):
            g = min(g, x.shape[-1])
            x = nn.Conv(c, (k,), strides=(s,), feature_group_count=g,
                        dtype=self.dtype, name=f"c{i}")(x)
            x = nn.leaky_relu(x, self.lrelu)
            feats.append(x)
        score = nn.Conv(1, (3,), dtype=jnp.float32, name="out")(
            x.astype(jnp.float32)
        )
        return score.reshape(audio.shape[0], -1), feats


class HiFiGanDiscriminators(nn.Module):
    cfg: HiFiGanConfig = HiFiGanConfig()
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, audio):
        scores, feats = [], []
        for p in self.cfg.periods:
            s, f = PeriodDiscriminator(p, self.cfg.lrelu, self.dtype,
                                       self.cfg.mpd_channels,
                                       name=f"mpd_{p}")(audio)
            scores.append(s)
            feats.append(f)
        x = audio
        n_scales = self.cfg.msd_scales
        for i in range(n_scales):
            s, f = ScaleDiscriminator(self.cfg.lrelu, self.dtype,
                                      self.cfg.msd_channels,
                                      name=f"msd_{i}")(x)
            scores.append(s)
            feats.append(f)
            if i < n_scales - 1:
                x = nn.avg_pool(x[..., None], (4,), strides=(2,),
                                padding="SAME")[..., 0]
        return scores, feats


@dataclass
class HiFiGanTask:
    """GAN training: alternating jitted generator/discriminator steps."""

    cfg: HiFiGanConfig = HiFiGanConfig()
    dtype: Any = jnp.bfloat16
    mel_loss_weight: float = 45.0
    fm_loss_weight: float = 2.0

    def __post_init__(self):
        self.gen = HiFiGanGenerator(self.cfg, self.dtype)
        self.disc = HiFiGanDiscriminators(self.cfg, self.dtype)
        from .audio import MelConfig, mel_filterbank

        mc = MelConfig(n_mels=self.cfg.n_mels, hop_length=self.cfg.hop_length)
        self._mel_cfg = mc
        self._fb = jnp.asarray(mel_filterbank(mc).T)  # (bins, mels)

    def init(self, rng):
        cfg = self.cfg
        t_mel = cfg.segment_length // cfg.hop_length
        r1, r2 = jax.random.split(rng)
        g = self.gen.init(r1, jnp.zeros((1, t_mel, cfg.n_mels)))["params"]
        d = self.disc.init(r2, jnp.zeros((1, cfg.segment_length)))["params"]
        return g, d

    def _mel(self, audio):
        """Differentiable log-mel for the reconstruction loss (jnp STFT)."""
        mc = self._mel_cfg
        pad = mc.n_fft // 2
        x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
        win = jnp.asarray(np.hanning(mc.win_length + 1)[:-1], jnp.float32)
        n_frames = 1 + (x.shape[1] - mc.n_fft) // mc.hop_length
        idx = (np.arange(mc.n_fft)[None, :]
               + mc.hop_length * np.arange(n_frames)[:, None])
        frames = x[:, idx] * win[None, None, :]
        spec = jnp.fft.rfft(frames, axis=-1)
        mag = jnp.abs(spec)
        mel = mag @ self._fb
        return jnp.log(jnp.clip(mel, 1e-5))

    def make_steps(self, g_tx, d_tx):
        gen, disc = self.gen, self.disc

        def d_loss_fn(d_params, g_params, batch):
            fake = gen.apply({"params": g_params}, batch["mel"])
            real_scores, _ = disc.apply({"params": d_params}, batch["audio"])
            fake_scores, _ = disc.apply(
                {"params": d_params}, jax.lax.stop_gradient(fake)
            )
            loss = 0.0
            for r, f in zip(real_scores, fake_scores):
                loss += jnp.mean((r - 1.0) ** 2) + jnp.mean(f**2)
            return loss

        def g_loss_fn(g_params, d_params, batch):
            fake = gen.apply({"params": g_params}, batch["mel"])
            fake_scores, fake_feats = disc.apply({"params": d_params}, fake)
            _, real_feats = disc.apply({"params": d_params}, batch["audio"])
            adv = sum(jnp.mean((f - 1.0) ** 2) for f in fake_scores)
            fm = sum(
                jnp.mean(jnp.abs(rf.astype(jnp.float32) - ff.astype(jnp.float32)))
                for rfs, ffs in zip(real_feats, fake_feats)
                for rf, ff in zip(rfs, ffs)
            )
            mel_l1 = jnp.mean(jnp.abs(self._mel(fake) - self._mel(batch["audio"])))
            loss = adv + self.fm_loss_weight * fm + self.mel_loss_weight * mel_l1
            return loss, {"adv": adv, "fm": fm, "mel_l1": mel_l1}

        @jax.jit
        def d_step(d_params, d_opt, g_params, batch):
            loss, grads = jax.value_and_grad(d_loss_fn)(d_params, g_params, batch)
            updates, d_opt = d_tx.update(grads, d_opt, d_params)
            return optax.apply_updates(d_params, updates), d_opt, loss

        @jax.jit
        def g_step(g_params, g_opt, d_params, batch):
            (loss, aux), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
                g_params, d_params, batch
            )
            updates, g_opt = g_tx.update(grads, g_opt, g_params)
            return optax.apply_updates(g_params, updates), g_opt, loss, aux

        return g_step, d_step
