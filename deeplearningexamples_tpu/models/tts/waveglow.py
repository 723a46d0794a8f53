"""WaveGlow — normalizing-flow vocoder.

Re-design of the reference WaveGlow
(``PyTorch/SpeechSynthesis/Tacotron2/waveglow/model.py:160-381``):
12 flows over audio grouped into 8 channels; each flow = invertible 1x1
channel mix (:44-85, orthogonal init via QR) + WN affine coupling (:88-157)
with gated-tanh dilated convs (``fused_add_tanh_sigmoid_multiply`` :35-41 —
on TPU this fusion is XLA's job); early output of 2 channels every 4 flows;
mel conditioning upsampled by a transposed conv. Training maximizes exact
likelihood: z^2/(2 sigma^2) - sum log s - sum log|det W|
(``waveglow/loss_function.py:30-48``); ``infer`` runs the flows inverted
from Gaussian noise.

Layout is NWC (time on sublanes, channels on lanes) throughout.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["WaveGlowConfig", "WaveGlow", "waveglow_loss"]


@dataclass(frozen=True)
class WaveGlowConfig:
    n_mel_channels: int = 80
    n_flows: int = 12
    n_group: int = 8
    n_early_every: int = 4
    n_early_size: int = 2
    wn_n_layers: int = 8
    wn_n_channels: int = 256
    wn_kernel_size: int = 3
    sampling_rate: int = 22050
    segment_length: int = 8000
    hop_length: int = 256


def _orthogonal_init(key, shape, dtype=jnp.float32):
    """QR-based orthogonal with det forced positive (reference :49-55)."""
    w = jax.random.normal(key, shape, dtype)
    q, _ = jnp.linalg.qr(w)
    det = jnp.linalg.det(q)
    q = q.at[:, 0].multiply(jnp.sign(det))
    return q


class Invertible1x1Conv(nn.Module):
    channels: int
    dtype: Any

    @nn.compact
    def __call__(self, z, reverse: bool = False):
        w = self.param("weight", _orthogonal_init, (self.channels, self.channels))
        if reverse:
            w_inv = jnp.linalg.inv(w.astype(jnp.float64)).astype(jnp.float32)
            return z @ w_inv.astype(z.dtype), None
        log_det = jnp.linalg.slogdet(w.astype(jnp.float32))[1]
        return z @ w.astype(z.dtype), log_det


class WN(nn.Module):
    """Gated dilated-conv stack producing (log_s, b) for the coupling."""

    cfg: WaveGlowConfig
    n_half: int
    dtype: Any

    @nn.compact
    def __call__(self, audio_half, cond):
        cfg = self.cfg
        c = cfg.wn_n_channels
        x = nn.Conv(c, (1,), dtype=self.dtype, name="start")(audio_half)
        # all layers' conditioning projected at once (reference cond_layer)
        cond_all = nn.Conv(2 * c * cfg.wn_n_layers, (1,), dtype=self.dtype,
                           name="cond_layer")(cond)
        output = jnp.zeros_like(x)
        for i in range(cfg.wn_n_layers):
            dil = 2**i
            in_act = nn.Conv(2 * c, (cfg.wn_kernel_size,),
                             kernel_dilation=(dil,), dtype=self.dtype,
                             name=f"in_layer{i}")(x)
            in_act = in_act + cond_all[..., 2 * c * i : 2 * c * (i + 1)]
            t_act = jnp.tanh(in_act[..., :c])
            s_act = jax.nn.sigmoid(in_act[..., c:])
            acts = t_act * s_act
            if i < cfg.wn_n_layers - 1:
                res_skip = nn.Conv(2 * c, (1,), dtype=self.dtype,
                                   name=f"res_skip{i}")(acts)
                x = x + res_skip[..., :c]
                output = output + res_skip[..., c:]
            else:
                output = output + nn.Conv(c, (1,), dtype=self.dtype,
                                          name=f"res_skip{i}")(acts)
        # zero-init end conv so each flow starts as identity (reference :151-155)
        end = nn.Conv(2 * self.n_half, (1,), dtype=jnp.float32,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros, name="end")(
            output.astype(jnp.float32)
        )
        log_s, b = end[..., : self.n_half], end[..., self.n_half :]
        return log_s, b


class WaveGlow(nn.Module):
    cfg: WaveGlowConfig = WaveGlowConfig()
    dtype: Any = jnp.bfloat16

    def setup(self):
        cfg = self.cfg
        sizes = self._flow_channels()
        # VALID: out = (T-1)*stride + kernel, exactly torch ConvTranspose1d
        # with padding=0 (reference :172-176); SAME would crop the tail taps
        self.upsample = nn.ConvTranspose(
            cfg.n_mel_channels, (1024,), strides=(cfg.hop_length,),
            padding="VALID", dtype=self.dtype
        )
        self.conv1x1 = [
            Invertible1x1Conv(sizes[k], self.dtype, name=f"conv1x1_{k}")
            for k in range(cfg.n_flows)
        ]
        self.wn = [
            WN(cfg, sizes[k] // 2, self.dtype, name=f"wn_{k}")
            for k in range(cfg.n_flows)
        ]

    def _flow_channels(self):
        """Audio channels entering each flow + early-output bookkeeping."""
        cfg = self.cfg
        n_half_sizes, remaining = [], cfg.n_group
        for k in range(cfg.n_flows):
            if k % cfg.n_early_every == 0 and k > 0:
                remaining -= cfg.n_early_size
            n_half_sizes.append(remaining)
        return n_half_sizes

    def _upsample_cond(self, mel, t_groups):
        """mel (B, T_mel, n_mel) -> grouped conditioning (B, t_groups, n_mel*n_group)."""
        cfg = self.cfg
        up = self.upsample(mel)
        need = t_groups * cfg.n_group
        up = up[:, :need, :]
        b = up.shape[0]
        return up.reshape(b, t_groups, cfg.n_group * cfg.n_mel_channels)

    def __call__(self, audio, mel):
        """Training forward. audio (B, S), mel (B, T_mel, n_mel).
        Returns (z (B, T, n_group), total_log_s, total_log_det)."""
        cfg = self.cfg
        b, s = audio.shape
        t = s // cfg.n_group
        z = audio[:, : t * cfg.n_group].reshape(b, t, cfg.n_group).astype(self.dtype)
        cond = self._upsample_cond(mel, t)

        sizes = self._flow_channels()
        out_z, total_log_s, total_log_det = [], 0.0, 0.0
        for k in range(cfg.n_flows):
            if k % cfg.n_early_every == 0 and k > 0:
                out_z.append(z[..., : cfg.n_early_size].astype(jnp.float32))
                z = z[..., cfg.n_early_size :]
            ch = sizes[k]
            z, log_det = self.conv1x1[k](z)
            total_log_det = total_log_det + log_det * b * t
            n_half = ch // 2
            z0, z1 = z[..., :n_half], z[..., n_half:]
            log_s, bias = self.wn[k](z0, cond)
            z1 = (z1.astype(jnp.float32) * jnp.exp(log_s) + bias).astype(self.dtype)
            total_log_s = total_log_s + jnp.sum(log_s)
            z = jnp.concatenate([z0, z1], axis=-1)
        out_z.append(z.astype(jnp.float32))
        z_all = jnp.concatenate(out_z, axis=-1)
        return z_all, total_log_s, total_log_det

    def infer(self, mel, sigma: float = 1.0, rng=None):
        """Inverse flow from noise (reference ``infer`` :234-274)."""
        cfg = self.cfg
        b, t_mel, _ = mel.shape
        t = t_mel * cfg.hop_length // cfg.n_group
        cond = self._upsample_cond(mel, t)
        rng = rng if rng is not None else jax.random.key(0)

        sizes = self._flow_channels()
        # channels of z at the *end* of forward = sizes[-1]; early outputs fill the rest
        keys = jax.random.split(rng, cfg.n_flows + 1)
        z = sigma * jax.random.normal(keys[0], (b, t, sizes[-1]), jnp.float32)
        z = z.astype(self.dtype)
        for k in reversed(range(cfg.n_flows)):
            ch = sizes[k]
            n_half = ch // 2
            z0, z1 = z[..., :n_half], z[..., n_half:]
            log_s, bias = self.wn[k](z0, cond)
            z1 = ((z1.astype(jnp.float32) - bias) * jnp.exp(-log_s)).astype(self.dtype)
            z = jnp.concatenate([z0, z1], axis=-1)
            z, _ = self.conv1x1[k](z, reverse=True)
            if k % cfg.n_early_every == 0 and k > 0:
                noise = sigma * jax.random.normal(
                    keys[k], (b, t, cfg.n_early_size), jnp.float32
                ).astype(self.dtype)
                z = jnp.concatenate([noise, z], axis=-1)
        return z.reshape(b, t * cfg.n_group).astype(jnp.float32)


def waveglow_loss(z, log_s_total, log_det_total, sigma: float = 1.0):
    """(reference ``waveglow/loss_function.py:30-48``)."""
    n = z.size
    return (
        jnp.sum(z * z) / (2 * sigma * sigma) - log_s_total - log_det_total
    ) / n
