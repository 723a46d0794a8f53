"""Temporal Fusion Transformer — multi-horizon forecasting.

Breadth recipe (reference ``PyTorch/Forecasting/TFT/modeling.py``): gated
residual networks (GRN), variable selection networks over observed/known
inputs, LSTM encoder/decoder with gated skip, interpretable multi-head
attention over the temporal axis, and quantile (pinball) loss over the
forecast horizon.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from ..ops.dropout import RegenDropout

__all__ = ["TFTConfig", "TFT", "TFTTask", "quantile_loss"]


@dataclass(frozen=True)
class TFTConfig:
    n_observed: int = 4  # past-only input features
    n_known: int = 2  # features known into the future
    hidden: int = 64
    n_heads: int = 4
    encoder_len: int = 48
    horizon: int = 12
    dropout: float = 0.1
    quantiles: tuple[float, ...] = (0.1, 0.5, 0.9)


class GRN(nn.Module):
    """Gated residual network (reference GRN: dense-elu-dense + GLU gate +
    layernorm residual)."""

    hidden: int
    out: int | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        out = self.out or self.hidden
        residual = x
        if residual.shape[-1] != out:
            residual = nn.Dense(out, dtype=self.dtype, name="skip")(residual)
        y = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        y = nn.elu(y)
        y = nn.Dense(out, dtype=self.dtype, name="fc2")(y)
        y = RegenDropout(0.1)(y, deterministic=deterministic)
        gate = nn.Dense(2 * out, dtype=self.dtype, name="gate")(y)
        a, b = jnp.split(gate, 2, axis=-1)
        y = a * jax.nn.sigmoid(b)
        return nn.LayerNorm(dtype=self.dtype)(residual + y)


class VariableSelection(nn.Module):
    """Softmax weights over per-variable GRN embeddings."""

    n_vars: int
    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        """x (..., n_vars) scalars -> (..., hidden), weights (..., n_vars)."""
        embedded = jnp.stack(
            [
                GRN(self.hidden, dtype=self.dtype, name=f"var_{i}")(
                    x[..., i : i + 1], deterministic
                )
                for i in range(self.n_vars)
            ],
            axis=-2,
        )  # (..., n_vars, hidden)
        flat = x  # selection operates on the raw concatenated vars
        w = GRN(self.hidden, out=self.n_vars, dtype=self.dtype,
                name="weight_grn")(flat, deterministic)
        w = jax.nn.softmax(w, axis=-1)
        return jnp.einsum("...vh,...v->...h", embedded, w), w


class TFT(nn.Module):
    cfg: TFTConfig = TFTConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, observed, known, deterministic: bool = True):
        """observed (B, enc_len, n_observed); known (B, enc_len+horizon,
        n_known). Returns quantile forecasts (B, horizon, n_quantiles)."""
        cfg = self.cfg
        b = observed.shape[0]
        h = cfg.hidden

        past_in = jnp.concatenate(
            [observed, known[:, : cfg.encoder_len]], axis=-1
        )
        past, _w_past = VariableSelection(
            cfg.n_observed + cfg.n_known, h, self.dtype, name="vsn_past"
        )(past_in, deterministic)
        future, _w_fut = VariableSelection(
            cfg.n_known, h, self.dtype, name="vsn_future"
        )(known[:, cfg.encoder_len :], deterministic)

        enc = nn.RNN(nn.OptimizedLSTMCell(h, dtype=self.dtype), name="enc_lstm")(past)
        dec = nn.RNN(nn.OptimizedLSTMCell(h, dtype=self.dtype), name="dec_lstm")(future)
        seq = jnp.concatenate([enc, dec], axis=1)
        inp = jnp.concatenate([past, future], axis=1)
        # gated skip around the LSTMs
        gate = nn.Dense(2 * h, dtype=self.dtype, name="lstm_gate")(seq)
        a, g = jnp.split(gate, 2, axis=-1)
        seq = nn.LayerNorm(dtype=self.dtype)(inp + a * jax.nn.sigmoid(g))

        enriched = GRN(h, dtype=self.dtype, name="enrich")(seq, deterministic)

        # interpretable MHA: causal over the combined sequence
        t = enriched.shape[1]
        attn = nn.SelfAttention(
            num_heads=cfg.n_heads, dtype=self.dtype, name="attn",
            deterministic=True,
        )(enriched, mask=nn.make_causal_mask(jnp.ones((b, t))))
        attn = nn.LayerNorm(dtype=self.dtype)(enriched + attn)
        out = GRN(h, dtype=self.dtype, name="final")(attn, deterministic)
        out = nn.LayerNorm(dtype=self.dtype)(out + seq)

        horizon_out = out[:, cfg.encoder_len :]
        return nn.Dense(len(cfg.quantiles), dtype=jnp.float32,
                        name="quantile_proj")(horizon_out.astype(jnp.float32))


def quantile_loss(pred, target, quantiles):
    """Pinball loss averaged over horizon/quantiles (reference ``criterions.py``)."""
    q = jnp.asarray(quantiles)[None, None, :]
    err = target[..., None] - pred
    return jnp.mean(jnp.maximum(q * err, (q - 1.0) * err))


@dataclass
class TFTTask:
    cfg: TFTConfig = TFTConfig()
    dtype: Any = jnp.float32

    def __post_init__(self):
        self.model = TFT(self.cfg, self.dtype)

    def init(self, rng, batch=2):
        cfg = self.cfg
        init_rng, drop = jax.random.split(rng)
        return self.model.init(
            {"params": init_rng, "dropout": drop},
            jnp.zeros((batch, cfg.encoder_len, cfg.n_observed)),
            jnp.zeros((batch, cfg.encoder_len + cfg.horizon, cfg.n_known)),
        )["params"], {}

    def loss_fn(self, params, model_state, batch, rng):
        pred = self.model.apply(
            {"params": params}, batch["observed"], batch["known"],
            deterministic=False, rngs={"dropout": rng},
        )
        loss = quantile_loss(pred, batch["target"], self.cfg.quantiles)
        return loss, (model_state, {})
