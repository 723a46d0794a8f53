"""Temporal Fusion Transformer — multi-horizon quantile forecasting.

Architecture matches the reference exactly
(``PyTorch/Forecasting/TFT/modeling.py``):

- GRN (:48-77): lin_a -> (+ context, broadcast over time) -> ELU -> lin_i ->
  dropout -> GLU, residual through ``out_proj`` when the size changes, and
  LayerNorm that degenerates to identity when ``out == 1``;
- TFTEmbedding (:93-230): per-variable categorical ``nn.Embed`` plus
  continuous "embedding vectors" (scalar * vector + bias), seven input
  streams (static/known/observed x cat/cont + past targets);
- VariableSelectionNetwork (:286-303): joint GRN over the flattened
  per-variable embeddings -> softmax variable weights, per-variable GRNs,
  weighted combination;
- StaticCovariateEncoder (:305-321): static VSN + four context GRNs
  producing (cs, ce, ch, cc) = selection/enrichment/LSTM-h/LSTM-c contexts;
- InterpretableMultiHeadAttention (:324-360): multi-head scores over a
  SINGLE shared value head, head-averaged, causal over example_length;
- TFTBack (:362-432): history/future VSNs -> history LSTM (initial state
  from static contexts) -> future LSTM (chained state) -> gated skip ->
  static enrichment -> attention (+gate+ln) -> position-wise GRN -> final
  gated skip -> per-quantile projection on the horizon steps.

Numerics parity with the reference torch module is asserted by
``tests/test_reference_parity.py::test_tft_forward_parity`` via
``utils/torch_import.convert_tft``.
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
    # loader-facing sizes (data/timeseries.py contract): ``observed`` block
    # includes the target column at ``target_pos``
    n_observed: int = 4
    n_known: int = 2
    target_pos: int = 0
    # static series descriptors (the synthetic/electricity panel has one id)
    static_categorical_sizes: tuple[int, ...] = (1,)
    hidden: int = 64
    n_heads: int = 4
    encoder_len: int = 48
    horizon: int = 12
    dropout: float = 0.1
    attn_dropout: float = 0.0
    quantiles: tuple[float, ...] = (0.1, 0.5, 0.9)

    @property
    def example_length(self) -> int:
        return self.encoder_len + self.horizon

    @property
    def n_observed_cont(self) -> int:  # observed stream minus the target
        return self.n_observed - 1

    @property
    def num_static_vars(self) -> int:
        return len(self.static_categorical_sizes)

    @property
    def num_future_vars(self) -> int:
        return self.n_known

    @property
    def num_historic_vars(self) -> int:
        return self.num_future_vars + self.n_observed_cont + 1


class GLU(nn.Module):
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(2 * self.out, dtype=self.dtype, name="lin")(x)
        a, b = jnp.split(x, 2, axis=-1)
        return a * jax.nn.sigmoid(b)


class GRN(nn.Module):
    """Gated residual network (reference ``modeling.py:48-77``)."""

    hidden: int
    out: int | None = None
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, a, c=None, deterministic=True):
        out = self.out or self.hidden
        x = nn.Dense(self.hidden, dtype=self.dtype, name="lin_a")(a)
        if c is not None:
            # context is (B, H); broadcast over the time axis like the
            # reference's unsqueeze(1)
            x = x + nn.Dense(self.hidden, use_bias=False, dtype=self.dtype,
                             name="lin_c")(c)[:, None, :]
        x = nn.elu(x)
        x = nn.Dense(self.hidden, dtype=self.dtype, name="lin_i")(x)
        x = RegenDropout(self.dropout)(x, deterministic=deterministic)
        x = GLU(out, self.dtype, name="glu")(x)
        y = a if self.out is None else nn.Dense(
            out, dtype=self.dtype, name="out_proj")(a)
        x = x + y
        if out == 1:  # MaybeLayerNorm: identity for scalar outputs
            return x
        return nn.LayerNorm(epsilon=1e-3, dtype=self.dtype, name="ln")(x)


class TFTEmbedding(nn.Module):
    """Continuous features embed as scalar * vector + bias; categoricals via
    per-variable tables (reference ``modeling.py:93-230``)."""

    cfg: TFTConfig
    dtype: Any = jnp.float32

    def _cont(self, cont, name, size):
        vec = self.param(f"{name}_vectors", nn.initializers.xavier_normal(),
                         (size, self.cfg.hidden))
        bias = self.param(f"{name}_bias", nn.initializers.zeros,
                          (size, self.cfg.hidden))
        return (cont[..., None] * vec.astype(self.dtype)
                + bias.astype(self.dtype))  # (..., F, H)

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        # static categorical (B, n_static) int
        s_embeds = [
            nn.Embed(n, cfg.hidden, dtype=self.dtype, name=f"s_cat_{i}")(
                x["s_cat"][..., i])
            for i, n in enumerate(cfg.static_categorical_sizes)
        ]
        s_inp = jnp.stack(s_embeds, axis=-2)  # (B, n_static, H)
        t_known = self._cont(x["k_cont"], "k_cont", cfg.n_known)
        t_observed = (self._cont(x["o_cont"], "o_cont", cfg.n_observed_cont)
                      if cfg.n_observed_cont else None)
        t_target = self._cont(x["target"], "target", 1)
        return s_inp, t_known, t_observed, t_target


class VariableSelectionNetwork(nn.Module):
    cfg: TFTConfig
    num_inputs: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, deterministic=True):
        """x (..., num_inputs, H) -> (..., H), weights (..., num_inputs)."""
        cfg = self.cfg
        flat = jnp.reshape(x, x.shape[:-2] + (x.shape[-2] * x.shape[-1],))
        w = GRN(cfg.hidden, out=self.num_inputs, dtype=self.dtype,
                name="joint_grn")(flat, c=context, deterministic=deterministic)
        w = jax.nn.softmax(w, axis=-1)
        per_var = jnp.stack(
            [
                GRN(cfg.hidden, dropout=cfg.dropout, dtype=self.dtype,
                    name=f"var_grn_{i}")(x[..., i, :],
                                         deterministic=deterministic)
                for i in range(self.num_inputs)
            ],
            axis=-1,
        )  # (..., H, num_inputs)
        return jnp.einsum("...hv,...v->...h", per_var, w), w


class StaticCovariateEncoder(nn.Module):
    cfg: TFTConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, s_inp, deterministic=True):
        cfg = self.cfg
        ctx, _ = VariableSelectionNetwork(
            cfg, cfg.num_static_vars, self.dtype, name="vsn")(
                s_inp, deterministic=deterministic)
        cs, ce, ch, cc = [
            GRN(cfg.hidden, dropout=cfg.dropout, dtype=self.dtype,
                name=f"context_grn_{i}")(ctx, deterministic=deterministic)
            for i in range(4)
        ]
        return cs, ce, ch, cc


class InterpretableMultiHeadAttention(nn.Module):
    """Per-head scores over ONE shared value head, averaged over heads
    (reference ``modeling.py:324-360``)."""

    cfg: TFTConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.cfg
        b, t, _ = x.shape
        nh = cfg.n_heads
        dh = cfg.hidden // nh
        qkv = nn.Dense((2 * nh + 1) * dh, use_bias=False, dtype=self.dtype,
                       name="qkv")(x)
        q, k, v = jnp.split(qkv, [nh * dh, 2 * nh * dh], axis=-1)
        q = q.reshape(b, t, nh, dh)
        k = k.reshape(b, t, nh, dh)
        # v stays single-head (b, t, dh)
        score = jnp.einsum("bind,bjnd->bnij", q, k) * (dh ** -0.5)
        causal = jnp.tril(jnp.ones((t, t), bool))
        score = jnp.where(causal[None, None], score, -jnp.inf)
        prob = jax.nn.softmax(score.astype(jnp.float32), axis=-1)
        prob = RegenDropout(cfg.attn_dropout)(
            prob, deterministic=deterministic).astype(self.dtype)
        vec = jnp.einsum("bnij,bjd->bnid", prob, v)
        mean_vec = jnp.mean(vec, axis=1)  # head average -> (b, t, dh)
        out = nn.Dense(cfg.hidden, use_bias=False, dtype=self.dtype,
                       name="out_proj")(mean_vec)
        out = RegenDropout(cfg.dropout)(out, deterministic=deterministic)
        return out, prob


class TFT(nn.Module):
    cfg: TFTConfig = TFTConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: {"s_cat" (B, n_static) int, "k_cont" (B, enc+hor, n_known),
        "o_cont" (B, enc, n_observed-1), "target" (B, enc, 1)}.
        Returns quantile forecasts (B, horizon, n_quantiles)."""
        cfg = self.cfg
        s_inp, t_known, t_observed, t_target = TFTEmbedding(
            cfg, self.dtype, name="embedding")(x)

        cs, ce, ch, cc = StaticCovariateEncoder(
            cfg, self.dtype, name="static_encoder")(
                s_inp, deterministic=deterministic)

        hist = [t_known[:, : cfg.encoder_len], t_target[:, : cfg.encoder_len]]
        if t_observed is not None:
            hist.insert(0, t_observed[:, : cfg.encoder_len])
        historical_inputs = jnp.concatenate(hist, axis=-2)
        future_inputs = t_known[:, cfg.encoder_len:]

        hist_features, _ = VariableSelectionNetwork(
            cfg, cfg.num_historic_vars, self.dtype, name="history_vsn")(
                historical_inputs, context=cs, deterministic=deterministic)
        # torch LSTM initial state is (h0, c0) = (ch, cc); flax carry (c, h)
        hist_rnn = nn.RNN(
            nn.OptimizedLSTMCell(cfg.hidden, dtype=self.dtype,
                                 name="history_encoder"),
            return_carry=True)
        state, history = hist_rnn(hist_features, initial_carry=(cc, ch))
        fut_features, _ = VariableSelectionNetwork(
            cfg, cfg.num_future_vars, self.dtype, name="future_vsn")(
                future_inputs, context=cs, deterministic=deterministic)
        future = nn.RNN(
            nn.OptimizedLSTMCell(cfg.hidden, dtype=self.dtype,
                                 name="future_encoder"))(
                fut_features, initial_carry=state)

        input_embedding = jnp.concatenate([hist_features, fut_features], axis=1)
        temporal = jnp.concatenate([history, future], axis=1)
        temporal = GLU(cfg.hidden, self.dtype, name="input_gate")(temporal)
        temporal = temporal + input_embedding
        temporal = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype,
                                name="input_gate_ln")(temporal)

        enriched = GRN(cfg.hidden, dropout=cfg.dropout, dtype=self.dtype,
                       name="enrichment_grn")(
                           temporal, c=ce, deterministic=deterministic)

        attn_out, _ = InterpretableMultiHeadAttention(
            cfg, self.dtype, name="attention")(
                enriched, deterministic=deterministic)

        # quantiles only for the horizon steps
        attn_out = attn_out[:, cfg.encoder_len:]
        temporal = temporal[:, cfg.encoder_len:]
        enriched = enriched[:, cfg.encoder_len:]

        y = GLU(cfg.hidden, self.dtype, name="attention_gate")(attn_out)
        y = y + enriched
        y = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype, name="attention_ln")(y)

        y = GRN(cfg.hidden, dropout=cfg.dropout, dtype=self.dtype,
                name="positionwise_grn")(y, deterministic=deterministic)

        y = GLU(cfg.hidden, self.dtype, name="decoder_gate")(y)
        y = y + temporal
        y = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype, name="decoder_ln")(y)

        return nn.Dense(len(cfg.quantiles), dtype=jnp.float32,
                        name="quantile_proj")(y.astype(jnp.float32))


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

    def _model_inputs(self, observed, known, s_cat=None):
        """Map the loader contract {"observed", "known"} onto the reference's
        stream dict: the target column splits out of the observed block."""
        cfg = self.cfg
        tpos = cfg.target_pos
        target = observed[..., tpos:tpos + 1]
        o_cont = jnp.concatenate(
            [observed[..., :tpos], observed[..., tpos + 1:]], axis=-1)
        if s_cat is None:
            s_cat = jnp.zeros(observed.shape[:1] + (cfg.num_static_vars,),
                              jnp.int32)
        x = {"s_cat": s_cat, "k_cont": known, "target": target}
        if cfg.n_observed_cont:
            x["o_cont"] = o_cont
        return x

    def init(self, rng, batch=2):
        cfg = self.cfg
        init_rng, drop = jax.random.split(rng)
        x = self._model_inputs(
            jnp.zeros((batch, cfg.encoder_len, cfg.n_observed)),
            jnp.zeros((batch, cfg.example_length, cfg.n_known)),
        )
        return self.model.init({"params": init_rng, "dropout": drop}, x)[
            "params"], {}

    def loss_fn(self, params, model_state, batch, rng):
        x = self._model_inputs(batch["observed"], batch["known"],
                               batch.get("s_cat"))
        pred = self.model.apply(
            {"params": params}, x, deterministic=False,
            rngs={"dropout": rng},
        )
        loss = quantile_loss(pred, batch["target"], self.cfg.quantiles)
        return loss, (model_state, {})

    def predict_fn(self, params, observed, known, s_cat=None):
        x = self._model_inputs(observed, known, s_cat)
        return self.model.apply({"params": params}, x, deterministic=True)
