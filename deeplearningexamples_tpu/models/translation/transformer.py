"""Transformer for neural machine translation.

Breadth recipe (reference ``PyTorch/Translation/Transformer`` — fairseq
transformer_wmt_en_de: 6+6 layers, d=1024/dff=4096/h=16 "big" or 512/2048/8
"base", sinusoidal positions, shared source/target embeddings, label-smoothed
CE 0.1). The reference's CUDA ``strided_batched_gemm`` is the MXU's native
job; attention uses the Pallas flash kernel (causal for the decoder).
Beam-search decoding lives in ``beam_search.py``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...ops import flash_attention

__all__ = ["TransformerConfig", "Transformer", "TransformerTask"]


@dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int = 33712  # joint BPE vocab, padded at embed to %128
    d_model: int = 512
    d_ff: int = 2048
    num_heads: int = 8
    encoder_layers: int = 6
    decoder_layers: int = 6
    dropout: float = 0.1
    # the reference base arch (``transformer.py:562-563``) defaults both to
    # 0; the big_t2t recipe raises them to 0.1
    attention_dropout: float = 0.0
    relu_dropout: float = 0.0
    # fairseq MultiheadAttention is bias-free (``multihead_attention.py:259``
    # ``bias=False`` default, out_proj too); BART's HF layout keeps biases
    attn_bias: bool = False
    # the reference data pipeline left-pads source, right-pads target
    # (``TransformerEncoder(..., left_pad=True)`` / decoder ``left_pad=False``)
    left_pad_src: bool = True
    max_len: int = 256
    label_smoothing: float = 0.1
    pad_id: int = 1
    bos_id: int = 0
    eos_id: int = 2

    @property
    def padded_vocab(self) -> int:
        return ((self.vocab_size + 127) // 128) * 128


def sinusoidal_positions(max_len: int, d: int, pad_id: int = 1) -> np.ndarray:
    """fairseq/t2t sinusoid table (``sinusoidal_positional_embedding.py:40``):
    rows are position IDS (pads point at row ``pad_id``, which is zeroed;
    real tokens start at ``pad_id + 1``), layout is [sin | cos] concatenated
    over ``half_dim`` frequencies with the ``1/(half_dim-1)`` log-spacing —
    NOT the interleaved layout of the paper."""
    rows = max_len + pad_id + 1
    half = d // 2
    freq = np.exp(np.arange(half) * (-np.log(10000.0) / (half - 1)))
    ang = np.arange(rows)[:, None] * freq[None, :]
    out = np.concatenate([np.sin(ang), np.cos(ang)], axis=1).astype(np.float32)
    if d % 2:
        out = np.concatenate([out, np.zeros((rows, 1), np.float32)], axis=1)
    out[pad_id] = 0.0
    return out


def fairseq_position_ids(ids: jax.Array, pad_id: int, left_pad: bool) -> jax.Array:
    """Position ids per ``fairseq.utils.make_positions``: non-pad tokens get
    ``pad_id + 1 + index`` counted over the sequence slot; with left padding
    the count is shifted so the FIRST real token lands on ``pad_id + 1``.
    Pad slots point at the zeroed table row."""
    seq = ids.shape[1]
    mask = ids != pad_id
    pos = jnp.arange(pad_id + 1, pad_id + 1 + seq, dtype=jnp.int32)[None, :]
    if left_pad:
        pos = pos - seq + jnp.sum(mask, axis=1, keepdims=True).astype(jnp.int32)
    return jnp.where(mask, pos, pad_id)


class MHA(nn.Module):
    cfg: TransformerConfig
    causal: bool
    dtype: Any

    @nn.compact
    def __call__(self, q_in, kv_in, kv_mask, deterministic, decode: bool = False):
        cfg = self.cfg
        h = cfg.num_heads
        hd = cfg.d_model // h
        b, sq, _ = q_in.shape
        sk = kv_in.shape[1]
        # BART's HF layout keeps attention biases; the fairseq NMT reference
        # is bias-free (attn_bias=False in TransformerConfig)
        bias = bool(getattr(cfg, "attn_bias", True))
        q = nn.Dense(cfg.d_model, dtype=self.dtype, use_bias=bias, name="q")(q_in)
        k = nn.Dense(cfg.d_model, dtype=self.dtype, use_bias=bias, name="k")(kv_in)
        v = nn.Dense(cfg.d_model, dtype=self.dtype, use_bias=bias, name="v")(kv_in)
        attn_rate = float(getattr(cfg, "attention_dropout", 0.0))
        attn_seed = 0
        if attn_rate > 0.0 and not deterministic:
            attn_seed = jax.random.randint(
                self.make_rng("dropout"), (), 0, jnp.iinfo(jnp.int32).max)
        else:
            attn_rate = 0.0

        if decode and self.causal:
            # incremental decoding: one query token; K/V appended to a cache
            # (flax "cache" collection) and attended with plain jnp attention
            # — a single-row matmul doesn't need the flash kernel.
            max_len = cfg.max_len
            ck = self.variable("cache", "cached_k", jnp.zeros,
                               (b, max_len, cfg.d_model), self.dtype)
            cv = self.variable("cache", "cached_v", jnp.zeros,
                               (b, max_len, cfg.d_model), self.dtype)
            idx = self.variable("cache", "cache_idx", lambda: jnp.zeros((), jnp.int32))
            pos = idx.value
            ck.value = jax.lax.dynamic_update_slice(ck.value, k, (0, pos, 0))
            cv.value = jax.lax.dynamic_update_slice(cv.value, v, (0, pos, 0))
            idx.value = pos + 1
            kh = ck.value.reshape(b, max_len, h, hd)
            vh = cv.value.reshape(b, max_len, h, hd)
            qh = q.reshape(b, 1, h, hd)
            scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(hd)
            valid = (jnp.arange(max_len)[None, :] <= pos).astype(scores.dtype)
            scores = jnp.where(valid[:, None, None, :] > 0, scores, -1e9)
            w = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(self.dtype)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", w, vh).reshape(b, 1, cfg.d_model)
        else:
            heads = lambda t, s: t.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
            ctx = flash_attention(
                heads(q, sq), heads(k, sk), heads(v, sk),
                key_mask=kv_mask, causal=self.causal,
                dropout_rate=attn_rate, dropout_seed=attn_seed,
            )
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, sq, cfg.d_model)
        out = nn.Dense(cfg.d_model, dtype=self.dtype, use_bias=bias,
                       name="out")(ctx)
        return nn.Dropout(cfg.dropout)(out, deterministic=deterministic)


class Block(nn.Module):
    """Post-LN transformer block; optional cross-attention."""

    cfg: TransformerConfig
    causal: bool
    cross: bool
    dtype: Any

    @nn.compact
    def __call__(self, x, x_mask, memory, memory_mask, deterministic,
                 decode: bool = False):
        cfg = self.cfg
        a = MHA(cfg, self.causal, self.dtype, name="self_attn")(
            x, x, x_mask, deterministic, decode=decode
        )
        # eps=1e-5: apex FusedLayerNorm / torch.nn.LayerNorm default, which
        # the fairseq and HF references inherit (flax defaults to 1e-6)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(x + a)
        if self.cross:
            c = MHA(cfg, False, self.dtype, name="cross_attn")(
                x, memory, memory_mask, deterministic
            )
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_cross")(x + c)
        y = nn.Dense(cfg.d_ff, dtype=self.dtype, name="ff1")(x)
        y = nn.relu(y)
        # the reference uses a SEPARATE relu_dropout rate here (0 in the
        # base arch, 0.1 in big_t2t) — transformer.py:391-392
        y = nn.Dropout(float(getattr(cfg, "relu_dropout", cfg.dropout)))(
            y, deterministic=deterministic)
        y = nn.Dense(cfg.d_model, dtype=self.dtype, name="ff2")(y)
        y = nn.Dropout(cfg.dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")(x + y)


class Transformer(nn.Module):
    cfg: TransformerConfig = TransformerConfig()
    dtype: Any = jnp.bfloat16

    def setup(self):
        cfg = self.cfg
        def embed_init(key, shape, dtype):
            # N(0, d^-0.5) with a zeroed pad row (reference Embedding(),
            # transformer.py:506-510)
            w = nn.initializers.normal(cfg.d_model**-0.5)(key, shape, dtype)
            return w.at[cfg.pad_id].set(0.0)

        self.embed = nn.Embed(
            cfg.padded_vocab, cfg.d_model,
            embedding_init=embed_init,
            dtype=self.dtype,
        )
        self.pos = jnp.asarray(
            sinusoidal_positions(cfg.max_len, cfg.d_model, cfg.pad_id))
        self.enc_layers = [
            Block(cfg, False, False, self.dtype, name=f"enc_{i}")
            for i in range(cfg.encoder_layers)
        ]
        self.dec_layers = [
            Block(cfg, True, True, self.dtype, name=f"dec_{i}")
            for i in range(cfg.decoder_layers)
        ]
        self.drop = nn.Dropout(cfg.dropout)

    def _embed(self, ids, deterministic, left_pad):
        cfg = self.cfg
        x = self.embed(ids) * jnp.asarray(cfg.d_model**0.5, self.dtype)
        pos_ids = fairseq_position_ids(ids, cfg.pad_id, left_pad)
        x = x + jnp.take(self.pos, pos_ids, axis=0).astype(self.dtype)
        return self.drop(x, deterministic=deterministic)

    def encode(self, src_ids, deterministic: bool = True):
        mask = (src_ids != self.cfg.pad_id).astype(jnp.int32)
        x = self._embed(src_ids, deterministic,
                        left_pad=self.cfg.left_pad_src)
        for layer in self.enc_layers:
            x = layer(x, mask, None, None, deterministic)
        return x, mask

    def decode(self, tgt_ids, memory, memory_mask, deterministic: bool = True):
        x = self._embed(tgt_ids, deterministic, left_pad=False)
        # reference decoder self-attention is causal-only (no key padding
        # mask, transformer.py:448-453): targets are right-padded, so valid
        # queries never see a pad key anyway
        for layer in self.dec_layers:
            x = layer(x, None, memory, memory_mask, deterministic)
        # tied output projection
        logits = jax.lax.dot_general(
            x, self.embed.embedding.astype(self.dtype),
            (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        return logits

    def decode_step(self, token, pos, memory, memory_mask):
        """Incremental decode: token (B,) at position pos -> logits (B, V).
        Requires a mutable "cache" collection (see ``beam_search_cached``)."""
        cfg = self.cfg
        x = self.embed(token[:, None]) * jnp.asarray(cfg.d_model**0.5, self.dtype)
        # incremental position row: pad_id + tokens-so-far (fairseq
        # sinusoidal_positional_embedding.py:73)
        x = x + jax.lax.dynamic_slice_in_dim(
            self.pos, pos + cfg.pad_id + 1, 1)[None].astype(self.dtype)
        ones = jnp.ones((x.shape[0], 1), jnp.int32)
        for layer in self.dec_layers:
            x = layer(x, ones, memory, memory_mask, True, decode=True)
        logits = jax.lax.dot_general(
            x, self.embed.embedding.astype(self.dtype),
            (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        return logits[:, 0]

    def __call__(self, src_ids, tgt_in, deterministic: bool = True):
        memory, memory_mask = self.encode(src_ids, deterministic)
        return self.decode(tgt_in, memory, memory_mask, deterministic)


@dataclass
class TransformerTask:
    cfg: TransformerConfig = TransformerConfig()
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        self.model = Transformer(self.cfg, self.dtype)

    def init(self, rng, seq=16, batch=2):
        ids = jnp.full((batch, seq), self.cfg.pad_id, jnp.int32)
        return self.model.init(rng, ids, ids)["params"], {}

    def loss_fn(self, params, model_state, batch, rng):
        """batch: src (B,S), tgt (B,T) — tgt includes BOS...EOS; teacher
        forcing shifts internally; pads are excluded from the loss."""
        cfg = self.cfg
        tgt_in = batch["tgt"][:, :-1]
        tgt_out = batch["tgt"][:, 1:]
        logits = self.model.apply(
            {"params": params}, batch["src"], tgt_in,
            deterministic=False, rngs={"dropout": rng},
        )
        valid = (tgt_out != cfg.pad_id).astype(jnp.float32)
        num_classes = logits.shape[-1]
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, tgt_out[..., None], axis=-1)[..., 0]
        smooth = -jnp.mean(logp, axis=-1)
        ls = cfg.label_smoothing
        ce = (1.0 - ls) * nll + ls * smooth
        loss = jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        return loss, (model_state, {})
