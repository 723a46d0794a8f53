"""Transformer-XL — segment-recurrent language model.

Breadth recipe (reference ``PyTorch/LanguageModeling/Transformer-XL/pytorch/
mem_transformer.py``): relative positional attention (Dai et al.: content/
position streams with learned global biases u and v, the "rel-shift" trick)
and segment-level recurrence — the previous segment's hidden states are
carried as extra, gradient-stopped attention context, giving effective
context length ``mem_len + seg_len``.

The reference's adaptive softmax/embedding (for the 267K-vocab WT103 run)
is replaced by a tied full softmax over the lane-padded vocab — on the MXU
a dense (B*T, V) matmul at WT103 scale is compute-cheap, and the adaptive
clustering was a GPU memory/throughput workaround.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from ..ops.dropout import RegenDropout

__all__ = ["TransformerXLConfig", "TransformerXL", "TransformerXLTask"]


@dataclass(frozen=True)
class TransformerXLConfig:
    vocab_size: int = 267735  # WT103; base model d=512 L=16 h=8
    d_model: int = 512
    n_heads: int = 8
    d_head: int = 64
    d_ff: int = 2048
    n_layers: int = 16
    seg_len: int = 192
    mem_len: int = 192
    dropout: float = 0.1

    @property
    def padded_vocab(self) -> int:
        return ((self.vocab_size + 127) // 128) * 128


def _rel_shift(x):
    """(B, H, Tq, Tk) position-scores shift (Dai et al. appendix B)."""
    b, h, q, k = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, h, k + 1, q)[:, :, 1:, :]
    return x.reshape(b, h, q, k)


class RelAttention(nn.Module):
    cfg: TransformerXLConfig
    dtype: Any

    @nn.compact
    def __call__(self, x, mem, rel_pos_emb, u, w, mem_valid, deterministic):
        """x (B, T, D); mem (B, M, D) gradient-stopped previous hiddens.
        ``u``/``w``: the GLOBAL content/position biases (r_w_bias/r_r_bias,
        shared across layers — ``mem_transformer.py:611-613``).
        ``mem_valid``: number of valid TRAILING mem positions — static-shape
        stand-in for the reference's growing ``mems`` (zero-filled leading
        slots are masked out of the softmax, so segment 1 matches the
        reference's empty-mems attention exactly)."""
        cfg = self.cfg
        h, dh = cfg.n_heads, cfg.d_head
        b, t, _ = x.shape
        ctx = jnp.concatenate([mem, x], axis=1)  # (B, M+T, D)
        klen = ctx.shape[1]

        q = nn.Dense(h * dh, use_bias=False, dtype=self.dtype, name="q")(x)
        k = nn.Dense(h * dh, use_bias=False, dtype=self.dtype, name="k")(ctx)
        v = nn.Dense(h * dh, use_bias=False, dtype=self.dtype, name="v")(ctx)
        r = nn.Dense(h * dh, use_bias=False, dtype=self.dtype, name="r")(
            rel_pos_emb[:klen]
        )  # (klen, h*dh)

        qh = q.reshape(b, t, h, dh)
        kh = k.reshape(b, klen, h, dh)
        vh = v.reshape(b, klen, h, dh)
        rh = r.reshape(klen, h, dh)

        # content term (q + u) . k ; position term (q + v) . r with rel-shift
        ac = jnp.einsum("bthd,bkhd->bhtk", qh + u.astype(self.dtype), kh)
        bd = jnp.einsum("bthd,khd->bhtk", qh + w.astype(self.dtype),
                        rh.astype(self.dtype))
        bd = _rel_shift(bd)
        scores = (ac + bd) / np.sqrt(dh)

        # causal mask over the concatenated context; unfilled mem slots
        # (kpos < mem_len - mem_valid) are masked like absent columns
        qpos = jnp.arange(t)[:, None] + (klen - t)
        kpos = jnp.arange(klen)[None, :]
        keep = (qpos >= kpos) & (kpos >= (klen - t) - mem_valid)
        scores = jnp.where(keep, scores, -1e9)
        p = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        p = RegenDropout(cfg.dropout)(p, deterministic=deterministic)
        out = jnp.einsum("bhtk,bkhd->bthd", p, vh).reshape(b, t, h * dh)
        out = nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype,
                       name="o")(out)
        return RegenDropout(cfg.dropout)(out, deterministic=deterministic)


class XLLayer(nn.Module):
    cfg: TransformerXLConfig
    dtype: Any

    @nn.compact
    def __call__(self, x, mem, rel_pos_emb, u, w, mem_valid, deterministic):
        cfg = self.cfg
        a = RelAttention(cfg, self.dtype, name="attn")(
            x, mem, rel_pos_emb, u, w, mem_valid, deterministic
        )
        x = nn.LayerNorm(dtype=self.dtype, name="ln1")(x + a)
        y = nn.Dense(cfg.d_ff, dtype=self.dtype, name="ff1")(x)
        y = nn.relu(y)
        y = RegenDropout(cfg.dropout)(y, deterministic=deterministic)
        y = nn.Dense(cfg.d_model, dtype=self.dtype, name="ff2")(y)
        return nn.LayerNorm(dtype=self.dtype, name="ln2")(x + y)


class TransformerXL(nn.Module):
    cfg: TransformerXLConfig = TransformerXLConfig()
    dtype: Any = jnp.bfloat16

    def setup(self):
        cfg = self.cfg
        self.embed = nn.Embed(cfg.padded_vocab, cfg.d_model,
                              embedding_init=nn.initializers.normal(0.02),
                              dtype=self.dtype)
        max_klen = cfg.seg_len + cfg.mem_len
        inv = 1.0 / (10000 ** (np.arange(0, cfg.d_model, 2) / cfg.d_model))
        pos = np.arange(max_klen - 1, -1, -1.0)[:, None] * inv[None, :]
        pe = np.concatenate([np.sin(pos), np.cos(pos)], axis=1).astype(np.float32)
        self.rel_pos_emb = jnp.asarray(pe)  # (max_klen, D) reversed distances
        self.layers = [XLLayer(cfg, self.dtype, name=f"layer_{i}")
                       for i in range(cfg.n_layers)]
        self.drop = RegenDropout(cfg.dropout)
        # global content/position biases shared by all layers (the reference
        # default attn_type=0, mem_transformer.py:611-613; zero-init there)
        self.r_w_bias = self.param(
            "r_w_bias", nn.initializers.normal(0.02),
            (cfg.n_heads, cfg.d_head))
        self.r_r_bias = self.param(
            "r_r_bias", nn.initializers.normal(0.02),
            (cfg.n_heads, cfg.d_head))
        # tied-softmax output bias (ProjectedAdaptiveLogSoftmax out_layers
        # bias, untied and zero-init — mem_transformer.py crit)
        self.softmax_bias = self.param(
            "softmax_bias", nn.initializers.zeros, (cfg.padded_vocab,))

    def __call__(self, tokens, mems=None, mem_valid=None,
                 deterministic: bool = True):
        """tokens (B, T). mems: list of per-layer (B, M, D) or None.
        ``mem_valid``: count of valid trailing mem positions (0 when mems is
        None, i.e. a fresh sequence; defaults to mem_len for given mems).
        Returns (logits (B, T, V), new_mems)."""
        cfg = self.cfg
        b, t = tokens.shape
        if mems is None:
            mems = [
                jnp.zeros((b, cfg.mem_len, cfg.d_model), self.dtype)
                for _ in range(cfg.n_layers)
            ]
            if mem_valid is None:
                mem_valid = 0
        if mem_valid is None:
            mem_valid = cfg.mem_len
        # embeddings scaled by sqrt(d_model) (AdaptiveEmbedding.emb_scale,
        # mem_transformer.py:465,511)
        x = self.drop(self.embed(tokens) * float(np.sqrt(cfg.d_model)),
                      deterministic=deterministic)
        rel = self.rel_pos_emb.astype(self.dtype)
        u = self.r_w_bias.astype(self.dtype)
        w = self.r_r_bias.astype(self.dtype)
        new_mems = []
        for layer, mem in zip(self.layers, mems):
            # memory for the NEXT segment = last mem_len hiddens entering
            # this layer (gradient-stopped), reference _update_mems
            new_mems.append(
                jax.lax.stop_gradient(
                    jnp.concatenate([mem, x], axis=1)[:, -cfg.mem_len:]
                )
            )
            x = layer(x, mem, rel, u, w, mem_valid, deterministic)
        logits = jax.lax.dot_general(
            x, self.embed.embedding.astype(self.dtype),
            (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) + self.softmax_bias
        return logits, new_mems


@dataclass
class TransformerXLTask:
    cfg: TransformerXLConfig = TransformerXLConfig()
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        self.model = TransformerXL(self.cfg, self.dtype)

    def init(self, rng, batch=2):
        tokens = jnp.zeros((batch, self.cfg.seg_len), jnp.int32)
        init_rng, drop = jax.random.split(rng)
        return self.model.init(
            {"params": init_rng, "dropout": drop}, tokens
        )["params"], {}

    def loss_fn(self, params, model_state, batch, rng):
        """batch: tokens (B, T), targets (B, T); mems + valid-count carried
        in model_state (the reference's growing ``mems``, static-shaped)."""
        mems = model_state.get("mems")
        mem_valid = model_state.get("mem_valid", 0 if mems is None else None)
        logits, new_mems = self.model.apply(
            {"params": params}, batch["tokens"], mems, mem_valid,
            deterministic=False, rngs={"dropout": rng},
        )
        loss = jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(
                logits, batch["targets"]
            )
        )
        prev_valid = mem_valid if mem_valid is not None else self.cfg.mem_len
        new_valid = jnp.minimum(
            jnp.asarray(prev_valid, jnp.int32) + batch["tokens"].shape[1],
            self.cfg.mem_len,
        )
        return loss, ({"mems": new_mems, "mem_valid": new_valid},
                      {"ppl_proxy": loss})
