"""BERT model family.

TPU-native re-design of the reference BERT
(``PyTorch/LanguageModeling/BERT/modeling.py``): embeddings (:166-199),
self-attention (:304-384), fused bias+GELU ``LinearActivation`` (:130),
encoder with activation checkpointing (:471-495), pooler, pretraining heads
(:890), and task heads (QA :1301, sequence classification).

TPU-first differences from the reference:

- attention uses the Pallas flash kernel (``ops/flash_attention.py``) —
  no (B, H, S, S) score tensor in HBM; the reference's (seq, bsz, hidden)
  layout tricks and ``jit.script``-fused bias+GELU are unnecessary (XLA
  fuses bias+GELU into the matmul epilogue on its own)
- activation checkpointing via ``flax.linen.remat`` instead of
  ``torch.utils.checkpoint``
- bf16 compute / fp32 params; LayerNorm statistics in fp32
- vocab padded to a multiple of 128 (lane width) — the reference pads to 8
  (``run_pretraining.py:382-384``)
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import flash_attention, ring_attention
from ...ops.dropout import RegenDropout

__all__ = [
    "BertConfig",
    "BertModel",
    "BertForPreTraining",
    "BertForQuestionAnswering",
    "BertForSequenceClassification",
    "BertForMultipleChoice",
    "BERT_CONFIGS",
]


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30528  # 30522 padded up; pad further to %128 at embed
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02
    remat: bool = False  # activation checkpointing over encoder layers
    # tanh-approximate GELU matches the reference (BERT/modeling.py:121-122,
    # F.gelu(x, approximate=True)) and is ~18% faster per step on TPU at
    # s512 (erf is VPU-transcendental-bound: 158 -> 130 ms fwd+bwd).
    # HF transformers uses exact erf — the HF-parity test overrides this.
    gelu_approximate: bool = True
    # remat_policy "full" recomputes everything; "dots" saves matmul outputs
    # and recomputes only elementwise ops (jax checkpoint_policies)
    remat_policy: str = "dots"
    # "flash" (default): the Pallas kernel at every length. A plain-XLA
    # path ("xla") exists for debugging/ablation but is a measured NEGATIVE
    # result even at s128, where the isolated kernel microbench favors it
    # (fwd+bwd 1.56 vs 2.02 ms, perf/s128_probe.py): in the FULL train step
    # the materialized fp32 (B,H,S,S) scores cost more in HBM traffic and
    # lost fusion than the kernel's 0.46 ms/layer win — step-level A/B at
    # B64 S128: flash 172.8 ms vs xla 197.1 ms (NOTES.md s128 ceiling).
    # "ring": sequence-parallel ring attention over the mesh `sequence`
    # axis (ops/ring_attention.py) for contexts past one chip's S^2 — run
    # under jax.set_mesh; dropout via the positional-hash mask.
    attention_impl: str = "flash"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def padded_vocab(self) -> int:
        return ((self.vocab_size + 127) // 128) * 128


BERT_CONFIGS = {
    # debug/CI-scale model (no reference analogue; for smoke tests)
    "tiny": BertConfig(
        vocab_size=1024, hidden_size=64, num_layers=2, num_heads=2,
        intermediate_size=128, max_position_embeddings=512,
    ),
    "base": BertConfig(),
    "large": BertConfig(
        hidden_size=1024, num_layers=24, num_heads=16, intermediate_size=4096
    ),
}


def _dense(features, cfg, name=None, dtype=jnp.float32):
    return nn.Dense(
        features,
        dtype=dtype,
        kernel_init=nn.initializers.normal(cfg.initializer_range),
        name=name,
    )


class BertEmbeddings(nn.Module):
    cfg: BertConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, input_ids, token_type_ids, deterministic: bool):
        cfg = self.cfg
        emb_init = nn.initializers.normal(cfg.initializer_range)
        word = nn.Embed(cfg.padded_vocab, cfg.hidden_size, embedding_init=emb_init,
                        dtype=self.dtype, name="word_embeddings")(input_ids)
        pos_ids = jnp.arange(input_ids.shape[-1])[None, :]
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       embedding_init=emb_init, dtype=self.dtype,
                       name="position_embeddings")(pos_ids)
        typ = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, embedding_init=emb_init,
                       dtype=self.dtype, name="token_type_embeddings")(token_type_ids)
        x = word + pos + typ
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="LayerNorm")(x)
        x = RegenDropout(cfg.hidden_dropout)(x, deterministic=deterministic)
        return x


class BertSelfAttention(nn.Module):
    """MHA via the Pallas flash kernel (reference ``BertSelfAttention``
    ``modeling.py:304-384`` + output projection :386-398)."""

    cfg: BertConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, attention_mask, deterministic: bool):
        cfg = self.cfg
        b, s, _ = x.shape
        h, hd = cfg.num_heads, cfg.head_dim

        # three projections (reference query/key/value naming) writing the
        # kernel operands DIRECTLY: a fused 3*hidden Dense needs three
        # strided slice copies fwd + a dqkv concat bwd, measured +0.2
        # ms/layer at s512 (~5 ms/step over 24 layers, perf/qkv experiment);
        # the bshd layout means no (B,H,S,D) transpose is ever materialized
        q = _dense(cfg.hidden_size, cfg, dtype=self.dtype,
                   name="query")(x).reshape(b, s, h, hd)
        k = _dense(cfg.hidden_size, cfg, dtype=self.dtype,
                   name="key")(x).reshape(b, s, h, hd)
        v = _dense(cfg.hidden_size, cfg, dtype=self.dtype,
                   name="value")(x).reshape(b, s, h, hd)
        if cfg.attention_impl == "xla":
            # short-seq path: the (B, H, S, S) scores fit comfortably, XLA
            # fuses scale+mask+softmax into the matmul epilogue, and the
            # bf16 MXU path carries both dots (see attention_impl above)
            scale = 1.0 / np.sqrt(hd)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32) * scale
            logits = jnp.where(
                attention_mask[:, None, None, :].astype(bool), logits,
                jnp.float32(-1e9))
            p = jax.nn.softmax(logits, axis=-1)
            if not deterministic and cfg.attention_dropout > 0.0:
                # reference drops attention PROBABILITIES (modeling.py:355)
                p = RegenDropout(cfg.attention_dropout)(
                    p, deterministic=False)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", p.astype(self.dtype), v)
        elif cfg.attention_impl == "ring":
            # sequence-parallel long-context path (beyond the reference):
            # exact ring attention over the mesh `sequence` axis
            # (ops/ring_attention.py) — run under jax.set_mesh(mesh) with
            # MeshSpec(sequence=N). Attention-prob dropout rides the same
            # stateless positional hash as the flash kernel's interpret
            # path (global positions — ring-decomposition-independent).
            dr, seed = 0.0, 0
            if not deterministic and cfg.attention_dropout > 0.0:
                dr = cfg.attention_dropout
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), -2**31, 2**31 - 1,
                    dtype=jnp.int32,
                )
            ctx = ring_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), key_mask=attention_mask,
                dropout_rate=dr, dropout_seed=seed,
            ).transpose(0, 2, 1, 3)
        elif not deterministic and cfg.attention_dropout > 0.0:
            # reference drops attention PROBABILITIES (modeling.py:355);
            # the kernel applies the mask in-VMEM (hw PRNG / stateless
            # hash) — a fresh int32 seed per step from the flax dropout rng
            seed = jax.random.randint(
                self.make_rng("dropout"), (), -2**31, 2**31 - 1,
                dtype=jnp.int32,
            )
            ctx = flash_attention(
                q, k, v, key_mask=attention_mask, layout="bshd",
                dropout_rate=cfg.attention_dropout, dropout_seed=seed,
            )
        else:
            ctx = flash_attention(
                q, k, v, key_mask=attention_mask, layout="bshd",
            )
        ctx = ctx.reshape(b, s, cfg.hidden_size)
        out = _dense(cfg.hidden_size, cfg, dtype=self.dtype, name="output")(ctx)
        out = RegenDropout(cfg.hidden_dropout)(out, deterministic=deterministic)
        return out


class BertLayer(nn.Module):
    cfg: BertConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, attention_mask, deterministic: bool):
        cfg = self.cfg
        attn = BertSelfAttention(cfg, self.dtype, name="attention")(
            x, attention_mask, deterministic
        )
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="attention_ln")(x + attn)
        # LinearActivation fused bias+GELU (reference modeling.py:130) — XLA
        # fuses the bias+gelu epilogue into the matmul on its own.
        y = _dense(cfg.intermediate_size, cfg, dtype=self.dtype, name="intermediate")(x)
        y = nn.gelu(y, approximate=cfg.gelu_approximate)
        y = _dense(cfg.hidden_size, cfg, dtype=self.dtype, name="ffn_output")(y)
        y = RegenDropout(cfg.hidden_dropout)(y, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="output_ln")(x + y)
        return x


class BertModel(nn.Module):
    cfg: BertConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask=None,
        token_type_ids=None,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)

        x = BertEmbeddings(cfg, self.dtype, name="embeddings")(
            input_ids, token_type_ids, deterministic
        )
        layer_cls = BertLayer
        if cfg.remat:
            policy = (
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                if cfg.remat_policy == "dots" else None
            )
            layer_cls = nn.remat(BertLayer, static_argnums=(3,), policy=policy)
        for i in range(cfg.num_layers):
            x = layer_cls(cfg, self.dtype, name=f"layer_{i}")(
                x, attention_mask, deterministic
            )
        # pooler: tanh dense over [CLS] (reference BertPooler)
        pooled = _dense(cfg.hidden_size, cfg, dtype=self.dtype, name="pooler")(x[:, 0])
        pooled = jnp.tanh(pooled)
        return x, pooled


class BertForPreTraining(nn.Module):
    """MLM + NSP heads (reference ``BertForPreTraining`` ``modeling.py:890``,
    ``BertPreTrainingHeads`` :860-880). MLM decoder is weight-tied to the
    word embeddings, with its own bias."""

    cfg: BertConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids,
                 masked_positions=None, deterministic: bool = True):
        """``masked_positions`` (B, P) enables the reference's
        dense-sequence-output optimization (``modeling.py`` dense_seq_output,
        ``run_pretraining.py``): only the P masked positions go through the
        vocab projection — a ~seq/P reduction of the dominant matmul."""
        cfg = self.cfg
        seq, pooled = BertModel(cfg, self.dtype, name="bert")(
            input_ids, attention_mask, token_type_ids, deterministic
        )
        if masked_positions is not None:
            seq = jnp.take_along_axis(
                seq, masked_positions[:, :, None], axis=1
            )  # (B, P, H)
        # MLM transform
        t = _dense(cfg.hidden_size, cfg, dtype=self.dtype, name="mlm_transform")(seq)
        t = nn.gelu(t, approximate=cfg.gelu_approximate)
        t = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="mlm_ln")(t)
        # tied decoder — bf16 matmul, fp32 accumulation/logits
        word_emb = self.variables["params"]["bert"]["embeddings"][
            "word_embeddings"]["embedding"]
        mlm_logits = jax.lax.dot_general(
            t.astype(self.dtype), word_emb.astype(self.dtype),
            (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        mlm_bias = self.param("mlm_bias", nn.initializers.zeros, (cfg.padded_vocab,))
        mlm_logits = mlm_logits + mlm_bias
        nsp_logits = _dense(2, cfg, dtype=jnp.float32, name="nsp")(
            pooled.astype(jnp.float32)
        )
        return mlm_logits, nsp_logits


class BertForQuestionAnswering(nn.Module):
    """Span start/end head (reference ``modeling.py:1301``)."""

    cfg: BertConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids,
                 deterministic: bool = True):
        seq, _ = BertModel(self.cfg, self.dtype, name="bert")(
            input_ids, attention_mask, token_type_ids, deterministic
        )
        logits = _dense(2, self.cfg, dtype=jnp.float32, name="qa_outputs")(
            seq.astype(jnp.float32)
        )
        start, end = logits[..., 0], logits[..., 1]
        return start, end


class BertForSequenceClassification(nn.Module):
    """GLUE-style head (reference ``BertForSequenceClassification``)."""

    cfg: BertConfig
    num_labels: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids,
                 deterministic: bool = True):
        _, pooled = BertModel(self.cfg, self.dtype, name="bert")(
            input_ids, attention_mask, token_type_ids, deterministic
        )
        pooled = nn.Dropout(self.cfg.hidden_dropout)(pooled, deterministic=deterministic)
        return _dense(self.num_labels, self.cfg, dtype=jnp.float32, name="classifier")(
            pooled.astype(jnp.float32)
        )


class BertForMultipleChoice(nn.Module):
    """SWAG-style multiple choice (reference ``run_swag.py`` /
    ``BertForMultipleChoice``): choices folded into the batch dim, one
    scalar score per (context, choice) pair, softmax over choices."""

    cfg: BertConfig
    num_choices: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids,
                 deterministic: bool = True):
        """inputs (B, num_choices, S) -> logits (B, num_choices)."""
        b, c, s = input_ids.shape
        flat = lambda t: t.reshape(b * c, s)
        _, pooled = BertModel(self.cfg, self.dtype, name="bert")(
            flat(input_ids), flat(attention_mask), flat(token_type_ids),
            deterministic,
        )
        pooled = nn.Dropout(self.cfg.hidden_dropout)(
            pooled, deterministic=deterministic
        )
        scores = _dense(1, self.cfg, dtype=jnp.float32, name="classifier")(
            pooled.astype(jnp.float32)
        )
        return scores.reshape(b, c)
