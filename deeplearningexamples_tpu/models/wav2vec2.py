"""wav2vec 2.0 — self-supervised speech representation pretraining.

Breadth recipe (reference ``PyTorch/SpeechRecognition/wav2vec2/``): a conv
feature encoder over raw audio (strided 1D convs, ~20ms frames), a
transformer context network over masked latents, a Gumbel-softmax product
quantizer producing targets, and the InfoNCE contrastive loss with in-batch
distractors plus a codebook-diversity penalty. Fine-tuning adds a CTC head
(``models/asr.greedy_ctc_decode`` reusable for decoding).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import flash_attention
from ..ops.dropout import RegenDropout

__all__ = ["Wav2Vec2Config", "Wav2Vec2", "Wav2Vec2Task",
           "Wav2Vec2ForCTC", "Wav2Vec2CtcTask"]


@dataclass(frozen=True)
class Wav2Vec2Config:
    # feature encoder: (channels, kernel, stride) per layer; base model is
    # 7 layers, 512ch, total stride 320 (~20ms at 16kHz)
    conv_layers: tuple = ((512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2),
                          (512, 3, 2), (512, 2, 2), (512, 2, 2))
    # "group_norm" = reference extractor_mode "default" (GroupNorm on the
    # first conv only — the BASE recipe); "layer_norm" = LN on every conv
    # (the LARGE/vox recipe). model.py:949, ConvFeatureExtractionModel
    extractor_mode: str = "group_norm"
    d_model: int = 768
    n_heads: int = 12
    n_layers: int = 12
    d_ff: int = 3072
    dropout: float = 0.1
    # pre-LN (True, large) vs post-LN (False, BASE default) transformer —
    # reference layer_norm_first, TransformerSentenceEncoderLayer
    layer_norm_first: bool = False
    # convolutional relative positional embedding (TransformerEncoder
    # pos_conv: grouped conv 128/16 + SamePad + GELU, model.py:649-662)
    conv_pos: int = 128
    conv_pos_groups: int = 16
    # quantizer
    n_groups: int = 2
    n_entries: int = 320  # codebook entries per group
    codevector_dim: int = 256
    # masking / contrastive
    mask_prob: float = 0.065
    mask_span: int = 10
    n_negatives: int = 100
    temperature: float = 0.1
    diversity_weight: float = 0.1


class FeatureEncoder(nn.Module):
    cfg: Wav2Vec2Config
    dtype: Any

    @nn.compact
    def __call__(self, audio):
        x = audio[..., None].astype(self.dtype)  # (B, T, 1)
        for i, (ch, k, s) in enumerate(self.cfg.conv_layers):
            x = nn.Conv(ch, (k,), strides=(s,), padding="VALID",
                        use_bias=False, dtype=self.dtype, name=f"conv{i}")(x)
            if self.cfg.extractor_mode == "layer_norm":
                x = nn.LayerNorm(dtype=self.dtype, name=f"ln{i}")(x)
            elif i == 0:
                # reference "default": GroupNorm(dim, dim) on layer 0 only —
                # per-channel normalization over time
                x = nn.GroupNorm(num_groups=ch, dtype=self.dtype,
                                 name="gn0")(x)
            x = nn.gelu(x, approximate=False)  # torch nn.GELU is exact erf
        return x  # (B, frames, 512)


class ContextBlock(nn.Module):
    cfg: Wav2Vec2Config
    dtype: Any

    @nn.compact
    def __call__(self, x, deterministic):
        cfg = self.cfg
        b, s, _ = x.shape
        h = cfg.n_heads
        hd = cfg.d_model // h
        ln1 = nn.LayerNorm(dtype=self.dtype, name="ln1")
        ln2 = nn.LayerNorm(dtype=self.dtype, name="ln2")
        drop = RegenDropout(cfg.dropout)

        def attn(y):
            qkv = nn.Dense(3 * cfg.d_model, dtype=self.dtype, name="qkv")(y)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            heads = lambda t: t.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
            ctx = flash_attention(heads(q), heads(k), heads(v))
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, cfg.d_model)
            return nn.Dense(cfg.d_model, dtype=self.dtype, name="attn_out")(ctx)

        def ff(y):
            y = nn.Dense(cfg.d_ff, dtype=self.dtype, name="ff1")(y)
            y = nn.gelu(y, approximate=False)
            return nn.Dense(cfg.d_model, dtype=self.dtype, name="ff2")(y)

        if cfg.layer_norm_first:  # pre-LN (large)
            x = x + drop(attn(ln1(x)), deterministic=deterministic)
            return x + drop(ff(ln2(x)), deterministic=deterministic)
        # post-LN (BASE): residual -> LN
        x = ln1(x + drop(attn(x), deterministic=deterministic))
        return ln2(x + drop(ff(x), deterministic=deterministic))


class GumbelQuantizer(nn.Module):
    """Product quantizer with Gumbel-softmax (reference quantizer)."""

    cfg: Wav2Vec2Config
    dtype: Any

    @nn.compact
    def __call__(self, z, tau, rng, hard: bool = True,
                 deterministic: bool = False):
        cfg = self.cfg
        b, t, _ = z.shape
        g, e = cfg.n_groups, cfg.n_entries
        logits = nn.Dense(g * e, dtype=jnp.float32, name="proj")(
            z.astype(jnp.float32)
        ).reshape(b, t, g, e)
        if deterministic:
            # reference eval path (gumbel_vector_quantizer.py:189-191):
            # plain argmax one-hot, no noise
            y = jax.nn.one_hot(jnp.argmax(logits, axis=-1), e)
        else:
            gumbel = -jnp.log(-jnp.log(
                jax.random.uniform(rng, logits.shape,
                                   minval=1e-6, maxval=1.0 - 1e-6)
            ))
            y = jax.nn.softmax((logits + gumbel) / tau, axis=-1)
            if hard:
                idx = jnp.argmax(y, axis=-1)
                y_hard = jax.nn.one_hot(idx, e)
                y = y_hard + y - jax.lax.stop_gradient(y)  # straight-through
        codebook = self.param(
            "codevectors", nn.initializers.normal(1.0),
            (g, e, cfg.codevector_dim // g),
        )
        q = jnp.einsum("btge,ged->btgd", y, codebook.astype(jnp.float32))
        q = q.reshape(b, t, cfg.codevector_dim)
        # perplexity for the diversity loss
        avg_probs = jnp.mean(jax.nn.softmax(logits, axis=-1), axis=(0, 1))  # (g, e)
        perplexity = jnp.exp(
            -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-9), axis=-1)
        )  # (g,)
        return q, perplexity


class Wav2Vec2(nn.Module):
    cfg: Wav2Vec2Config = Wav2Vec2Config()
    dtype: Any = jnp.bfloat16

    def setup(self):
        cfg = self.cfg
        self.encoder = FeatureEncoder(cfg, self.dtype)
        self.feat_ln = nn.LayerNorm(dtype=self.dtype)
        self.feat_proj = nn.Dense(cfg.d_model, dtype=self.dtype)
        self.mask_embedding = self.param(
            "mask_embedding", nn.initializers.uniform(1.0), (cfg.d_model,)
        )
        # convolutional relative positional embedding (reference pos_conv:
        # grouped Conv1d(d,d,128,groups=16) + SamePad + GELU); weight_norm
        # is a reparameterization — folded at import
        self.pos_conv = nn.Conv(
            cfg.d_model, (cfg.conv_pos,),
            feature_group_count=cfg.conv_pos_groups,
            padding=[(cfg.conv_pos // 2, cfg.conv_pos // 2)],
            dtype=self.dtype, name="pos_conv",
        )
        # encoder-level LN: applied BEFORE the layers in post-LN mode,
        # AFTER them in pre-LN mode (TransformerEncoder.extract_features)
        self.encoder_ln = nn.LayerNorm(dtype=self.dtype)
        self.blocks = [ContextBlock(cfg, self.dtype, name=f"block_{i}")
                       for i in range(cfg.n_layers)]
        self.final_proj = nn.Dense(cfg.codevector_dim, dtype=jnp.float32)
        # quantized-target projection (reference project_q, model.py:241)
        self.project_q = nn.Dense(cfg.codevector_dim, dtype=jnp.float32)
        self.quantizer = GumbelQuantizer(cfg, self.dtype)

    def features(self, audio):
        z = self.encoder(audio)
        return self.feat_ln(z)

    def contextualize(self, latents, mask, deterministic=True):
        """Context network output (B, T, d_model) — the representation
        fine-tuning heads consume (pre final_proj)."""
        cfg = self.cfg
        x = self.feat_proj(latents)
        x = jnp.where(
            mask[:, :, None], self.mask_embedding.astype(self.dtype)[None, None],
            x,
        )
        pc = self.pos_conv(x)
        if cfg.conv_pos % 2 == 0:
            pc = pc[:, :-1]  # SamePad: even kernels emit one extra step
        x = x + nn.gelu(pc, approximate=False)
        if not cfg.layer_norm_first:
            x = self.encoder_ln(x)
        for blk in self.blocks:
            x = blk(x, deterministic)
        if cfg.layer_norm_first:
            x = self.encoder_ln(x)
        return x

    def __call__(self, audio, mask, tau=2.0, rngs_quant=None,
                 deterministic: bool = True):
        z = self.features(audio)
        q, perplexity = self.quantizer(
            z, tau,
            rngs_quant if rngs_quant is not None else jax.random.key(0),
            deterministic=deterministic and rngs_quant is None,
        )
        q = self.project_q(q)
        c = self.final_proj(
            self.contextualize(z, mask, deterministic).astype(jnp.float32)
        )  # (B, T, codevector_dim)
        return c, q, perplexity


def sample_spans_mask(rng: np.random.Generator, b: int, t: int,
                      mask_prob: float, span: int) -> np.ndarray:
    """Host-side span masking (reference compute_mask_indices)."""
    mask = np.zeros((b, t), bool)
    n_spans = max(1, int(mask_prob * t / span))
    for i in range(b):
        starts = rng.choice(max(t - span, 1), size=n_spans, replace=False)
        for s in starts:
            mask[i, s : s + span] = True
    return mask


@dataclass
class Wav2Vec2Task:
    cfg: Wav2Vec2Config = Wav2Vec2Config()
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        self.model = Wav2Vec2(self.cfg, self.dtype)

    def init(self, rng, audio_len=16000, batch=2):
        r1, r2, r3 = jax.random.split(rng, 3)
        audio = jnp.zeros((batch, audio_len))
        frames = self._n_frames(audio_len)
        mask = jnp.zeros((batch, frames), bool)
        variables = self.model.init(
            {"params": r1, "dropout": r2}, audio, mask, rngs_quant=r3,
            deterministic=True,
        )
        return variables["params"], {}

    def _n_frames(self, t):
        for _, k, s in self.cfg.conv_layers:
            t = (t - k) // s + 1
        return t

    def loss_fn(self, params, model_state, batch, rng):
        """batch: audio (B, T), mask (B, frames) bool. InfoNCE over masked
        positions with in-batch negatives + diversity penalty."""
        cfg = self.cfg
        r_drop, r_quant, r_neg = jax.random.split(rng, 3)
        c, q, perplexity = self.model.apply(
            {"params": params}, batch["audio"], batch["mask"],
            rngs_quant=r_quant, deterministic=False,
            rngs={"dropout": r_drop},
        )
        b, t, d = c.shape
        mask = batch["mask"]

        def cos(a, b_):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)
            b_ = b_ / (jnp.linalg.norm(b_, axis=-1, keepdims=True) + 1e-8)
            return jnp.einsum("...d,...d->...", a, b_)

        # negatives: sample K random other positions from the same utterance
        k = min(cfg.n_negatives, t - 1)
        neg_idx = jax.random.randint(r_neg, (b, t, k), 0, t - 1)
        neg_idx = jnp.where(neg_idx >= jnp.arange(t)[None, :, None],
                            neg_idx + 1, neg_idx)  # exclude the positive
        negs = jnp.take_along_axis(
            q[:, :, None, :], neg_idx[..., None], axis=1
        )  # (B, T, K, D) gathered along time
        pos_sim = cos(c, q) / cfg.temperature  # (B, T)
        neg_sim = cos(c[:, :, None, :], negs) / cfg.temperature  # (B, T, K)
        logits = jnp.concatenate([pos_sim[..., None], neg_sim], axis=-1)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.zeros((b, t), jnp.int32)
        )
        contrastive = jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1)
        diversity = jnp.mean(
            (cfg.n_entries - perplexity) / cfg.n_entries
        )
        loss = contrastive + cfg.diversity_weight * diversity
        return loss, (model_state, {"contrastive": contrastive,
                                    "diversity": diversity})


class Wav2Vec2ForCTC(nn.Module):
    """Fine-tuning head (reference ``wav2vec2/model.py Wav2VecCtc`` /
    fairseq ``Wav2VecEncoder``): the pretrained feature encoder + context
    network with a linear CTC vocabulary projection on top. Pretrained
    parameters drop in under the ``w2v`` subtree."""

    cfg: Wav2Vec2Config
    vocab_size: int = 32  # blank + chars (reference letter vocab)
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.w2v = Wav2Vec2(self.cfg, self.dtype)
        self.head = nn.Dense(self.vocab_size, dtype=jnp.float32)

    def __call__(self, audio, mask=None, deterministic: bool = True):
        z = self.w2v.features(audio)
        if mask is None:
            mask = jnp.zeros(z.shape[:2], bool)
        x = self.w2v.contextualize(z, mask, deterministic)
        return jax.nn.log_softmax(self.head(x.astype(jnp.float32)), axis=-1)


@dataclass
class Wav2Vec2CtcTask:
    """Fine-tuning task (reference ``wav2vec2/train.py`` finetune stage).

    Batch: ``audio`` (B, T), ``frame_paddings`` (B, frames) 1=pad,
    ``labels`` (B, L), ``label_paddings`` (B, L) 1=pad. Time-masking
    (SpecAugment role) is applied with ``mask_prob`` during training —
    the reference masks spans at fine-tune time too (``apply_mask``).
    """

    cfg: Wav2Vec2Config = Wav2Vec2Config()
    vocab_size: int = 32
    dtype: Any = jnp.bfloat16
    mask_prob: float = 0.05

    def __post_init__(self):
        self.model = Wav2Vec2ForCTC(self.cfg, self.vocab_size, self.dtype)

    def init(self, rng, audio_len=16000, batch=2, pretrained=None):
        """``pretrained``: params from Wav2Vec2Task pretraining — grafted
        under ``w2v`` (the reference's --w2v_path checkpoint load)."""
        r1, r2 = jax.random.split(rng)
        audio = jnp.zeros((batch, audio_len))
        params = self.model.init(
            {"params": r1, "dropout": r2}, audio, deterministic=True,
        )["params"]
        if pretrained is not None:
            params = dict(params, w2v=pretrained)
        return params, {}

    def _n_frames(self, t):
        for _, k, s in self.cfg.conv_layers:
            t = (t - k) // s + 1
        return t

    def loss_fn(self, params, model_state, batch, rng):
        frames = batch["frame_paddings"].shape[1]
        r_mask, r_drop = jax.random.split(rng)
        # span time-masking on the fly (device-side Bernoulli starts)
        mask = jax.random.bernoulli(
            r_mask, self.mask_prob, (batch["audio"].shape[0], frames)
        )
        logp = self.model.apply(
            {"params": params}, batch["audio"], mask, deterministic=False,
            rngs={"dropout": r_drop},
        )
        import optax as _optax

        per_seq = _optax.ctc_loss(
            logp, batch["frame_paddings"].astype(jnp.float32),
            batch["labels"], batch["label_paddings"].astype(jnp.float32),
        )
        loss = jnp.mean(per_seq)
        return loss, (model_state, {})
