"""Jasper/QuartzNet-style CTC ASR.

Breadth recipes (reference ``PyTorch/SpeechRecognition/{Jasper,QuartzNet}``):
stacked 1D-conv blocks with dense residual connections, BN + ReLU + dropout,
trained with CTC over mel-filterbank features. QuartzNet is the same
topology with depthwise-separable convs (``separable=True``). Greedy CTC
decoding included; the reference's DALI audio pipeline maps to the
``models/tts/audio.py`` mel frontend.
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

__all__ = ["JasperConfig", "Jasper", "JasperTask", "greedy_ctc_decode",
           "JasperBlock", "QUARTZNET_15x5", "JASPER_10x5DR"]


@dataclass(frozen=True)
class JasperBlock:
    repeats: int
    channels: int
    kernel: int
    dropout: float = 0.2
    residual: bool = True
    separable: bool = False
    stride: int = 1
    dilation: int = 1
    # reference residual_dense (jasper10x5dr yaml): residual convs from the
    # outputs of ALL previous dense blocks plus the stem input
    dense: bool = False


@dataclass(frozen=True)
class JasperConfig:
    """Jasper 5x3 by default; the published 10x5 doubles ``repeats_per_block``."""

    n_mels: int = 64
    vocab_size: int = 29  # blank + a-z + space + apostrophe
    blocks: tuple[JasperBlock, ...] = (
        JasperBlock(1, 256, 11, 0.2, residual=False, stride=2),
        JasperBlock(3, 256, 11),
        JasperBlock(3, 384, 13),
        JasperBlock(3, 512, 17),
        JasperBlock(3, 640, 21, 0.3),
        JasperBlock(3, 768, 25, 0.3),
        JasperBlock(1, 896, 29, 0.4, residual=False, dilation=2),
        JasperBlock(1, 1024, 1, 0.4, residual=False),
    )


class ConvBnRelu(nn.Module):
    ch: int
    kernel: int
    stride: int
    dilation: int
    separable: bool
    dtype: Any

    @nn.compact
    def __call__(self, x, train):
        # explicit symmetric padding = (k//2)*dilation, the reference's
        # get_same_padding (model.py:52-55) — flax "SAME" pads asymmetric
        # under stride 2, which would shift outputs by one sample
        pad = (self.kernel // 2) * self.dilation
        if self.separable:
            x = nn.Conv(x.shape[-1], (self.kernel,), strides=(self.stride,),
                        kernel_dilation=(self.dilation,), padding=((pad, pad),),
                        feature_group_count=x.shape[-1], use_bias=False,
                        dtype=self.dtype, name="dw")(x)
            x = nn.Conv(self.ch, (1,), use_bias=False, dtype=self.dtype,
                        name="pw")(x)
        else:
            x = nn.Conv(self.ch, (self.kernel,), strides=(self.stride,),
                        kernel_dilation=(self.dilation,), padding=((pad, pad),),
                        use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        return x


class Jasper(nn.Module):
    cfg: JasperConfig = JasperConfig()
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """feats (B, T, n_mels) -> log-probs (B, T', vocab).

        Mirrors the reference JasperBlock/JasperEncoder flow
        (``jasper/model.py:88-210``): repeat x conv+BN with act+dropout
        BETWEEN repeats (none after the last conv), 1x1 conv+BN residual
        adapters — one per dense pane — summed into the block output, then
        the block's act+dropout. ``dense`` blocks append their output to
        the pane list the way ``residual_dense`` accumulates ``xs``."""
        xs = [feats.astype(self.dtype)]  # pane list (reference ``out = [x]``)
        for bi, blk in enumerate(self.cfg.blocks):
            out = xs[-1]
            for r in range(blk.repeats):
                out = ConvBnRelu(blk.channels, blk.kernel, blk.stride,
                                 blk.dilation, blk.separable, self.dtype,
                                 name=f"b{bi}_{r}")(out, train)
                if r < blk.repeats - 1:
                    out = nn.relu(out)
                    out = RegenDropout(blk.dropout)(out, deterministic=not train)
            if blk.residual:
                # non-dense: reference indexes xs[0] (model.py:153-158);
                # xs is a singleton there so xs[0] == the conv input
                panes = xs if blk.dense else [xs[0]]
                for pi, pane in enumerate(panes):
                    res = ConvBnRelu(blk.channels, 1, 1, 1, False, self.dtype,
                                     name=f"b{bi}_res{pi}")(pane, train)
                    out = out + res
            out = nn.relu(out)
            out = RegenDropout(blk.dropout)(out, deterministic=not train)
            xs = xs + [out] if (blk.residual and blk.dense) else [out]
        logits = nn.Conv(self.cfg.vocab_size, (1,), dtype=jnp.float32,
                         name="head")(xs[-1].astype(jnp.float32))
        return jax.nn.log_softmax(logits, axis=-1)


def greedy_ctc_decode(log_probs: np.ndarray, blank: int = 0) -> list[list[int]]:
    """Collapse repeats, drop blanks (reference greedy decoder)."""
    out = []
    for seq in np.argmax(log_probs, axis=-1):
        toks, prev = [], -1
        for t in seq:
            if t != prev and t != blank:
                toks.append(int(t))
            prev = t
        out.append(toks)
    return out


@dataclass
class JasperTask:
    cfg: JasperConfig = JasperConfig()
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        self.model = Jasper(self.cfg, self.dtype)

    def init(self, rng, t=64, batch=2):
        x = jnp.zeros((batch, t, self.cfg.n_mels))
        variables = self.model.init(rng, x, train=False)
        params = variables["params"]
        return params, {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(self, params, model_state, batch, rng):
        """batch: feats (B,T,M), feat_paddings (B,T) 1=pad,
        labels (B,L), label_paddings (B,L) 1=pad."""
        logp, mutated = self.model.apply(
            {"params": params, **model_state}, batch["feats"], train=True,
            mutable=list(model_state.keys()) or False,
            rngs={"dropout": rng},
        )
        if not model_state:
            mutated = {}
        # time axis subsampled by stride 2 in block 0
        t_out = logp.shape[1]
        pad = batch["feat_paddings"][:, ::2][:, :t_out]
        loss = jnp.mean(
            optax.ctc_loss(logp, pad.astype(jnp.float32),
                           batch["labels"], batch["label_paddings"].astype(jnp.float32))
        )
        return loss, (dict(mutated), {})


# Jasper 10x5 dense-residual (reference
# ``Jasper/configs/jasper10x5dr_speedp-online_speca.yaml``): prologue k11
# stride 2, five filter tiers x2 blocks of 5 repeats with residual_dense,
# dilated epilogue.
JASPER_10x5DR = JasperConfig(
    blocks=(
        JasperBlock(1, 256, 11, 0.2, residual=False, stride=2),
        *[JasperBlock(5, 256, 11, 0.2, dense=True) for _ in range(2)],
        *[JasperBlock(5, 384, 13, 0.2, dense=True) for _ in range(2)],
        *[JasperBlock(5, 512, 17, 0.2, dense=True) for _ in range(2)],
        *[JasperBlock(5, 640, 21, 0.3, dense=True) for _ in range(2)],
        *[JasperBlock(5, 768, 25, 0.3, dense=True) for _ in range(2)],
        JasperBlock(1, 896, 29, 0.4, residual=False, dilation=2),
        JasperBlock(1, 1024, 1, 0.4, residual=False),
    ),
)


# QuartzNet-15x5 (reference ``QuartzNet/configs/quartznet15x5_speedp...``):
# time-separable convolutions make it 19x smaller than Jasper at similar
# WER. Prologue C1 (stride 2), five block groups repeated 3x with 5
# sub-convs each, epilogue C2 (dilated k87) + C3 (1x1 widening).
QUARTZNET_15x5 = JasperConfig(
    blocks=(
        JasperBlock(1, 256, 33, 0.0, residual=False, separable=True, stride=2),
        *[JasperBlock(5, 256, 33, 0.0, separable=True) for _ in range(3)],
        *[JasperBlock(5, 256, 39, 0.0, separable=True) for _ in range(3)],
        *[JasperBlock(5, 512, 51, 0.0, separable=True) for _ in range(3)],
        *[JasperBlock(5, 512, 63, 0.0, separable=True) for _ in range(3)],
        *[JasperBlock(5, 512, 75, 0.0, separable=True) for _ in range(3)],
        JasperBlock(1, 512, 87, 0.0, residual=False, separable=True,
                    dilation=2),
        JasperBlock(1, 1024, 1, 0.0, residual=False),
    ),
)
