"""EfficientNet family (B0/B4, widese variants).

Re-design of the reference EfficientNet
(``PyTorch/Classification/ConvNets/image_classification/models/
efficientnet.py``): ``EffNetArch.scale`` compound width/depth scaling (:99),
``MBConvBlock`` (:384-452 — expand 1x1, depthwise kxk, squeeze-excite,
project 1x1, stochastic-depth residual), swish activations, 1280-channel
head. NHWC bf16; BN in fp32 statistics.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import SqueezeExcite

__all__ = ["EfficientNet", "EffNetArch", "EFFNET_ARCHS"]


@dataclass(frozen=True)
class EffNetArch:
    width_coeff: float = 1.0
    depth_coeff: float = 1.0
    resolution: int = 224
    dropout: float = 0.2
    survival_prob: float = 0.8  # stochastic depth (reference drop_connect)
    se_ratio: float = 0.25
    widese: bool = False  # widese variants: SE width scales with width_coeff

    # base (B0) stage settings
    kernels: tuple[int, ...] = (3, 3, 5, 3, 5, 5, 3)
    widths: tuple[int, ...] = (16, 24, 40, 80, 112, 192, 320)
    depths: tuple[int, ...] = (1, 2, 2, 3, 3, 4, 1)
    strides: tuple[int, ...] = (1, 2, 2, 2, 1, 2, 1)
    expands: tuple[int, ...] = (1, 6, 6, 6, 6, 6, 6)

    def scaled_width(self, w: int) -> int:
        """Round-to-8 width scaling (reference EffNetArch.scale)."""
        w = w * self.width_coeff
        new_w = max(8, int(w + 4) // 8 * 8)
        if new_w < 0.9 * w:
            new_w += 8
        return new_w

    def scaled_depth(self, d: int) -> int:
        return int(math.ceil(d * self.depth_coeff))


EFFNET_ARCHS = {
    "efficientnet-b0": EffNetArch(),
    "efficientnet-b4": EffNetArch(
        width_coeff=1.4, depth_coeff=1.8, resolution=380, dropout=0.4
    ),
    "efficientnet-widese-b0": EffNetArch(widese=True),
    "efficientnet-widese-b4": EffNetArch(
        width_coeff=1.4, depth_coeff=1.8, resolution=380, dropout=0.4, widese=True
    ),
}


class MBConvBlock(nn.Module):
    arch: EffNetArch
    kernel: int
    in_ch: int
    out_ch: int
    expand: int
    stride: int
    survival_prob: float
    dtype: Any
    quantized: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        if self.quantized:
            from .quant import QATConv
        conv = partial(QATConv if self.quantized else nn.Conv,
                       use_bias=False, dtype=self.dtype,
                       kernel_init=nn.initializers.variance_scaling(
                           2.0, "fan_out", "normal"))
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-3, dtype=self.dtype)
        residual = x
        mid = self.in_ch * self.expand
        y = x
        if self.expand != 1:
            y = conv(mid, (1, 1), name="expand_conv")(y)
            y = norm(name="expand_bn")(y)
            y = nn.swish(y)
        # explicit symmetric (k-1)//2 padding (reference LayerBuilder.conv,
        # common.py:48) — flax "SAME" pads asymmetrically under stride 2
        dpad = (self.kernel - 1) // 2
        y = conv(mid, (self.kernel, self.kernel),
                 strides=(self.stride, self.stride),
                 padding=((dpad, dpad), (dpad, dpad)),
                 feature_group_count=mid, name="depthwise_conv")(y)
        y = norm(name="depthwise_bn")(y)
        y = nn.swish(y)
        if self.arch.se_ratio:
            # reference: squeeze width from in_ch (widese: from mid); the SE
            # hidden activation is the builder activation = SiLU for EffNet
            # (common.py:146-165 with builder.activation())
            base = mid if self.arch.widese else self.in_ch
            squeezed = max(1, int(base * self.arch.se_ratio))
            y = SqueezeExcite(features=squeezed, act=nn.swish,
                              dtype=self.dtype, name="se")(y)
        y = conv(self.out_ch, (1, 1), name="project_conv")(y)
        y = norm(name="project_bn")(y)
        if self.stride == 1 and self.in_ch == self.out_ch:
            if train and self.survival_prob < 1.0:
                rng = self.make_rng("dropout")
                keep = jax.random.bernoulli(
                    rng, self.survival_prob, (y.shape[0], 1, 1, 1)
                )
                y = jnp.where(keep, y / self.survival_prob, 0.0)
            y = y + residual
        return y


class EfficientNet(nn.Module):
    arch: EffNetArch = EffNetArch()
    num_classes: int = 1000
    dtype: Any = jnp.bfloat16
    features_only: bool = False  # return {p3, p4, p5} taps (EfficientDet)
    quantized: bool = False  # QAT fake-quant convs (reference EffNet QAT)

    @nn.compact
    def __call__(self, x, train: bool = True):
        arch = self.arch
        if self.quantized:
            from .quant import QATConv
        conv = partial(QATConv if self.quantized else nn.Conv,
                       use_bias=False, dtype=self.dtype,
                       kernel_init=nn.initializers.variance_scaling(
                           2.0, "fan_out", "normal"))
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-3, dtype=self.dtype)

        x = x.astype(self.dtype)
        stem = arch.scaled_width(32)
        x = conv(stem, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                 name="stem_conv")(x)
        x = norm(name="stem_bn")(x)
        x = nn.swish(x)

        in_ch = stem
        total_blocks = sum(arch.scaled_depth(d) for d in arch.depths)
        block_idx = 0
        feats = {}
        for s, (k, w, d, st, e) in enumerate(
            zip(arch.kernels, arch.widths, arch.depths, arch.strides, arch.expands)
        ):
            out_ch = arch.scaled_width(w)
            for j in range(arch.scaled_depth(d)):
                # linearly-decayed survival prob over depth (reference)
                sp = 1.0 - (1.0 - arch.survival_prob) * block_idx / max(
                    total_blocks - 1, 1
                )
                x = MBConvBlock(
                    arch, k, in_ch, out_ch, e, st if j == 0 else 1, sp,
                    self.dtype, self.quantized, name=f"stage{s}_{j}",
                )(x, train)
                in_ch = out_ch
                block_idx += 1
            # multi-scale taps for detection FPNs (stride 8/16/32 after the
            # stem's 2): EfficientDet's backbone feature picks
            if s == 2:
                feats["p3"] = x
            elif s == 4:
                feats["p4"] = x
            elif s == 6:
                feats["p5"] = x
        if self.features_only:
            return feats

        head = arch.scaled_width(1280)
        x = conv(head, (1, 1), name="head_conv")(x)
        x = norm(name="head_bn")(x)
        x = nn.swish(x)
        x = jnp.mean(x, axis=(1, 2), dtype=jnp.float32)
        x = nn.Dropout(arch.dropout)(x, deterministic=not train)
        x = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)
        return x
