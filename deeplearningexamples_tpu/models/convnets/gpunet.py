"""GPUNet family — NAS-found convnets (GPUNet-0/1/2).

TPU-native re-design of the reference GPUNet
(``PyTorch/Classification/GPUNet/models/gpunet_modules.py``:
``Prologue`` :635, ``ConvBnAct`` :200, ``EdgeResidual`` (fused-IRB) :481,
``InvertedResidual`` (IRB) :350, ``Epilogue`` :667; layer lists from
``configs/batch1/GV100/{0.65,0.85,1.75}ms.json`` via
``gpunet_builder.py``). The reference builds the net from searched JSON
layer configs; here the three released architectures are encoded as
layer-spec tuples (the searched hyperparameters are data, the modules are
re-derived). Distilled (-D) variants are out of scope (they only change
the head/tail and training recipe).

Block semantics preserved exactly: IRB = 1x1 expand (BN+act) → depthwise
kxk (BN+act) → optional SE (squeeze width ``round(mid * 0.25/expansion)``,
``gpunet_modules.py:409-413``) → 1x1 project (BN, linear), residual iff
stride 1 and in==out; fused-IRB folds expand+depthwise into one dense kxk
conv (MXU-friendly — the same reason the EfficientNet-X/GPUNet searches
favor it on tensor cores applies to the MXU). BN eps 1e-3, epilogue
dropout 0.2, prologue act swish (``gpunet_builder.py:249`` —
``layerConfig.get("act", "swish")`` and the released configs carry no
head act key).

Padding matches the reference exactly: the prologue / ConvBnAct / IRB
depthwise convs use torch-style symmetric ``((s-1)+(k-1))//2`` padding
(``gpunet_modules.py:37-39`` via ``pad_type=""``), while fused-IRB
expansion convs use TF 'SAME' (``gpunet_builder.py:300`` passes
``pad_type="same"``) — flax's default.

TPU-first: NHWC, bf16 compute / fp32 BN + head, static shapes.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["GPUNet", "GPUNetArch", "GPUNET_ARCHS"]


def _make_divisible(v: float, divisor: int = 8) -> int:
    """timm ``make_divisible`` (reference ``gpunet_modules.py:129``)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


@dataclass(frozen=True)
class Layer:
    kind: str  # conv | fused_irb | irb
    out: int
    stride: int = 1
    expansion: int = 1
    kernel: int = 3
    act: str = "relu"
    se: bool = False


@dataclass(frozen=True)
class GPUNetArch:
    resolution: int
    stem: int
    layers: tuple[Layer, ...]


# searched layer lists (configs/batch1/GV100/*.json; README model table:
# GPUNet-0 = 0.65ms, GPUNet-1 = 0.85ms, GPUNet-2 = 1.75ms)
GPUNET_ARCHS: dict[str, GPUNetArch] = {
    "gpunet-0": GPUNetArch(320, 32, (
        Layer("conv", 32), Layer("conv", 32),
        Layer("fused_irb", 32, 2, 5, 3, "relu"),
        Layer("fused_irb", 32, 1, 5, 3, "relu"),
        Layer("fused_irb", 64, 2, 5, 3, "relu"),
        Layer("fused_irb", 64, 1, 5, 3, "relu"),
        Layer("fused_irb", 64, 1, 5, 3, "relu"),
        Layer("irb", 256, 2, 5, 3, "swish"),
        Layer("irb", 256, 1, 5, 3, "swish"),
        Layer("irb", 256, 1, 5, 3, "swish"),
        Layer("irb", 704, 2, 5, 3, "relu", True),
        Layer("irb", 704, 1, 5, 3, "relu", True),
    )),
    "gpunet-1": GPUNetArch(288, 24, (
        Layer("conv", 24),
        Layer("fused_irb", 64, 2, 4, 3, "swish"),
        Layer("fused_irb", 64, 1, 4, 3, "swish"),
        Layer("fused_irb", 96, 2, 4, 3, "swish"),
        Layer("fused_irb", 96, 1, 4, 3, "swish"),
        Layer("irb", 160, 2, 2, 3, "swish", True),
        Layer("irb", 288, 1, 5, 3, "relu"),
        Layer("irb", 288, 1, 5, 3, "relu"),
        Layer("irb", 288, 1, 5, 3, "relu"),
        Layer("irb", 288, 1, 5, 3, "relu"),
        Layer("irb", 448, 2, 4, 3, "relu", True),
        Layer("irb", 448, 1, 4, 3, "relu", True),
        Layer("irb", 448, 1, 4, 3, "relu", True),
        Layer("irb", 448, 1, 4, 3, "relu", True),
    )),
    "gpunet-2": GPUNetArch(384, 32, (
        Layer("conv", 32), Layer("conv", 32), Layer("conv", 32),
        Layer("fused_irb", 32, 2, 6, 5, "swish", True),
        Layer("fused_irb", 112, 2, 3, 3, "swish"),
        Layer("fused_irb", 112, 1, 3, 3, "swish"),
        Layer("fused_irb", 112, 1, 3, 3, "swish"),
        *[Layer("irb", 144, 2 if i == 0 else 1, 6, 3, "swish")
          for i in range(6)],
        *[Layer("irb", 160, 1, 3, 5, "relu") for _ in range(4)],
        *[Layer("irb", 224, 2 if i == 0 else 1, 3, 3, "swish", True)
          for i in range(8)],
        *[Layer("irb", 832, 1, 2, 5, "relu") for _ in range(7)],
    )),
}

_ACTS = {"relu": nn.relu, "swish": nn.swish}


class _SE(nn.Module):
    """SE with explicit squeeze width (reference timm SqueezeExcite with
    rd_ratio = 0.25 / expansion, i.e. squeeze ~= in_ch / 4)."""

    squeeze_ch: int
    act: Any
    dtype: Any

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), dtype=jnp.float32).astype(self.dtype)
        s = self.act(nn.Dense(self.squeeze_ch, dtype=self.dtype,
                              name="reduce")(s))
        s = nn.sigmoid(nn.Dense(c, dtype=self.dtype, name="expand")(s))
        return x * s[:, None, None, :]


class GPUNet(nn.Module):
    arch: GPUNetArch
    num_classes: int = 1000
    dtype: Any = jnp.bfloat16
    quantized: bool = False  # QAT: int8 fake-quant convs (same param tree)

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.quantized:
            from .quant import QATConv
        conv = partial(QATConv if self.quantized else nn.Conv,
                       use_bias=False, dtype=self.dtype,
                       kernel_init=nn.initializers.variance_scaling(
                           2.0, "fan_out", "normal"))
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-3, dtype=self.dtype)

        def tpad(k, s):  # torch symmetric padding (gpunet_modules.py:37-39)
            p = ((s - 1) + (k - 1)) // 2
            return ((p, p), (p, p))

        x = x.astype(self.dtype)
        # prologue: 3x3 s2 conv (torch pad 1) + BN + swish (builder default)
        x = conv(self.arch.stem, (3, 3), strides=(2, 2), padding=tpad(3, 2),
                 name="stem_conv")(x)
        x = nn.swish(norm(name="stem_bn")(x))

        in_ch = self.arch.stem
        for i, l in enumerate(self.arch.layers):
            act = _ACTS[l.act]
            p = f"l{i}"
            residual = x
            if l.kind == "conv":
                # ConvBnAct: no residual (reference :257), torch padding
                x = conv(l.out, (l.kernel, l.kernel),
                         strides=(l.stride, l.stride),
                         padding=tpad(l.kernel, l.stride),
                         name=f"{p}_conv")(x)
                x = act(norm(name=f"{p}_bn")(x))
            elif l.kind == "fused_irb":
                # EdgeResidual: TF 'SAME' dynamic padding (flax default)
                mid = _make_divisible(in_ch * l.expansion)
                x = conv(mid, (l.kernel, l.kernel),
                         strides=(l.stride, l.stride), name=f"{p}_exp")(x)
                x = act(norm(name=f"{p}_bn1")(x))
                if l.se:
                    x = _SE(round(mid * 0.25 / l.expansion), act, self.dtype,
                            name=f"{p}_se")(x)
                x = conv(l.out, (1, 1), name=f"{p}_proj")(x)
                x = norm(name=f"{p}_bn2")(x)
                if l.stride == 1 and in_ch == l.out:
                    x = x + residual
            else:  # irb
                mid = _make_divisible(in_ch * l.expansion)
                x = conv(mid, (1, 1), name=f"{p}_pw")(x)
                x = act(norm(name=f"{p}_bn1")(x))
                x = conv(mid, (l.kernel, l.kernel),
                         strides=(l.stride, l.stride),
                         padding=tpad(l.kernel, l.stride),
                         feature_group_count=mid, name=f"{p}_dw")(x)
                x = act(norm(name=f"{p}_bn2")(x))
                if l.se:
                    x = _SE(round(mid * 0.25 / l.expansion), act, self.dtype,
                            name=f"{p}_se")(x)
                x = conv(l.out, (1, 1), name=f"{p}_pwl")(x)
                x = norm(name=f"{p}_bn3")(x)
                if l.stride == 1 and in_ch == l.out:
                    x = x + residual
            in_ch = l.out

        # epilogue: 1x1 -> 1280, BN, relu, pool, dropout, fc
        x = conv(1280, (1, 1), name="head_conv")(x)
        x = nn.relu(norm(name="head_bn")(x))
        x = jnp.mean(x, axis=(1, 2), dtype=jnp.float32)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)
