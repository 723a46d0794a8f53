"""ResNet v1.5 family — ResNet-50, ResNeXt101-32x4d, SE-ResNeXt101-32x4d.

TPU-native re-design of the reference ConvNets models
(``PyTorch/Classification/ConvNets/image_classification/models/resnet.py``:
``ResNet`` :211-405, ``Bottleneck`` :107, ``SEBottleneck`` :178; arch
dataclasses :320-405). Key semantics preserved:

- **v1.5**: stride-2 lives on the 3x3 conv of the bottleneck, not the 1x1
  (the defining difference from v1, reference ``Bottleneck`` conv2 stride)
- cardinality/width for ResNeXt; squeeze-and-excitation for SE variants
  (``SqueezeAndExcitation`` ``models/common.py:146``)
- final BN gamma zero-init in residual branches (``last_bn_3`` init,
  reference trains with it for the 77.12% recipe)

TPU-first choices: NHWC layout (C on the 128-lane axis), bf16 compute with
fp32 BN statistics/params, ``flax.linen`` functional modules.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["ResNet", "resnet50", "resnext101_32x4d", "se_resnext101_32x4d", "ARCHS"]

ModuleDef = Any


@dataclass(frozen=True)
class ResNetArch:
    """Arch dataclass (reference ``resnet.py:320-405`` ``resnet_configs``)."""

    block: str = "bottleneck"  # bottleneck | basic
    layers: tuple[int, ...] = (3, 4, 6, 3)
    widths: tuple[int, ...] = (64, 128, 256, 512)
    expansion: int = 4
    cardinality: int = 1
    base_width: int = 64
    use_se: bool = False
    se_squeeze: int = 16


class SqueezeExcite(nn.Module):
    """Channel SE (reference ``models/common.py:146-188``). The hidden
    activation follows the host network's builder activation — ReLU for
    SE-ResNeXt, SiLU for EfficientNet. ``features`` (absolute squeeze
    width) takes precedence over the ``squeeze`` divisor."""

    squeeze: int = 0
    dtype: Any = jnp.float32
    features: int | None = None
    act: Any = nn.relu

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        hidden = self.features if self.features is not None else c // self.squeeze
        s = jnp.mean(x, axis=(1, 2), dtype=jnp.float32).astype(self.dtype)
        s = nn.Dense(hidden, dtype=self.dtype, name="squeeze")(s)
        s = self.act(s)
        s = nn.Dense(c, dtype=self.dtype, name="expand")(s)
        s = nn.sigmoid(s)
        return x * s[:, None, None, :]


class Bottleneck(nn.Module):
    width: int
    stride: int
    expansion: int
    cardinality: int
    base_width: int
    use_se: bool
    se_squeeze: int
    conv: ModuleDef
    norm: ModuleDef
    dtype: Any

    @nn.compact
    def __call__(self, x):
        residual = x
        out_ch = self.width * self.expansion
        d = int(self.width * (self.base_width / 64.0)) * self.cardinality

        y = self.conv(d, (1, 1), name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        # v1.5: stride on the 3x3. Explicit pad-1 (not SAME): XLA SAME pads
        # asymmetrically for stride 2 on even extents, which would shift
        # sampling positions vs the reference's symmetric torch padding.
        y = self.conv(
            d, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)],
            feature_group_count=self.cardinality, name="conv2",
        )(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = self.conv(out_ch, (1, 1), name="conv3")(y)
        # zero-init gamma on the block's last BN so residual starts as identity
        y = self.norm(scale_init=nn.initializers.zeros, name="bn3")(y)
        if self.use_se:
            y = SqueezeExcite(self.se_squeeze, dtype=self.dtype, name="se")(y)
        if residual.shape != y.shape:
            residual = self.conv(
                out_ch, (1, 1), strides=(self.stride, self.stride), name="downsample_conv"
            )(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class BasicBlock(nn.Module):
    width: int
    stride: int
    expansion: int
    cardinality: int
    base_width: int
    use_se: bool
    se_squeeze: int
    conv: ModuleDef
    norm: ModuleDef
    dtype: Any

    @nn.compact
    def __call__(self, x):
        residual = x
        out_ch = self.width * self.expansion
        y = self.conv(self.width, (3, 3), strides=(self.stride, self.stride),
                      padding=[(1, 1), (1, 1)], name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = self.conv(out_ch, (3, 3), padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = self.norm(scale_init=nn.initializers.zeros, name="bn2")(y)
        if self.use_se:
            y = SqueezeExcite(self.se_squeeze, dtype=self.dtype, name="se")(y)
        if residual.shape != y.shape:
            residual = self.conv(
                out_ch, (1, 1), strides=(self.stride, self.stride), name="downsample_conv"
            )(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    arch: ResNetArch = ResNetArch()
    num_classes: int = 1000
    dtype: Any = jnp.bfloat16
    quantized: bool = False  # QAT: int8 fake-quant convs (same param tree)

    @nn.compact
    def __call__(self, x, train: bool = True, return_features: bool = False):
        if self.quantized:
            from .quant import QATConv
        conv = partial(
            QATConv if self.quantized else nn.Conv,
            use_bias=False, dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
        )
        norm = partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.9,
            epsilon=1e-5, dtype=self.dtype, axis_name=None,
        )
        block_cls = Bottleneck if self.arch.block == "bottleneck" else BasicBlock

        x = x.astype(self.dtype)
        x = conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        features = []
        for i, (n_blocks, width) in enumerate(zip(self.arch.layers, self.arch.widths)):
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                x = block_cls(
                    width=width,
                    stride=stride,
                    expansion=self.arch.expansion,
                    cardinality=self.arch.cardinality,
                    base_width=self.arch.base_width,
                    use_se=self.arch.use_se,
                    se_squeeze=self.arch.se_squeeze,
                    conv=conv,
                    norm=norm,
                    dtype=self.dtype,
                    name=f"layer{i + 1}_{j}",
                )(x)
            features.append(x)

        if return_features:  # SSD backbone taps conv4 (features[2])
            return features

        x = jnp.mean(x, axis=(1, 2), dtype=jnp.float32)  # global avg pool in fp32
        x = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)
        return x


ARCHS: dict[str, ResNetArch] = {
    "resnet50": ResNetArch(),
    "resnet18": ResNetArch(block="basic", layers=(2, 2, 2, 2), expansion=1),
    "resnet34": ResNetArch(block="basic", layers=(3, 4, 6, 3), expansion=1),
    "resnet101": ResNetArch(layers=(3, 4, 23, 3)),
    "resnext101-32x4d": ResNetArch(layers=(3, 4, 23, 3), cardinality=32, base_width=4),
    "se-resnext101-32x4d": ResNetArch(
        layers=(3, 4, 23, 3), cardinality=32, base_width=4, use_se=True
    ),
}


def resnet50(num_classes: int = 1000, dtype=jnp.bfloat16) -> ResNet:
    return ResNet(ARCHS["resnet50"], num_classes, dtype)


def resnext101_32x4d(num_classes: int = 1000, dtype=jnp.bfloat16) -> ResNet:
    return ResNet(ARCHS["resnext101-32x4d"], num_classes, dtype)


def se_resnext101_32x4d(num_classes: int = 1000, dtype=jnp.bfloat16) -> ResNet:
    return ResNet(ARCHS["se-resnext101-32x4d"], num_classes, dtype)
