"""SSD300 detector.

Re-design of the reference SSD300 (``PyTorch/Detection/SSD/ssd/model.py``):
ResNet-50 backbone truncated after conv4 with the stride-1 trick on
conv4_block1 (:20-48 — keeps the first feature map at 38x38), six extra
feature blocks (:55-85), and 3x3 loc/conf heads over anchor counts
[4, 6, 6, 6, 4, 4] (:87-102). Output is (B, 8732, 4) loc and
(B, 8732, num_classes) conf, NHWC bf16 throughout.

The MultiBox loss (reference ``Loss`` :132-196) lives in ``task.py``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..convnets.resnet import Bottleneck

__all__ = ["SSD300", "SSDResNetBackbone"]

ANCHORS_PER_LOC = (4, 6, 6, 6, 4, 4)
EXTRA_CHANNELS = (1024, 512, 512, 256, 256, 256)
EXTRA_MID = (256, 256, 128, 128, 128)


class SSDResNetBackbone(nn.Module):
    """ResNet-50 layers 1-3 with layer3 (conv4) first-block stride 1.

    Mirrors the reference's backbone surgery (``ssd/model.py:20-48``):
    a 300x300 input yields a 38x38x1024 feature map.
    """

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = partial(
            nn.Conv, use_bias=False, dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
        )
        norm = partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.9,
            epsilon=1e-5, dtype=self.dtype,
        )
        x = x.astype(self.dtype)
        x = conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        cfg = dict(expansion=4, cardinality=1, base_width=64,
                   use_se=False, se_squeeze=16, conv=conv, norm=norm,
                   dtype=self.dtype)
        for j in range(3):  # layer1, stride 1
            x = Bottleneck(width=64, stride=1, name=f"layer1_{j}", **cfg)(x)
        for j in range(4):  # layer2, stride 2
            x = Bottleneck(width=128, stride=2 if j == 0 else 1,
                           name=f"layer2_{j}", **cfg)(x)
        for j in range(6):  # layer3: stride-1 trick on block 0
            x = Bottleneck(width=256, stride=1, name=f"layer3_{j}", **cfg)(x)
        return x  # (B, 38, 38, 1024)


class SSD300(nn.Module):
    num_classes: int = 81
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = partial(
            nn.Conv, dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(1.0, "fan_out", "uniform"),
        )
        norm = partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.9,
            epsilon=1e-5, dtype=self.dtype,
        )

        feat = SSDResNetBackbone(self.dtype, name="backbone")(x, train)
        features = [feat]
        # extra blocks: 1x1 reduce -> 3x3 (stride 2 for maps 2-4, valid for 5-6)
        # explicit pad-1 on the stride-2 convs (torch padding=1 semantics;
        # XLA SAME would pad right-only on even extents — half-pixel shift)
        strides = [2, 2, 2, 1, 1]
        paddings = [[(1, 1), (1, 1)]] * 3 + ["VALID", "VALID"]
        for i, (mid, out) in enumerate(zip(EXTRA_MID, EXTRA_CHANNELS[1:])):
            y = conv(mid, (1, 1), use_bias=False, name=f"extra{i}_conv1")(features[-1])
            y = norm(name=f"extra{i}_bn1")(y)
            y = nn.relu(y)
            y = conv(out, (3, 3), strides=(strides[i], strides[i]),
                     padding=paddings[i], use_bias=False, name=f"extra{i}_conv2")(y)
            y = norm(name=f"extra{i}_bn2")(y)
            y = nn.relu(y)
            features.append(y)

        locs, confs = [], []
        for i, (f, na) in enumerate(zip(features, ANCHORS_PER_LOC)):
            b = f.shape[0]
            loc = conv(na * 4, (3, 3), name=f"loc{i}")(f)
            conf = conv(na * self.num_classes, (3, 3), name=f"conf{i}")(f)
            # (B, H, W, A*4) -> (B, H*W*A, 4); anchor layout must match
            # dboxes300_coco ordering: anchor-major then row-major cells
            h, w = loc.shape[1], loc.shape[2]
            loc = loc.reshape(b, h * w, na, 4).transpose(0, 2, 1, 3).reshape(b, -1, 4)
            conf = conf.reshape(b, h * w, na, self.num_classes)
            conf = conf.transpose(0, 2, 1, 3).reshape(b, -1, self.num_classes)
            locs.append(loc)
            confs.append(conf)

        loc = jnp.concatenate(locs, axis=1).astype(jnp.float32)
        conf = jnp.concatenate(confs, axis=1).astype(jnp.float32)
        return loc, conf
