"""nnU-Net-style dynamic U-Net for medical segmentation.

Breadth recipe (reference ``PyTorch/Segmentation/nnUNet/nnunet/nn_unet.py``
+ ``models/unet.py``): encoder/decoder U-Net whose depth and kernel/stride
schedule derive from the patch size (the "dynamic" in nnU-Net), instance
norm + leaky ReLU, deep supervision heads, and the dice + cross-entropy
compound loss. 2D and 3D variants share the code path (spatial rank is a
config choice); NHWC/NDHWC layouts.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["UNetConfig", "DynUNet", "UNetTask", "dice_loss", "focal_loss",
           "BratsUNet3D"]


@dataclass(frozen=True)
class UNetConfig:
    spatial_rank: int = 2  # 2 -> NHWC images, 3 -> NDHWC volumes
    in_channels: int = 1
    n_classes: int = 3
    base_filters: int = 32
    depth: int = 4  # number of downsamplings (nnU-Net derives from patch size)
    max_filters: int = 320
    deep_supervision: bool = False


def dice_loss(logits, labels, eps: float = 1e-5):
    """Soft dice over classes (reference ``nnunet/loss.py`` Dice):
    logits (B, *S, C); labels (B, *S) int."""
    c = logits.shape[-1]
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    y = jax.nn.one_hot(labels, c)
    axes = tuple(range(1, p.ndim - 1))
    inter = jnp.sum(p * y, axis=axes)
    denom = jnp.sum(p, axis=axes) + jnp.sum(y, axis=axes)
    dice = (2 * inter + eps) / (denom + eps)
    return 1.0 - jnp.mean(dice)


def focal_loss(logits, labels, alpha: float = 0.25, gamma: float = 2.0):
    """Multi-class focal loss (the EfficientDet/RetinaNet criterion —
    reference ``Efficientdet/effdet/csrc/focal_loss``; a plain jnp expression
    fuses under XLA, no custom kernel needed on TPU)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    pt = jnp.exp(-ce)
    return jnp.mean(alpha * (1.0 - pt) ** gamma * ce)


class ConvBlock(nn.Module):
    filters: int
    rank: int
    stride: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        for i, s in enumerate((self.stride, 1)):
            x = nn.Conv(self.filters, (3,) * self.rank, strides=(s,) * self.rank,
                        use_bias=False, dtype=self.dtype, name=f"conv{i}")(x)
            # instance norm: per-sample, per-channel spatial normalization
            axes = tuple(range(1, x.ndim - 1))
            mu = jnp.mean(x, axis=axes, keepdims=True)
            var = jnp.var(x.astype(jnp.float32), axis=axes, keepdims=True)
            scale = self.param(f"in_scale{i}", nn.initializers.ones,
                               (self.filters,))
            bias = self.param(f"in_bias{i}", nn.initializers.zeros,
                              (self.filters,))
            x = ((x - mu) * jax.lax.rsqrt(var + 1e-5).astype(x.dtype)
                 * scale.astype(x.dtype) + bias.astype(x.dtype))
            x = nn.leaky_relu(x, 0.01)
        return x


class DynUNet(nn.Module):
    cfg: UNetConfig = UNetConfig()
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        r = cfg.spatial_rank
        filters = [
            min(cfg.base_filters * 2**i, cfg.max_filters)
            for i in range(cfg.depth + 1)
        ]
        x = x.astype(self.dtype)
        skips = []
        x = ConvBlock(filters[0], r, 1, self.dtype, name="input_block")(x)
        for d in range(cfg.depth):
            skips.append(x)
            x = ConvBlock(filters[d + 1], r, 2, self.dtype, name=f"down_{d}")(x)
        heads = []
        for d in reversed(range(cfg.depth)):
            x = nn.ConvTranspose(filters[d], (2,) * r, strides=(2,) * r,
                                 dtype=self.dtype, name=f"up_{d}")(x)
            x = jnp.concatenate([x, skips[d]], axis=-1)
            x = ConvBlock(filters[d], r, 1, self.dtype, name=f"dec_{d}")(x)
            if cfg.deep_supervision and 0 < d <= 2:
                heads.append(
                    nn.Conv(cfg.n_classes, (1,) * r, dtype=jnp.float32,
                            name=f"ds_head_{d}")(x.astype(jnp.float32))
                )
        logits = nn.Conv(cfg.n_classes, (1,) * r, dtype=jnp.float32,
                         name="head")(x.astype(jnp.float32))
        if cfg.deep_supervision and train:
            return logits, heads
        return logits


@dataclass
class UNetTask:
    cfg: UNetConfig = UNetConfig()
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        self.model = DynUNet(self.cfg, self.dtype)

    def init(self, rng, patch=64, batch=1):
        shape = (batch,) + (patch,) * self.cfg.spatial_rank + (self.cfg.in_channels,)
        variables = self.model.init(rng, jnp.zeros(shape))
        return variables["params"], {}

    def loss_fn(self, params, model_state, batch, rng):
        out = self.model.apply({"params": params}, batch["image"], train=True)
        if isinstance(out, tuple):
            logits, heads = out
        else:
            logits, heads = out, []
        labels = batch["label"]
        loss = dice_loss(logits, labels) + jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), labels
            )
        )
        # deep supervision at half weight per scale (reference weighting)
        for i, h in enumerate(heads):
            factor = 2 ** (i + 1)
            ds_labels = labels[:, ::factor, ::factor] if self.cfg.spatial_rank == 2 \
                else labels[:, ::factor, ::factor, ::factor]
            # heads come in decoder order; match spatial dims defensively
            if h.shape[1] == ds_labels.shape[1]:
                loss = loss + 0.5 ** (i + 1) * dice_loss(h, ds_labels)
        return loss, (model_state, {})

    def metric_fn(self, params, model_state, batch):
        logits = self.model.apply({"params": params}, batch["image"])
        pred = jnp.argmax(logits, -1)
        c = self.cfg.n_classes
        y = jax.nn.one_hot(batch["label"], c)
        p = jax.nn.one_hot(pred, c)
        axes = tuple(range(1, p.ndim - 1))
        inter = jnp.sum(p * y, axis=axes)
        denom = jnp.sum(p, axis=axes) + jnp.sum(y, axis=axes)
        dice = jnp.mean((2 * inter + 1e-5) / (denom + 1e-5))
        return {"dice": dice}


# ---------------------------------------------------------------------------
# BraTS22 UNet3D — the reference's on-disk network
# (``nnUNet/nnunet/brats22_model.py``; the default path uses MONAI's DynUNet,
# an external package — DynUNet above covers that role). Faithful details:
# pre-norm ConvLayer (InstanceNorm over the INPUT channels, then conv, then
# ReLU), an InputBlock whose second conv has no norm, trilinear
# align_corners=True upsampling with skip concat, and deep-supervision heads
# on the two next-to-last decoder levels.
# ---------------------------------------------------------------------------


def _instance_norm(x, scale, bias, eps=1e-5):
    axes = tuple(range(1, x.ndim - 1))
    mu = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x.astype(jnp.float32), axis=axes, keepdims=True)
    return ((x - mu) * jax.lax.rsqrt(var + eps).astype(x.dtype)
            * scale.astype(x.dtype) + bias.astype(x.dtype))


def _upsample_align_corners(x, factor=2):
    """Separable linear interpolation with torch's align_corners=True grid
    (jax.image.resize uses the half-pixel convention, which differs)."""
    for ax in range(1, x.ndim - 1):
        n_in = x.shape[ax]
        n_out = n_in * factor
        if n_in == 1:
            reps = [1] * x.ndim
            reps[ax] = n_out
            x = jnp.tile(x, reps)
            continue
        pos = jnp.arange(n_out) * (n_in - 1) / (n_out - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_in - 1)
        w = (pos - lo).astype(x.dtype)
        xl = jnp.take(x, lo, axis=ax)
        xh = jnp.take(x, hi, axis=ax)
        shape = [1] * x.ndim
        shape[ax] = n_out
        x = xl + (xh - xl) * w.reshape(shape)
    return x


class _BratsConvLayer(nn.Module):
    out_ch: int
    kernel: int
    stride: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        # norm over the INPUT channels, then conv, then relu
        # (brats22_model.py ConvLayer)
        scale = self.param("in_scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("in_bias", nn.initializers.zeros, (x.shape[-1],))
        x = _instance_norm(x, scale, bias)
        pad = (self.kernel - self.stride + 1) // 2
        x = nn.Conv(self.out_ch, (self.kernel,) * 3,
                    strides=(self.stride,) * 3, padding=[(pad, pad)] * 3,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        return nn.relu(x)


class _BratsConvBlock(nn.Module):
    out_ch: int
    kernel: int
    stride: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        x = _BratsConvLayer(self.out_ch, self.kernel, self.stride,
                            self.dtype, name="conv1")(x)
        return _BratsConvLayer(self.out_ch, self.kernel, 1, self.dtype,
                               name="conv2")(x)


class BratsUNet3D(nn.Module):
    """brats22_model.UNet3D (NDHWC). ``kernels``/``strides`` follow the
    reference's per-level lists; filters are the fixed [64, 128, ...]
    schedule truncated to ``len(strides)``."""

    kernels: tuple[int, ...] = (3, 3, 3, 3)
    strides: tuple[int, ...] = (1, 2, 2, 2)
    in_channels: int = 5
    n_classes: int = 3
    deep_supervision: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        filters = [64, 128, 256, 512, 768, 1024, 2048][: len(self.strides)]
        x = x.astype(self.dtype)

        # InputBlock: conv-norm-relu-conv-relu (second conv unnormalized)
        x = nn.Conv(filters[0], (3,) * 3, padding=[(1, 1)] * 3,
                    use_bias=False, dtype=self.dtype, name="in_conv1")(x)
        scale = self.param("in_scale", nn.initializers.ones, (filters[0],))
        bias = self.param("in_bias", nn.initializers.zeros, (filters[0],))
        x = nn.relu(_instance_norm(x, scale, bias))
        x = nn.Conv(filters[0], (3,) * 3, padding=[(1, 1)] * 3,
                    use_bias=False, dtype=self.dtype, name="in_conv2")(x)
        x = nn.relu(x)

        skips = [x]
        for i, (k, s, f) in enumerate(zip(self.kernels[1:-1],
                                          self.strides[1:-1], filters[1:])):
            x = _BratsConvBlock(f, k, s, self.dtype, name=f"down_{i}")(x)
            skips.append(x)
        x = _BratsConvBlock(filters[-1], self.kernels[-1], self.strides[-1],
                            self.dtype, name="bottleneck")(x)

        decoder_outputs = []
        up_filters = filters[:-1][::-1]
        for i, f in enumerate(up_filters):
            x = _upsample_align_corners(x)
            x = jnp.concatenate([x, skips[-(i + 1)]], axis=-1)
            x = _BratsConvBlock(f, self.kernels[1:][::-1][i], 1, self.dtype,
                                name=f"up_{i}")(x)
            decoder_outputs.append(x)
        out = nn.Conv(self.n_classes, (1,) * 3, dtype=jnp.float32,
                      name="out_conv")(x.astype(jnp.float32))
        if train and self.deep_supervision:
            heads = [out]
            for j, dec in enumerate(decoder_outputs[-3:-1][::-1]):
                heads.append(nn.Conv(self.n_classes, (1,) * 3,
                                     dtype=jnp.float32,
                                     name=f"ds_{j}")(dec.astype(jnp.float32)))
            return heads
        return out
