"""EfficientDet — BiFPN detector over the EfficientNet backbone.

TPU-native re-design of the reference EfficientDet
(``PyTorch/Detection/Efficientdet/effdet/``): EfficientNet feature taps
(``efficientdet.py`` backbone indices), the BiFPN with fast-normalized
weighted fusion (``bifpn.py``), separable-conv class/box heads shared
across levels (``efficientdet.py HeadNet``), per-level anchors
(``anchors.py``: 3 octave scales x 3 aspect ratios), focal classification
loss + smooth-L1 box loss on matched anchors (``loss.py``; the focal-loss
CUDA kernel ``csrc/focal_loss`` is a plain fused jnp expression here), and
device-side NMS for inference (``ops/detection.py`` replaces ``csrc/nms``).

Static shapes throughout: matching pads to MAX_GT boxes per image; NMS
returns a fixed top-K. d0 configuration by default (BiFPN W=64, D=3,
head depth 3).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.detection import batched_nms, box_iou, match_proposals
from .convnets.efficientnet import EFFNET_ARCHS, EfficientNet
from .unet import focal_loss

__all__ = ["EfficientDetConfig", "EfficientDet", "EfficientDetTask",
           "efficientdet_anchors"]


@dataclass(frozen=True)
class EfficientDetConfig:
    backbone: str = "efficientnet-b0"
    image_size: int = 512
    num_classes: int = 90
    fpn_width: int = 64
    fpn_depth: int = 3
    head_depth: int = 3
    num_scales: int = 3
    aspect_ratios: tuple[tuple[float, float], ...] = (
        (1.0, 1.0), (1.4, 0.7), (0.7, 1.4))
    anchor_scale: float = 4.0
    min_level: int = 3
    max_level: int = 7

    @property
    def num_anchors(self) -> int:
        return self.num_scales * len(self.aspect_ratios)

    @property
    def num_levels(self) -> int:
        return self.max_level - self.min_level + 1


def efficientdet_anchors(cfg: EfficientDetConfig) -> np.ndarray:
    """All anchors, xyxy image coords (reference ``anchors.py:101-170``).
    Aspect "ratios" are (w_mult, h_mult) PAIRS — the published (1.4, 0.7)
    values, not sqrt(2)-derived — applied to the octave-scaled base size."""
    out = []
    for level in range(cfg.min_level, cfg.max_level + 1):
        stride = 2 ** level
        size = cfg.image_size // stride
        for y in range(size):
            for x in range(size):
                cy, cx = (y + 0.5) * stride, (x + 0.5) * stride
                for s in range(cfg.num_scales):
                    base = cfg.anchor_scale * stride * 2 ** (s / cfg.num_scales)
                    for wm, hm in cfg.aspect_ratios:
                        w = base * wm
                        h = base * hm
                        out.append([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])
    return np.asarray(out, np.float32)


class SeparableConv(nn.Module):
    """SeparableConv2d (reference ``model.py:77-103``): depthwise 3x3 (no
    bias) + pointwise 1x1; d0 sets redundant_bias=False so the pointwise
    bias exists only on the predict layers."""

    ch: int
    dtype: Any = jnp.bfloat16
    bias: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(x.shape[-1], (3, 3), feature_group_count=x.shape[-1],
                    use_bias=False, dtype=self.dtype, name="dw")(x)
        return nn.Conv(self.ch, (1, 1), use_bias=self.bias, dtype=self.dtype,
                       name="pw")(x)


def _maxpool2(x):
    # torch create_pool2d(k=3, s=2, pad_type='') pads k//2=1 symmetric
    return nn.max_pool(x, (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)))


def _upsample2(x, factor):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * factor, w * factor, c), "nearest")


class Resample(nn.Module):
    """ResampleFeatureMap (reference ``model.py:106-156``): 1x1 conv (+BN,
    apply_bn_for_resampling=True, no bias) when channels change, then
    max-pool / nearest-upsample by the reduction ratio (conv BEFORE the
    downsample — conv_after_downsample=False)."""

    out_ch: int
    ratio: float  # target_reduction / input_reduction
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                        dtype=self.dtype, name="conv")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        if self.ratio > 1:
            steps = int(np.log2(self.ratio))
            for _ in range(steps):
                x = _maxpool2(x)
        elif self.ratio < 1:
            x = _upsample2(x, int(1 / self.ratio))
        return x


# bifpn_fa_config nodes (reference config/model_config.py:430-444),
# reductions relative to base_reduction=8; offsets index the growing
# feature list [P3, P4, P5, P6, P7, node0, node1, ...]
_BIFPN_NODES = (
    (64, (3, 4)), (32, (2, 5)), (16, (1, 6)), (8, (0, 7)),
    (16, (1, 7, 8)), (32, (2, 6, 9)), (64, (3, 5, 10)), (128, (4, 11)),
)


class BiFPNLayer(nn.Module):
    """BiFpnLayer (reference ``model.py:213-259``): eight fusion nodes over
    the growing feature list, fast-attention weighting, swish ->
    separable-conv(+BN) after each combine; emits the last five nodes."""

    width: int
    reductions: tuple[int, ...]  # reduction of each incoming x entry
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool):
        x = list(feats)
        reds = list(self.reductions)
        for ni, (target_red, offsets) in enumerate(_BIFPN_NODES):
            nodes = []
            for off in offsets:
                r = Resample(self.width, target_red / reds[off], self.dtype,
                             name=f"node{ni}_resample_{off}")
                nodes.append(r(x[off], train))
            w = self.param(f"node{ni}_weights", nn.initializers.ones,
                           (len(offsets),), jnp.float32)
            w = nn.relu(w)
            fused = sum(wi * n for wi, n in zip(w, nodes)) / (jnp.sum(w) + 1e-4)
            y = nn.swish(fused.astype(self.dtype))
            y = SeparableConv(self.width, self.dtype,
                              name=f"node{ni}_conv")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype,
                             name=f"node{ni}_bn")(y)
            x.append(y)
            reds.append(target_red)
        return x[-5:]


class HeadNet(nn.Module):
    """Class/box head (reference ``model.py:322-375``): shared separable
    convs (no bias, no BN inside), per-level BN, swish; biased predict."""

    out_ch: int
    depth: int
    width: int
    num_levels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool):
        convs = [SeparableConv(self.width, self.dtype, name=f"conv_{i}")
                 for i in range(self.depth)]
        final = SeparableConv(self.out_ch, self.dtype, bias=True,
                              name="predict")
        outs = []
        for lvl, x in enumerate(feats):
            for i, conv in enumerate(convs):
                x = conv(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                 epsilon=1e-3, dtype=self.dtype,
                                 name=f"bn_{lvl}_{i}")(x)
                x = nn.swish(x)
            outs.append(final(x))
        return outs


class EfficientDet(nn.Module):
    cfg: EfficientDetConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, images, train: bool = True):
        cfg = self.cfg
        backbone = EfficientNet(EFFNET_ARCHS[cfg.backbone], dtype=self.dtype,
                                features_only=True, name="backbone")
        feats = backbone(images, train)
        x = [feats["p3"], feats["p4"], feats["p5"]]
        # extra pyramid levels (reference BiFpn resample, model.py:269-291):
        # P6 = conv+BN+pool of P5; P7 = pool of P6 (already fpn width)
        p6 = Resample(cfg.fpn_width, 2.0, self.dtype, name="resample_p6")(
            x[-1], train)
        p7 = Resample(cfg.fpn_width, 2.0, self.dtype, name="resample_p7")(
            p6, train)
        x += [p6, p7]

        reds = (8, 16, 32, 64, 128)
        for d in range(cfg.fpn_depth):
            x = BiFPNLayer(cfg.fpn_width, reds, self.dtype,
                           name=f"bifpn_{d}")(x, train)

        cls_outs = HeadNet(cfg.num_anchors * cfg.num_classes, cfg.head_depth,
                           cfg.fpn_width, cfg.num_levels, self.dtype,
                           name="class_net")(x, train)
        box_outs = HeadNet(cfg.num_anchors * 4, cfg.head_depth, cfg.fpn_width,
                           cfg.num_levels, self.dtype, name="box_net")(x, train)

        b = images.shape[0]
        cls = jnp.concatenate(
            [o.reshape(b, -1, cfg.num_classes).astype(jnp.float32)
             for o in cls_outs], axis=1,
        )
        box = jnp.concatenate(
            [o.reshape(b, -1, 4).astype(jnp.float32) for o in box_outs], axis=1
        )
        return cls, box  # (B, A, num_classes), (B, A, 4)


def _encode_boxes(anchors: jax.Array, gt: jax.Array) -> jax.Array:
    """Faster-RCNN box encoding (reference anchors.py decode inverse)."""
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = anchors[:, 0] + aw / 2
    ay = anchors[:, 1] + ah / 2
    gw = jnp.maximum(gt[:, 2] - gt[:, 0], 1e-3)
    gh = jnp.maximum(gt[:, 3] - gt[:, 1], 1e-3)
    gx = gt[:, 0] + gw / 2
    gy = gt[:, 1] + gh / 2
    return jnp.stack([
        (gx - ax) / aw, (gy - ay) / ah, jnp.log(gw / aw), jnp.log(gh / ah)
    ], axis=1)


def _decode_boxes(anchors: jax.Array, deltas: jax.Array) -> jax.Array:
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = anchors[:, 0] + aw / 2
    ay = anchors[:, 1] + ah / 2
    cx = deltas[:, 0] * aw + ax
    cy = deltas[:, 1] * ah + ay
    w = jnp.exp(jnp.clip(deltas[:, 2], -8, 8)) * aw
    h = jnp.exp(jnp.clip(deltas[:, 3], -8, 8)) * ah
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1)


@dataclass
class EfficientDetTask:
    cfg: EfficientDetConfig = EfficientDetConfig()
    dtype: Any = jnp.bfloat16
    max_gt: int = 32  # padded gt boxes per image

    def __post_init__(self):
        self.model = EfficientDet(self.cfg, self.dtype)
        self.anchors = jnp.asarray(efficientdet_anchors(self.cfg))

    def init(self, rng, batch: int = 2):
        s = self.cfg.image_size
        imgs = jnp.zeros((batch, s, s, 3), jnp.float32)
        variables = self.model.init(rng, imgs, train=False)
        return variables["params"], variables.get("batch_stats", {})

    def _targets(self, gt_boxes, gt_labels, gt_valid):
        """Per-image anchor targets. gt_boxes (G,4), labels (G,), valid (G,)."""
        iou = box_iou(gt_boxes, self.anchors)  # (G, A)
        iou = jnp.where(gt_valid[:, None], iou, -1.0)
        match = match_proposals(iou, high_threshold=0.5, low_threshold=0.4)
        pos = match >= 0
        ignore = match == -2
        safe = jnp.clip(match, 0)
        cls_t = jnp.where(pos, gt_labels[safe], -1)  # -1 = background
        box_t = _encode_boxes(self.anchors, gt_boxes[safe])
        return cls_t, box_t, pos, ignore

    def loss_fn(self, params, model_state, batch, rng):
        variables = {"params": params}
        if model_state:
            variables["batch_stats"] = model_state
        (cls, box), new_ms = self.model.apply(
            variables, batch["image"], train=True,
            mutable=["batch_stats"] if model_state else [],
            rngs={"dropout": rng},  # EffNet stochastic depth
        )
        cls_t, box_t, pos, ignore = jax.vmap(self._targets)(
            batch["boxes"], batch["labels"], batch["valid"]
        )
        n_pos = jnp.maximum(jnp.sum(pos), 1.0)
        # focal loss over anchors; background = all-zero one-hot
        onehot = jax.nn.one_hot(jnp.clip(cls_t, 0), self.cfg.num_classes)
        onehot = onehot * (cls_t >= 0)[..., None]
        p = jax.nn.sigmoid(cls)
        alpha, gamma = 0.25, 1.5
        pt = jnp.where(onehot > 0, p, 1 - p)
        a_t = jnp.where(onehot > 0, alpha, 1 - alpha)
        bce = -jnp.log(jnp.clip(pt, 1e-8))
        fl = a_t * (1 - pt) ** gamma * bce
        fl = jnp.where(ignore[..., None], 0.0, fl)
        cls_loss = jnp.sum(fl) / n_pos
        # huber box loss on positives (reference loss.py delta=0.1)
        err = box - box_t
        huber = jnp.where(jnp.abs(err) < 0.1,
                          0.5 * err**2 / 0.1, jnp.abs(err) - 0.05)
        box_loss = jnp.sum(jnp.where(pos[..., None], huber, 0.0)) / n_pos
        loss = cls_loss + 50.0 * box_loss
        ms = new_ms.get("batch_stats", model_state) if model_state else model_state
        return loss, (ms, {"cls_loss": cls_loss, "box_loss": box_loss})

    def predict(self, params, model_state, images, *, max_out=100,
                score_threshold=0.05, iou_threshold=0.5):
        variables = {"params": params}
        if model_state:
            variables["batch_stats"] = model_state
        cls, box = self.model.apply(variables, images, train=False)

        def one(cls_i, box_i):
            scores = jax.nn.sigmoid(cls_i)
            best = jnp.max(scores, axis=1)
            label = jnp.argmax(scores, axis=1)
            decoded = _decode_boxes(self.anchors, box_i)
            # per-class NMS (reference generate_detections runs NMS within
            # each class): offset boxes by class id so co-located objects of
            # different classes never suppress each other
            shifted = decoded + (
                label.astype(decoded.dtype) * (self.cfg.image_size + 1.0)
            )[:, None]
            idx, valid = batched_nms(
                shifted, best, iou_threshold=iou_threshold, max_out=max_out,
                score_threshold=score_threshold,
            )
            safe = jnp.clip(idx, 0)
            return (decoded[safe], best[safe], label[safe], valid)

        return jax.vmap(one)(cls, box)
