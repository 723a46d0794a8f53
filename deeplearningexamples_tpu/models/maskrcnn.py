"""Mask R-CNN — ResNet-FPN backbone, RPN, ROI box + mask heads.

TPU-native re-design of the reference Mask R-CNN
(``PyTorch/Segmentation/MaskRCNN/pytorch/maskrcnn_benchmark/``). The
reference leans on bespoke CUDA kernels — ``csrc/cuda/ROIAlign_cuda.cu``,
``nms.cu``, ``match_proposals.cu``, ``generate_mask_targets.cu`` — all of
which are pure-jnp static-shape ops here (``ops/detection.py``).

Mapping (reference file -> here):
- ``modeling/backbone/fpn.py``            -> :class:`FPN`
- ``modeling/rpn/rpn.py`` (RPNHead)       -> :class:`RPNHead`
- ``modeling/rpn/anchor_generator.py``    -> :func:`fpn_anchors`
- ``modeling/rpn/inference.py``           -> :meth:`MaskRCNNTask._proposals`
- ``modeling/balanced_positive_negative_sampler.py`` -> :func:`_random_subset`
  (static-shape: uniform noise + mask bias + ``top_k`` picks a uniformly
  random fixed-size subset, instead of host-side randperm)
- ``modeling/roi_heads/box_head``         -> :class:`BoxHead` + loss
- ``modeling/roi_heads/mask_head``        -> :class:`MaskHead` + loss
  (mask targets come from ``roi_align`` over dense per-instance grids,
  replacing the polygon-rasterizing ``generate_mask_targets.cu``)

TPU-first choices: every stage has static shapes (fixed top-k proposal
counts, fixed pos/neg sample slots with validity masks normalized by live
count), per-image logic is ``vmap``-ed over the batch, multi-level ROIAlign
computes all levels and selects by the FPN level formula (4 static gathers
beat dynamic partitioning on TPU), bf16 convs with fp32 losses.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.detection import (
    batched_nms,
    box_iou,
    decode_boxes,
    encode_boxes,
    match_proposals,
    roi_align,
)
from .convnets.resnet import ARCHS, ResNet

__all__ = ["MaskRCNNConfig", "MaskRCNN", "MaskRCNNTask", "fpn_anchors"]

# reference box_coder weights (config defaults): RPN 1s, ROI heads 10/10/5/5
ROI_BOX_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


@dataclass(frozen=True)
class MaskRCNNConfig:
    backbone: str = "resnet50"
    image_size: int = 800  # square, static (reference pads to divisible)
    num_classes: int = 81  # includes background at index 0 (COCO: 80 + bg)
    fpn_width: int = 256
    # anchors: one size per level P2..P6 (32*2^k), 3 aspect ratios
    aspect_ratios: tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_base: float = 32.0
    # RPN (reference e2e_mask_rcnn_R_50_FPN_1x.yaml)
    rpn_pre_nms_top_n: int = 1000  # per level (reference: 2000 train FPN)
    rpn_post_nms_top_n: int = 512  # proposals kept per image
    rpn_nms_thresh: float = 0.7
    rpn_batch_per_image: int = 256
    rpn_pos_fraction: float = 0.5
    # ROI heads
    roi_batch_per_image: int = 128  # reference 512; smaller default fits tests
    roi_pos_fraction: float = 0.25
    mask_resolution: int = 28
    head_fc_dim: int = 1024

    @property
    def num_anchors(self) -> int:
        return len(self.aspect_ratios)

    @property
    def strides(self) -> tuple[int, ...]:
        return (4, 8, 16, 32, 64)  # P2..P6


def fpn_anchors(cfg: MaskRCNNConfig) -> list[np.ndarray]:
    """Per-level anchors, xyxy image coords (reference anchor_generator.py:
    sizes (32, 64, 128, 256, 512) on strides (4, 8, 16, 32, 64))."""
    out = []
    for k, stride in enumerate(cfg.strides):
        size = cfg.anchor_base * 2**k
        n = cfg.image_size // stride
        ctr = (np.arange(n, dtype=np.float32) + 0.5) * stride
        cy, cx = np.meshgrid(ctr, ctr, indexing="ij")
        level = []
        for ar in cfg.aspect_ratios:
            w = size * np.sqrt(1.0 / ar)
            h = size * np.sqrt(ar)
            level.append(np.stack([
                cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2
            ], axis=-1))
        # (n, n, A, 4) -> (n*n*A, 4), anchors fastest within a cell
        out.append(np.stack(level, axis=2).reshape(-1, 4).astype(np.float32))
    return out


class FPN(nn.Module):
    """Top-down feature pyramid (reference ``backbone/fpn.py``): lateral
    1x1 on C2..C5, nearest-neighbor top-down sum, 3x3 output convs,
    P6 = stride-2 max-pool of P5 (``LastLevelMaxPool``)."""

    width: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats):
        n = len(feats)  # C2..C5
        laterals = [
            nn.Conv(self.width, (1, 1), dtype=self.dtype, name=f"lateral_{i}")(x)
            for i, x in enumerate(feats)
        ]
        for i in range(n - 2, -1, -1):
            b, h, w, c = laterals[i].shape
            up = jax.image.resize(laterals[i + 1], (b, h, w, c), "nearest")
            laterals[i] = laterals[i] + up
        outs = [
            nn.Conv(self.width, (3, 3), dtype=self.dtype, name=f"out_{i}")(x)
            for i, x in enumerate(laterals)
        ]
        outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return outs  # P2..P6


class RPNHead(nn.Module):
    """Shared RPN head (reference ``rpn.py RPNHead``): 3x3 conv + relu,
    1x1 objectness + 1x1 box deltas, applied to every level."""

    num_anchors: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats):
        conv = nn.Conv(feats[0].shape[-1], (3, 3), dtype=self.dtype, name="conv")
        logit = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype, name="logits")
        delta = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                        name="deltas")
        logits, deltas = [], []
        for x in feats:
            t = nn.relu(conv(x))
            b = x.shape[0]
            logits.append(logit(t).reshape(b, -1).astype(jnp.float32))
            deltas.append(delta(t).reshape(b, -1, 4).astype(jnp.float32))
        return logits, deltas  # per level: (B, HWA), (B, HWA, 4)


class BoxHead(nn.Module):
    """ROI box head (reference ``roi_heads/box_head``): 2 FC + cls/box."""

    num_classes: int
    fc_dim: int = 1024
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # (R, 7, 7, C)
        x = x.reshape(x.shape[0], -1).astype(self.dtype)
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc6")(x))
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc7")(x))
        cls = nn.Dense(self.num_classes, dtype=jnp.float32, name="cls")(x)
        box = nn.Dense(self.num_classes * 4, dtype=jnp.float32, name="box")(x)
        return cls, box.reshape(x.shape[0], self.num_classes, 4)


class MaskHead(nn.Module):
    """ROI mask head (reference ``roi_heads/mask_head``): 4 convs,
    2x deconv, per-class 1x1 predictor."""

    num_classes: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # (R, 14, 14, C)
        x = x.astype(self.dtype)
        for i in range(4):
            x = nn.relu(nn.Conv(256, (3, 3), dtype=self.dtype,
                                name=f"fcn{i}")(x))
        x = nn.relu(nn.ConvTranspose(256, (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name="deconv")(x))
        return nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                       name="predict")(x)  # (R, 28, 28, K)


class MaskRCNN(nn.Module):
    """Backbone + FPN + heads. Heads are exposed as methods so the task can
    run the two-stage control flow (proposals between them) outside."""

    cfg: MaskRCNNConfig
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.backbone = ResNet(ARCHS[self.cfg.backbone], dtype=self.dtype)
        self.fpn = FPN(self.cfg.fpn_width, self.dtype)
        self.rpn_head = RPNHead(self.cfg.num_anchors, self.dtype)
        self.box_head = BoxHead(self.cfg.num_classes, self.cfg.head_fc_dim,
                                self.dtype)
        self.mask_head = MaskHead(self.cfg.num_classes, self.dtype)

    def features(self, images, train: bool = True):
        c = self.backbone(images, train=train, return_features=True)
        return self.fpn(c)  # P2..P6

    def rpn(self, feats):
        return self.rpn_head(feats)

    def roi_box(self, pooled):
        return self.box_head(pooled)

    def roi_mask(self, pooled):
        return self.mask_head(pooled)

    def __call__(self, images, train: bool = True):
        """Init-only path: touches every submodule once."""
        feats = self.features(images, train)
        logits, deltas = self.rpn(feats)
        w = self.cfg.fpn_width
        pooled7 = jnp.zeros((1, 7, 7, w), jnp.float32)
        pooled14 = jnp.zeros((1, 14, 14, w), jnp.float32)
        cls, box = self.roi_box(pooled7)
        masks = self.roi_mask(pooled14)
        return logits, deltas, cls, box, masks


def _random_subset(rng, mask, k):
    """Pick up to ``k`` uniformly random True positions of ``mask``.

    Static-shape replacement for the reference's ``randperm``-based
    BalancedPositiveNegativeSampler: uniform noise + 1 on masked entries,
    ``top_k`` — ties broken randomly, so any size-k subset of the True set
    is equally likely. Returns (idx (k,), ok (k,) bool)."""
    noise = jax.random.uniform(rng, mask.shape) + mask.astype(jnp.float32)
    val, idx = jax.lax.top_k(noise, k)
    return idx, val >= 1.0


def _smooth_l1(err, beta):
    a = jnp.abs(err)
    return jnp.where(a < beta, 0.5 * a * a / beta, a - 0.5 * beta)


def _roi_level(boxes, min_level=0, max_level=3):
    """FPN level per ROI (reference ``poolers.py LevelMapper``):
    k = floor(4 + log2(sqrt(area)/224)), returned relative to P2=0."""
    w = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1.0)
    h = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1.0)
    k = jnp.floor(4 + jnp.log2(jnp.sqrt(w * h) / 224.0 + 1e-8)) - 2
    return jnp.clip(k, min_level, max_level).astype(jnp.int32)


def _multilevel_roi_align(feats, boxes, output_size, strides):
    """ROIAlign over P2..P5 with per-ROI level selection. Computes all four
    levels (static shapes, MXU-friendly) and selects — on TPU this beats a
    dynamic partition, and ROI counts are small relative to the backbone."""
    level = _roi_level(boxes)
    out = None
    for lv in range(4):
        pooled = roi_align(feats[lv], boxes, output_size=output_size,
                           spatial_scale=1.0 / strides[lv])
        sel = (level == lv)[:, None, None, None]
        out = pooled * sel if out is None else out + pooled * sel
    return out


@dataclass
class MaskRCNNTask:
    """Two-stage training task. Batch keys: ``image`` (B, S, S, 3),
    ``boxes`` (B, G, 4) xyxy, ``labels`` (B, G) in [0, K-1) (category ids,
    background NOT included — shifted by +1 internally), ``valid`` (B, G),
    ``masks`` (B, G, Mg, Mg) per-instance binary grids over the full image
    (dense stand-in for COCO polygons; ``Mg`` any fixed resolution)."""

    cfg: MaskRCNNConfig = field(default_factory=MaskRCNNConfig)
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        self.model = MaskRCNN(self.cfg, self.dtype)
        self.anchors = [jnp.asarray(a) for a in fpn_anchors(self.cfg)]
        self.all_anchors = jnp.concatenate(self.anchors, axis=0)

    def init(self, rng, batch: int = 1):
        s = self.cfg.image_size
        imgs = jnp.zeros((batch, s, s, 3), jnp.float32)
        variables = self.model.init(rng, imgs, train=False)
        return variables["params"], variables.get("batch_stats", {})

    # ---------------- proposals (reference rpn/inference.py) ----------

    def _proposals_one(self, logits, deltas):
        """Per-image: per-level top-k, decode, NMS across levels.
        logits: list of (HWA,), deltas: list of (HWA, 4)."""
        cfg = self.cfg
        boxes_all, scores_all = [], []
        for lv in range(5):
            k = min(cfg.rpn_pre_nms_top_n, logits[lv].shape[0])
            score, idx = jax.lax.top_k(logits[lv], k)
            boxes = decode_boxes(self.anchors[lv][idx], deltas[lv][idx])
            boxes = jnp.clip(boxes, 0.0, cfg.image_size)
            boxes_all.append(boxes)
            scores_all.append(score)
        boxes = jnp.concatenate(boxes_all, axis=0)
        scores = jnp.concatenate(scores_all, axis=0)
        # drop degenerate boxes (reference remove_small_boxes min_size=0)
        ok = ((boxes[:, 2] - boxes[:, 0]) > 1e-3) & \
             ((boxes[:, 3] - boxes[:, 1]) > 1e-3)
        scores = jnp.where(ok, scores, -jnp.inf)
        idx, valid = batched_nms(boxes, scores,
                                 iou_threshold=cfg.rpn_nms_thresh,
                                 max_out=cfg.rpn_post_nms_top_n)
        safe = jnp.clip(idx, 0)
        return boxes[safe], valid

    # ---------------- losses ------------------------------------------

    def _rpn_loss_one(self, rng, logits, deltas, gt_boxes, gt_valid):
        """Per-image RPN loss (reference ``rpn/loss.py RPNLossComputation``)."""
        cfg = self.cfg
        iou = box_iou(gt_boxes, self.all_anchors)
        iou = jnp.where(gt_valid[:, None], iou, -1.0)
        match = match_proposals(iou, high_threshold=0.7, low_threshold=0.3,
                                allow_low_quality=True)
        pos = match >= 0
        neg = match == -1
        n_pos = int(cfg.rpn_batch_per_image * cfg.rpn_pos_fraction)
        rp, rn = jax.random.split(rng)
        pos_idx, pos_ok = _random_subset(rp, pos, n_pos)
        neg_idx, neg_ok = _random_subset(rn, neg,
                                         cfg.rpn_batch_per_image - n_pos)
        total = jnp.sum(pos_ok) + jnp.sum(neg_ok)

        obj = jax.nn.log_sigmoid(logits)
        not_obj = jax.nn.log_sigmoid(-logits)
        cls_loss = (
            -jnp.sum(jnp.where(pos_ok, obj[pos_idx], 0.0))
            - jnp.sum(jnp.where(neg_ok, not_obj[neg_idx], 0.0))
        ) / jnp.maximum(total, 1.0)

        safe_gt = jnp.clip(match[pos_idx], 0)
        target = encode_boxes(self.all_anchors[pos_idx], gt_boxes[safe_gt])
        err = jnp.where(pos_ok[:, None], deltas[pos_idx] - target, 0.0)
        box_loss = jnp.sum(_smooth_l1(err, 1.0 / 9.0)) \
            / jnp.maximum(total, 1.0)
        return cls_loss, box_loss

    def _sample_rois_one(self, rng, proposals, prop_valid, gt_boxes,
                         gt_labels, gt_valid):
        """Match + subsample proposals (reference ``roi_heads/box_head/
        loss.py``). GT boxes are appended to the proposal set (reference
        ``add_gt_proposals``)."""
        cfg = self.cfg
        proposals = jnp.concatenate([proposals, gt_boxes], axis=0)
        prop_valid = jnp.concatenate([prop_valid, gt_valid], axis=0)
        iou = box_iou(gt_boxes, proposals)
        iou = jnp.where(gt_valid[:, None], iou, -1.0)
        iou = jnp.where(prop_valid[None, :], iou, -1.0)
        match = match_proposals(iou, high_threshold=0.5, low_threshold=0.5,
                                allow_low_quality=False)
        pos = match >= 0
        neg = (match == -1) & prop_valid
        n_pos = int(cfg.roi_batch_per_image * cfg.roi_pos_fraction)
        rp, rn = jax.random.split(rng)
        pos_idx, pos_ok = _random_subset(rp, pos, n_pos)
        neg_idx, neg_ok = _random_subset(rn, neg,
                                         cfg.roi_batch_per_image - n_pos)
        idx = jnp.concatenate([pos_idx, neg_idx])
        ok = jnp.concatenate([pos_ok, neg_ok])
        is_pos = jnp.concatenate(
            [pos_ok, jnp.zeros_like(neg_ok)]
        )
        gt_i = jnp.clip(match[idx], 0)
        rois = proposals[idx]
        # class labels: gt category + 1 (background = 0)
        cls_t = jnp.where(is_pos, gt_labels[gt_i] + 1, 0)
        cls_t = jnp.where(ok, cls_t, -1)  # -1 = dead slot, excluded
        box_t = encode_boxes(rois, gt_boxes[gt_i], ROI_BOX_WEIGHTS)
        return rois, gt_i, cls_t, box_t, is_pos, ok

    def loss_fn(self, params, model_state, batch, rng):
        cfg = self.cfg
        variables = {"params": params}
        if model_state:
            variables["batch_stats"] = model_state

        feats, mutated = self.model.apply(
            variables, batch["image"], train=True,
            method=MaskRCNN.features,
            mutable=["batch_stats"] if model_state else [],
        )
        new_ms = mutated.get("batch_stats", model_state) if model_state \
            else model_state
        rpn_logits, rpn_deltas = self.model.apply(
            variables, feats, method=MaskRCNN.rpn
        )

        b = batch["image"].shape[0]
        rngs = jax.random.split(rng, 2 * b + 1)
        rpn_rngs, roi_rngs = rngs[:b], rngs[b:2 * b]

        # --- RPN loss (vmapped per image)
        flat_logits = jnp.concatenate(rpn_logits, axis=1)  # (B, A_total)
        flat_deltas = jnp.concatenate(rpn_deltas, axis=1)
        rpn_cls, rpn_box = jax.vmap(self._rpn_loss_one)(
            rpn_rngs, flat_logits, flat_deltas, batch["boxes"], batch["valid"]
        )

        # --- proposals (no grad through RPN outputs, reference detaches)
        prop, prop_valid = jax.vmap(self._proposals_one)(
            [jax.lax.stop_gradient(x) for x in rpn_logits],
            [jax.lax.stop_gradient(x) for x in rpn_deltas],
        )
        rois, gt_i, cls_t, box_t, is_pos, ok = jax.vmap(self._sample_rois_one)(
            roi_rngs, prop, prop_valid, batch["boxes"],
            batch["labels"], batch["valid"],
        )

        # --- ROI box head over all images' rois at once
        R = rois.shape[1]
        pooled = jax.vmap(
            lambda f, r: _multilevel_roi_align(f, r, 7, cfg.strides)
        )([f for f in feats[:4]], rois)  # (B, R, 7, 7, C)
        variables2 = {"params": params}
        if model_state:
            variables2["batch_stats"] = new_ms
        cls_logits, box_deltas = self.model.apply(
            variables2, pooled.reshape(b * R, 7, 7, -1),
            method=MaskRCNN.roi_box,
        )
        cls_logits = cls_logits.reshape(b, R, -1)
        box_deltas = box_deltas.reshape(b, R, cfg.num_classes, 4)

        live = cls_t >= 0
        n_live = jnp.maximum(jnp.sum(live), 1.0)
        logp = jax.nn.log_softmax(cls_logits, axis=-1)
        cls_loss = -jnp.sum(
            jnp.where(live, jnp.take_along_axis(
                logp, jnp.clip(cls_t, 0)[..., None], axis=-1
            )[..., 0], 0.0)
        ) / n_live
        # box regression: the slot of the target class (reference selects
        # class-specific deltas), smooth-L1, normalized by live rois
        sel = jnp.clip(cls_t, 0)[..., None, None]
        pred_box = jnp.take_along_axis(box_deltas, sel, axis=2)[:, :, 0]
        # zero the error (not the loss) on dead slots: where() after a NaN
        # still backprops NaN cotangents
        err = jnp.where(is_pos[..., None], pred_box - box_t, 0.0)
        box_loss = jnp.sum(_smooth_l1(err, 1.0)) / n_live

        # --- mask head on positive rois only (slots 0..n_pos)
        n_pos_k = int(cfg.roi_batch_per_image * cfg.roi_pos_fraction)
        mrois = rois[:, :n_pos_k]
        mgt = gt_i[:, :n_pos_k]
        mok = is_pos[:, :n_pos_k]
        mcls = jnp.clip(cls_t[:, :n_pos_k], 0)
        pooled14 = jax.vmap(
            lambda f, r: _multilevel_roi_align(f, r, 14, cfg.strides)
        )([f for f in feats[:4]], mrois)
        mask_logits = self.model.apply(
            variables2, pooled14.reshape(b * n_pos_k, 14, 14, -1),
            method=MaskRCNN.roi_mask,
        ).reshape(b, n_pos_k, cfg.mask_resolution, cfg.mask_resolution, -1)
        mask_logits = jnp.take_along_axis(
            mask_logits, mcls[:, :, None, None, None], axis=-1
        )[..., 0]

        # mask targets: crop each matched instance grid to the ROI
        mg = batch["masks"].shape[-1]
        scale = mg / cfg.image_size

        def targets_one(masks, gt_idx, rois_i):
            inst = masks[gt_idx][..., None].astype(jnp.float32)  # (P, mg, mg, 1)
            crop = jax.vmap(
                lambda m, r: roi_align(
                    m, r[None], output_size=cfg.mask_resolution,
                    spatial_scale=scale,
                )[0, ..., 0]
            )(inst, rois_i)
            return (crop >= 0.5).astype(jnp.float32)

        mask_t = jax.vmap(targets_one)(batch["masks"], mgt, mrois)
        mbce = optax_sigmoid_bce(mask_logits, mask_t)
        mask_loss = jnp.sum(
            jnp.where(mok[:, :, None, None], mbce, 0.0)
        ) / (jnp.maximum(jnp.sum(mok), 1.0) * cfg.mask_resolution**2)

        loss = (jnp.mean(rpn_cls) + jnp.mean(rpn_box)
                + cls_loss + box_loss + mask_loss)
        metrics = {
            "rpn_cls": jnp.mean(rpn_cls), "rpn_box": jnp.mean(rpn_box),
            "cls_loss": cls_loss, "box_loss": box_loss,
            "mask_loss": mask_loss,
        }
        return loss, (new_ms, metrics)

    # ---------------- inference ---------------------------------------

    def predict(self, params, model_state, images, *, max_out=100,
                score_threshold=0.05, iou_threshold=0.5, with_masks=True):
        """Detections per image: boxes, scores, labels (category ids),
        valid, and optionally (max_out, 28, 28) sigmoid masks."""
        cfg = self.cfg
        variables = {"params": params}
        if model_state:
            variables["batch_stats"] = model_state
        feats = self.model.apply(variables, images, train=False,
                                 method=MaskRCNN.features)
        rpn_logits, rpn_deltas = self.model.apply(
            variables, feats, method=MaskRCNN.rpn
        )
        prop, prop_valid = jax.vmap(self._proposals_one)(
            rpn_logits, rpn_deltas
        )
        b, R = prop.shape[:2]
        pooled = jax.vmap(
            lambda f, r: _multilevel_roi_align(f, r, 7, cfg.strides)
        )([f for f in feats[:4]], prop)
        cls_logits, box_deltas = self.model.apply(
            variables, pooled.reshape(b * R, 7, 7, -1),
            method=MaskRCNN.roi_box,
        )
        cls_logits = cls_logits.reshape(b, R, -1)
        box_deltas = box_deltas.reshape(b, R, cfg.num_classes, 4)

        def one(feats_i, prop_i, valid_i, cls_i, box_i):
            probs = jax.nn.softmax(cls_i, axis=-1)
            score = jnp.max(probs[:, 1:], axis=-1)
            label = jnp.argmax(probs[:, 1:], axis=-1)  # category id
            sel = (label + 1)[:, None, None]
            deltas = jnp.take_along_axis(box_i, sel, axis=1)[:, 0]
            boxes = decode_boxes(prop_i, deltas, ROI_BOX_WEIGHTS)
            boxes = jnp.clip(boxes, 0.0, cfg.image_size)
            score = jnp.where(valid_i, score, 0.0)
            # class-aware NMS: offset boxes by class so classes don't suppress
            shifted = boxes + (label * (cfg.image_size + 1))[:, None]
            idx, det_valid = batched_nms(
                shifted, score, iou_threshold=iou_threshold, max_out=max_out,
                score_threshold=score_threshold,
            )
            safe = jnp.clip(idx, 0)
            det_boxes = boxes[safe]
            out = (det_boxes, score[safe], label[safe], det_valid)
            if with_masks:
                pooled14 = _multilevel_roi_align(
                    feats_i, det_boxes, 14, cfg.strides
                )
                mask = self.model.apply(variables, pooled14,
                                        method=MaskRCNN.roi_mask)
                mcls = (label[safe] + 1)[:, None, None, None]
                mask = jnp.take_along_axis(mask, mcls, axis=-1)[..., 0]
                out = out + (jax.nn.sigmoid(mask),)
            return out

        return jax.vmap(one)([f for f in feats[:4]], prop, prop_valid,
                             cls_logits, box_deltas)


def optax_sigmoid_bce(logits, labels):
    """Elementwise BCE-with-logits (stable form)."""
    return jnp.clip(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
