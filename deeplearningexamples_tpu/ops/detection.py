"""Detection core ops: ROIAlign, device NMS, IoU, proposal matching.

TPU-native equivalents of the reference's detection CUDA kernels:

- ``roi_align``: ``PyTorch/Segmentation/MaskRCNN/pytorch/maskrcnn_benchmark/
  csrc/cuda/ROIAlign_cuda.cu`` — here a vectorized gather + bilinear
  interpolation (exact same sampling-grid math, fp32).
- ``batched_nms``: ``csrc/cuda/nms.cu`` and EfficientDet's NMS — the CUDA
  version builds a bitmask matrix; on TPU an iterative select-and-suppress
  loop over a fixed ``max_out`` keeps shapes static and runs on the VPU.
- ``match_proposals``: ``csrc/cuda/match_proposals.cu`` (the Matcher with
  BELOW_LOW/BETWEEN thresholds + allow_low_quality) as pure jnp.
- ``box_iou``: pairwise IoU (xyxy).

All ops are jit-safe (static shapes), fp32, batched where the reference
batches. Golden tests vs numpy oracles in ``tests/test_detection_ops.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["box_iou", "roi_align", "batched_nms", "match_proposals",
           "encode_boxes", "decode_boxes"]

BELOW_LOW_THRESHOLD = -1
BETWEEN_THRESHOLDS = -2


def box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise IoU. a (N, 4), b (M, 4) in xyxy -> (N, M) fp32."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _bilinear(feat: jax.Array, y: jax.Array, x: jax.Array) -> jax.Array:
    """feat (H, W, C); y, x (...,) fp32 pixel coords -> (..., C).

    Matches ROIAlign_cuda.cu's ``bilinear_interpolate``: out-of-range
    samples contribute 0; coords in [-1, 0] clamp to 0.
    """
    h, w, _ = feat.shape
    oob = (y < -1.0) | (y > h) | (x < -1.0) | (x > w)
    y = jnp.clip(y, 0.0, h - 1.0)
    x = jnp.clip(x, 0.0, w - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = y - y0.astype(jnp.float32)
    lx = x - x0.astype(jnp.float32)
    hy, hx = 1.0 - ly, 1.0 - lx

    def at(yy, xx):
        return feat[yy, xx]  # advanced indexing -> gather

    val = (
        at(y0, x0) * (hy * hx)[..., None]
        + at(y0, x1) * (hy * lx)[..., None]
        + at(y1, x0) * (ly * hx)[..., None]
        + at(y1, x1) * (ly * lx)[..., None]
    )
    return jnp.where(oob[..., None], 0.0, val)


@functools.partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def roi_align(
    features: jax.Array,
    boxes: jax.Array,
    *,
    output_size: int = 7,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
) -> jax.Array:
    """ROIAlign, single feature level.

    features (H, W, C); boxes (R, 4) xyxy in image coords ->
    (R, output_size, output_size, C). Same sampling-grid math as
    ``ROIAlign_cuda.cu`` (aligned=False convention: no half-pixel offset).
    """
    features = features.astype(jnp.float32)
    boxes = boxes.astype(jnp.float32) * spatial_scale
    n = output_size
    sr = sampling_ratio

    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / n
    bin_h = roi_h / n

    # sample grid: (R, n, n, sr, sr)
    iy = (jnp.arange(sr, dtype=jnp.float32) + 0.5) / sr  # within-bin offsets
    ph = jnp.arange(n, dtype=jnp.float32)
    # y coords: y1 + (ph + iy) * bin_h
    ys = (y1[:, None, None] + (ph[None, :, None] + iy[None, None, :])
          * bin_h[:, None, None])  # (R, n, sr)
    xs = (x1[:, None, None] + (ph[None, :, None] + iy[None, None, :])
          * bin_w[:, None, None])  # (R, n, sr)

    yy = ys[:, :, None, :, None]  # (R, n, 1, sr, 1)
    xx = xs[:, None, :, None, :]  # (R, 1, n, 1, sr)
    yy = jnp.broadcast_to(yy, ys.shape[:1] + (n, n, sr, sr))
    xx = jnp.broadcast_to(xx, ys.shape[:1] + (n, n, sr, sr))
    vals = _bilinear(features, yy, xx)  # (R, n, n, sr, sr, C)
    return jnp.mean(vals, axis=(3, 4))


@functools.partial(jax.jit, static_argnames=("max_out",))
def batched_nms(
    boxes: jax.Array,
    scores: jax.Array,
    *,
    iou_threshold: float = 0.5,
    max_out: int = 100,
    score_threshold: float = -jnp.inf,
) -> tuple[jax.Array, jax.Array]:
    """Greedy NMS with static output size.

    boxes (N, 4) xyxy, scores (N,) -> (indices (max_out,), valid (max_out,)).
    Pads with -1 indices when fewer than ``max_out`` survive. Equivalent to
    torchvision/caffe2 ``nms`` (reference ``csrc/cuda/nms.cu``) truncated to
    the top ``max_out`` picks.
    """
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)
    live = scores > score_threshold

    def body(state, _):
        live, = state
        masked = jnp.where(live, scores, -jnp.inf)
        best = jnp.argmax(masked)
        ok = masked[best] > -jnp.inf
        suppress = iou[best] > iou_threshold
        live = live & ~suppress & (jnp.arange(n) != best)
        return (live,), (jnp.where(ok, best, -1), ok)

    (_,), (idx, valid) = jax.lax.scan(body, (live,), None, length=max_out)
    return idx.astype(jnp.int32), valid


def encode_boxes(
    anchors: jax.Array, gt: jax.Array,
    weights: tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
) -> jax.Array:
    """Faster-RCNN box encoding: gt (N, 4) xyxy vs anchors (N, 4) -> deltas.

    Same parametrization as the reference ``BoxCoder.encode``
    (``maskrcnn_benchmark/modeling/box_coder.py``): (dx, dy, dw, dh)
    scaled by per-coordinate ``weights`` (RPN uses 1s; ROI box head 10/10/5/5).
    """
    anchors = anchors.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    # clamp: padded/degenerate reference boxes (e.g. dead ROI slots) must
    # not emit NaN — masked-out NaNs still poison gradients through where
    aw = jnp.maximum(anchors[..., 2] - anchors[..., 0], 1e-3)
    ah = jnp.maximum(anchors[..., 3] - anchors[..., 1], 1e-3)
    ax = anchors[..., 0] + aw / 2
    ay = anchors[..., 1] + ah / 2
    gw = jnp.maximum(gt[..., 2] - gt[..., 0], 1e-3)
    gh = jnp.maximum(gt[..., 3] - gt[..., 1], 1e-3)
    gx = gt[..., 0] + gw / 2
    gy = gt[..., 1] + gh / 2
    wx, wy, ww, wh = weights
    return jnp.stack([
        wx * (gx - ax) / aw, wy * (gy - ay) / ah,
        ww * jnp.log(gw / aw), wh * jnp.log(gh / ah),
    ], axis=-1)


def decode_boxes(
    anchors: jax.Array, deltas: jax.Array,
    weights: tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
) -> jax.Array:
    """Inverse of :func:`encode_boxes` (reference ``BoxCoder.decode``);
    dw/dh clamped as the reference clamps to log(1000/16)."""
    anchors = anchors.astype(jnp.float32)
    deltas = deltas.astype(jnp.float32)
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + aw / 2
    ay = anchors[..., 1] + ah / 2
    wx, wy, ww, wh = weights
    clamp = 4.135  # log(1000/16), reference box_coder.py bbox_xform_clip
    cx = deltas[..., 0] / wx * aw + ax
    cy = deltas[..., 1] / wy * ah + ay
    w = jnp.exp(jnp.clip(deltas[..., 2] / ww, -clamp, clamp)) * aw
    h = jnp.exp(jnp.clip(deltas[..., 3] / wh, -clamp, clamp)) * ah
    return jnp.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    )


def match_proposals(
    iou: jax.Array,
    *,
    high_threshold: float = 0.7,
    low_threshold: float = 0.3,
    allow_low_quality: bool = True,
) -> jax.Array:
    """Reference Matcher (``match_proposals.cu`` / ``matcher.py``).

    iou (G, A): G ground-truth boxes x A anchors. Returns (A,) int32: the
    matched gt index per anchor, or BELOW_LOW_THRESHOLD (-1) /
    BETWEEN_THRESHOLDS (-2). ``allow_low_quality`` force-matches, for every
    gt, all anchors tied for its best IoU.
    """
    vals = jnp.max(iou, axis=0)
    matches = jnp.argmax(iou, axis=0).astype(jnp.int32)
    out = jnp.where(vals < low_threshold, BELOW_LOW_THRESHOLD, matches)
    out = jnp.where(
        (vals >= low_threshold) & (vals < high_threshold),
        BETWEEN_THRESHOLDS, out,
    )
    if allow_low_quality:
        best_per_gt = jnp.max(iou, axis=1, keepdims=True)  # (G, 1)
        is_best = (iou == best_per_gt) & (best_per_gt > 0)
        forced = jnp.any(is_best, axis=0)
        out = jnp.where(forced, matches, out)
    return out
