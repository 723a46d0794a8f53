"""Golden tests for detection core ops vs numpy oracles.

The oracles re-implement the reference CUDA semantics in plain loops
(ROIAlign_cuda.cu bilinear sampling, nms.cu greedy suppression,
match_proposals.cu thresholds)."""

import jax.numpy as jnp
import numpy as np

from deeplearningexamples_tpu.ops.detection import (
    BELOW_LOW_THRESHOLD,
    BETWEEN_THRESHOLDS,
    batched_nms,
    box_iou,
    match_proposals,
    roi_align,
)


def _iou_np(a, b):
    n, m = len(a), len(b)
    out = np.zeros((n, m), np.float32)
    for i in range(n):
        for j in range(m):
            x1 = max(a[i, 0], b[j, 0]); y1 = max(a[i, 1], b[j, 1])
            x2 = min(a[i, 2], b[j, 2]); y2 = min(a[i, 3], b[j, 3])
            inter = max(0, x2 - x1) * max(0, y2 - y1)
            ar_a = (a[i, 2] - a[i, 0]) * (a[i, 3] - a[i, 1])
            ar_b = (b[j, 2] - b[j, 0]) * (b[j, 3] - b[j, 1])
            u = ar_a + ar_b - inter
            out[i, j] = inter / u if u > 0 else 0
    return out


def _bilinear_np(feat, y, x):
    h, w, _ = feat.shape
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(feat.shape[-1], np.float32)
    y = min(max(y, 0.0), h - 1.0)
    x = min(max(x, 0.0), w - 1.0)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    hy, hx = 1 - ly, 1 - lx
    return (feat[y0, x0] * hy * hx + feat[y0, x1] * hy * lx
            + feat[y1, x0] * ly * hx + feat[y1, x1] * ly * lx)


def _roi_align_np(feat, boxes, n, scale, sr):
    out = np.zeros((len(boxes), n, n, feat.shape[-1]), np.float32)
    for r, box in enumerate(boxes * scale):
        x1, y1, x2, y2 = box
        rw, rh = max(x2 - x1, 1.0), max(y2 - y1, 1.0)
        bw, bh = rw / n, rh / n
        for py in range(n):
            for px in range(n):
                acc = np.zeros(feat.shape[-1], np.float32)
                for iy in range(sr):
                    for ix in range(sr):
                        sy = y1 + (py + (iy + 0.5) / sr) * bh
                        sx = x1 + (px + (ix + 0.5) / sr) * bw
                        acc += _bilinear_np(feat, sy, sx)
                out[r, py, px] = acc / (sr * sr)
    return out


def _nms_np(boxes, scores, thr, max_out):
    iou = _iou_np(boxes, boxes)
    live = np.ones(len(boxes), bool)
    keep = []
    while live.any() and len(keep) < max_out:
        cand = np.where(live, scores, -np.inf)
        best = int(np.argmax(cand))
        keep.append(best)
        live &= iou[best] <= thr
        live[best] = False
    return keep


def test_box_iou_matches_oracle():
    rng = np.random.default_rng(0)
    a = np.sort(rng.uniform(0, 100, (12, 2, 2)), axis=1).reshape(12, 4)[:, [0, 2, 1, 3]]
    b = np.sort(rng.uniform(0, 100, (9, 2, 2)), axis=1).reshape(9, 4)[:, [0, 2, 1, 3]]
    np.testing.assert_allclose(
        np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b))),
        _iou_np(a.astype(np.float32), b.astype(np.float32)),
        atol=1e-5,
    )


def test_roi_align_matches_oracle():
    rng = np.random.default_rng(1)
    feat = rng.normal(size=(24, 32, 8)).astype(np.float32)
    boxes = np.array(
        [[4.0, 6.0, 20.0, 18.0], [0.0, 0.0, 31.0, 23.0], [10.5, 3.25, 14.75, 9.5],
         [28.0, 20.0, 40.0, 30.0]],  # partially out of range
        np.float32,
    )
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes),
                               output_size=7, spatial_scale=0.5, sampling_ratio=2))
    want = _roi_align_np(feat, boxes, 7, 0.5, 2)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_batched_nms_matches_oracle():
    rng = np.random.default_rng(2)
    n = 64
    centers = rng.uniform(10, 90, (n, 2))
    sizes = rng.uniform(5, 25, (n, 2))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], 1).astype(np.float32)
    scores = rng.uniform(size=n).astype(np.float32)
    idx, valid = batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                             iou_threshold=0.5, max_out=20)
    keep = _nms_np(boxes, scores, 0.5, 20)
    got = [int(i) for i, v in zip(np.asarray(idx), np.asarray(valid)) if v]
    assert got == keep


def test_match_proposals_thresholds_and_low_quality():
    # gt0 best-matches anchor0 (forced despite low IoU); anchor2 between
    iou = jnp.asarray(
        np.array([
            [0.25, 0.10, 0.40, 0.80],
            [0.00, 0.05, 0.55, 0.90],
        ], np.float32)
    )
    m = np.asarray(match_proposals(iou, high_threshold=0.7, low_threshold=0.3,
                                   allow_low_quality=False))
    assert m[0] == BELOW_LOW_THRESHOLD
    assert m[1] == BELOW_LOW_THRESHOLD
    assert m[2] == BETWEEN_THRESHOLDS
    assert m[3] == 1  # argmax over gt
    m2 = np.asarray(match_proposals(iou, high_threshold=0.7, low_threshold=0.3,
                                    allow_low_quality=True))
    # neither gt's best anchor is anchor2, so it stays BETWEEN
    assert m2[2] == BETWEEN_THRESHOLDS
    assert m2[3] == 1
    # gt0's best anchor (3, iou .8) already matched; check a forced match case
    iou3 = jnp.asarray(np.array([[0.2, 0.1], [0.1, 0.9]], np.float32))
    m3 = np.asarray(match_proposals(iou3, allow_low_quality=True))
    assert m3[0] == 0  # forced: anchor0 is gt0's best despite iou<low
    assert m3[1] == 1
