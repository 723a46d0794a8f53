"""SSD COCO evaluation driver.

The reference's ``ssd/evaluate.py:24-110``: per-rank decode + NMS, padded
all_gather of results, rank-0 pycocotools COCOeval. Here: device-side decode
+ softmax (jitted, batched), host-side per-image NMS, accumulation into the
numpy ``CocoMAP`` scorer. Under multi-host SPMD each host evaluates its own
shard of the val set (loaders are host-sharded) and partial detection lists
are gathered with ``jax.experimental.multihost_utils`` by the caller when
running multi-host; the scoring core is process-local.
"""

from __future__ import annotations

from typing import Iterable

import jax
import numpy as np

from .boxes import nms_single
from .coco_eval import CocoMAP

__all__ = ["evaluate_ssd"]


def evaluate_ssd(
    task,
    params,
    model_state,
    val_loader: Iterable,
    score_thresh: float = 0.05,
    nms_criteria: float = 0.5,
    max_output: int = 200,
) -> dict:
    """Runs detection over a loader yielding batches with host-side ``gt``
    entries (``CocoSSDLoader(train=False)``). Returns {"mAP", "mAP50"}."""
    predict = jax.jit(
        lambda p, s, img: task.predict_fn(p, s, img)
    )
    scorer = CocoMAP()
    for batch in val_loader:
        boxes, probs = predict(params, model_state, batch["image"])
        boxes = np.asarray(boxes)
        probs = np.asarray(probs)
        for i, (_img_id, gt_boxes, gt_labels) in enumerate(batch["gt"]):
            det_b, det_l, det_s = nms_single(
                boxes[i], probs[i], criteria=nms_criteria,
                max_output=max_output, score_thresh=score_thresh,
            )
            scorer.add_image(det_b, det_l, det_s, gt_boxes, gt_labels)
    return scorer.compute()
