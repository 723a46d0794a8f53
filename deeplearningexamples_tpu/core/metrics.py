"""Device-side evaluation metrics.

- ``roc_auc``: vectorized sort+trapezoid ROC-AUC, the TPU analogue of the
  reference's GPU AUC (``dlrm/scripts/utils.py:289-320`` — sort by score,
  cumulative TPR/FPR, trapz) — no sklearn on the hot path.
- classification top-k lives in ``core/losses.py``; COCO mAP is host-side
  (pycocotools-compatible) in the SSD eval path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["roc_auc"]


@jax.jit
def roc_auc(scores: jax.Array, labels: jax.Array) -> jax.Array:
    """AUC-ROC of binary ``labels`` (0/1 float) under ``scores`` (higher =
    positive). Ties handled by score ordering (matches reference semantics)."""
    order = jnp.argsort(-scores)
    y = labels[order].astype(jnp.float32)
    tps = jnp.cumsum(y)
    fps = jnp.cumsum(1.0 - y)
    num_pos = tps[-1]
    num_neg = fps[-1]
    tpr = tps / jnp.maximum(num_pos, 1.0)
    fpr = fps / jnp.maximum(num_neg, 1.0)
    tpr = jnp.concatenate([jnp.zeros((1,)), tpr])
    fpr = jnp.concatenate([jnp.zeros((1,)), fpr])
    return jnp.trapezoid(tpr, fpr)
