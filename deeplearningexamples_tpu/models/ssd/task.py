"""SSD300 training task: MultiBox loss with hard negative mining.

Loss semantics follow the reference ``Loss`` (``ssd/model.py:132-196``):
- SmoothL1 on encoded loc offsets over positive anchors
- CE on conf with 3:1 hard-negative mining — negatives ranked by conf loss,
  top 3x(num_pos) kept per image
- total = (loc + conf) averaged over images weighted by num_pos

The mining rank trick is the reference's double-argsort (:167-178), which is
fully vectorizable — no boolean-size-dependent shapes, jit-safe.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .boxes import DefaultBoxes, dboxes300_coco, decode_batch
from .model import SSD300

__all__ = ["SSDTask", "multibox_loss"]


def smooth_l1(x):
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


# DALI's Hsv operates as a linear transform in YIQ space; BrightnessContrast
# is out = brightness * (center + contrast * (x - center)) with center 128
# on [0,255] inputs (reference ``ssd/coco_pipeline.py:63-69,118-119``).
_RGB2YIQ = np.array([[0.299, 0.587, 0.114],
                     [0.596, -0.274, -0.321],
                     [0.211, -0.523, 0.311]], np.float32)
_YIQ2RGB = np.linalg.inv(_RGB2YIQ).astype(np.float32)


def color_twist(images, hue_deg, saturation, brightness, contrast,
                contrast_center: float = 128.0 / 255.0):
    """Reference SSD train-time color jitter on [0,1] RGB images (NHWC).

    Per-image scalars: ``hue_deg`` (degrees), ``saturation``/``contrast``
    in [0.5, 1.5], ``brightness`` in [0.875, 1.125] — the exact parameter
    ranges of ``coco_pipeline.py:91-93``. Runs in-jit on device (XLA fuses
    the whole chain into the input normalization) — the TPU-native home of
    DALI's GPU color twist.
    """
    x = images.astype(jnp.float32)
    yiq = jnp.einsum("bhwc,dc->bhwd", x, jnp.asarray(_RGB2YIQ))
    h = jnp.deg2rad(hue_deg)[:, None, None]
    s = saturation[:, None, None]
    cos_h, sin_h = jnp.cos(h), jnp.sin(h)
    y = yiq[..., 0]
    i = s * (yiq[..., 1] * cos_h - yiq[..., 2] * sin_h)
    q = s * (yiq[..., 1] * sin_h + yiq[..., 2] * cos_h)
    x = jnp.einsum("bhwd,cd->bhwc", jnp.stack([y, i, q], -1),
                   jnp.asarray(_YIQ2RGB))
    b = brightness[:, None, None, None]
    c = contrast[:, None, None, None]
    x = b * (contrast_center + c * (x - contrast_center))
    return jnp.clip(x, 0.0, 1.0).astype(images.dtype)


def sample_color_twist_params(rng, batch: int):
    """Draw the reference's per-image jitter scalars (ranges :91-93)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return dict(
        hue_deg=jax.random.uniform(k1, (batch,), minval=-0.5, maxval=0.5),
        saturation=jax.random.uniform(k2, (batch,), minval=0.5, maxval=1.5),
        brightness=jax.random.uniform(k3, (batch,), minval=0.875, maxval=1.125),
        contrast=jax.random.uniform(k4, (batch,), minval=0.5, maxval=1.5),
    )


def multibox_loss(loc_pred, conf_pred, loc_target, cls_target, neg_ratio: int = 3):
    """loc_pred (B,N,4), conf_pred (B,N,C), loc_target (B,N,4),
    cls_target (B,N) int (0 = background)."""
    pos = cls_target > 0  # (B, N)
    num_pos = jnp.sum(pos, axis=1)  # (B,)

    sl1 = jnp.sum(smooth_l1(loc_pred - loc_target), axis=-1)  # (B, N)
    loc_loss = jnp.sum(sl1 * pos, axis=1)  # (B,)

    con = optax.softmax_cross_entropy_with_integer_labels(
        conf_pred.astype(jnp.float32), cls_target
    )  # (B, N)

    # hard negative mining: rank negatives by loss via double argsort
    con_neg = jnp.where(pos, 0.0, con)
    rank = jnp.argsort(jnp.argsort(-con_neg, axis=1), axis=1)  # 0 = hardest
    num_neg = jnp.clip(neg_ratio * num_pos, 0, pos.shape[1])[:, None]
    neg = rank < num_neg  # (B, N)

    conf_loss = jnp.sum(con * (pos | neg), axis=1)  # (B,)

    total = loc_loss + conf_loss
    # reference semantics (``ssd/model.py:190-196``): per-image loss divided
    # by its positive count, no-positive images contribute 0, then a plain
    # mean over the batch dimension (not over valid images only)
    per_image = total / jnp.maximum(num_pos, 1e-6)
    return jnp.mean(per_image * (num_pos > 0))


@dataclass
class SSDTask:
    num_classes: int = 81
    dtype: Any = jnp.bfloat16
    dboxes: DefaultBoxes = field(default_factory=dboxes300_coco)
    color_jitter: bool = True  # reference train-pipeline color twist

    def __post_init__(self):
        self.model = SSD300(self.num_classes, self.dtype)

    def init(self, rng, image_size=300):
        x = jnp.zeros((2, image_size, image_size, 3), jnp.float32)
        variables = self.model.init(rng, x, train=False)
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        return params, model_state

    def loss_fn(self, params, model_state, batch, rng):
        images = batch["image"]
        if self.color_jitter:
            # reference train pipeline jitters hue/sat/brightness/contrast
            # (coco_pipeline.py:69-79); here in-jit, fused by XLA
            jitter_rng = jax.random.fold_in(rng, 1)
            images = color_twist(
                images, **sample_color_twist_params(jitter_rng, images.shape[0])
            )
        (loc, conf), mutated = self.model.apply(
            {"params": params, **model_state}, images, train=True,
            mutable=list(model_state.keys()) or False,
        )
        if not model_state:
            mutated = {}
        loss = multibox_loss(loc, conf, batch["loc_targets"], batch["cls_targets"])
        return loss, (dict(mutated), {})

    def predict_fn(self, params, model_state, images):
        """Device-side decode: returns (boxes_ltrb (B,N,4), probs (B,N,C))."""
        loc, conf = self.model.apply(
            {"params": params, **model_state}, images, train=False
        )
        boxes = decode_batch(self.dboxes, loc)
        probs = jax.nn.softmax(conf, axis=-1)
        return boxes, probs
