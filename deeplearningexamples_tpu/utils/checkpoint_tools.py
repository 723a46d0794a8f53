"""Checkpoint CLI utilities.

Analogues of the reference's per-recipe helpers (SURVEY.md §2 row 35):
- ``strip_checkpoint``: training checkpoint -> weights-only model repository
  (``checkpoint2model.py`` — drops optimizer/EMA/RNG state)
- ``classify_image``: single-image top-k prediction with an ImageNet-style
  class list (``classify.py``)
- export-to-serving replaces ``model2onnx.py``/TensorRT: a jitted function +
  model repository *is* the deployable artifact on TPU.
"""

from __future__ import annotations

import json
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["strip_checkpoint", "classify_image"]


def strip_checkpoint(
    checkpoint_dir: str,
    state_template: Any,
    out_repo: str,
    name: str,
    input_spec: dict,
    use_ema: bool = False,
    step: int | None = None,
    metadata: dict | None = None,
) -> str:
    """Load a TrainState checkpoint, keep (ema_)params + model_state, write a
    model repository."""
    from ..core.checkpoint import CheckpointManager
    from ..serving.export import save_model_repository

    mgr = CheckpointManager(checkpoint_dir)
    state = mgr.restore(state_template, step=step)
    params = state.ema_params if (use_ema and state.ema_params is not None) else state.params
    payload = {"params": params}
    if state.model_state:
        payload.update(state.model_state)
    return save_model_repository(
        out_repo, name, payload, input_spec=input_spec,
        metadata={"step": int(state.step), "ema": bool(use_ema),
                  **(metadata or {})},
    )


def classify_image(
    model,
    variables: Any,
    jpeg_path: str,
    labels: Sequence[str] | None = None,
    image_size: int = 224,
    top_k: int = 5,
) -> list[tuple[str, float]]:
    """Single-image top-k classification through the native decode path."""
    from ..native import DataPlane

    plane = DataPlane(1)
    with open(jpeg_path, "rb") as f:
        data = f.read()
    frac = image_size / 256.0
    crops = np.asarray([[(1 - frac) / 2, (1 - frac) / 2, frac, frac]], np.float32)
    img = plane.decode_batch([data], crops, np.zeros(1, np.int32), image_size)
    logits = model.apply(variables, jnp.asarray(img), train=False)
    probs = np.asarray(jax.nn.softmax(logits, -1))[0]
    idx = np.argsort(probs)[-top_k:][::-1]
    return [
        (labels[i] if labels else str(i), float(probs[i])) for i in idx
    ]
