"""Per-family serving recipes — endpoint builders for the round-2 models.

The reference ships a ``triton/`` deployment dir per model (e.g.
``PyTorch/Forecasting/TFT/triton/``, ``Detection/Efficientdet``'s and
``Segmentation/MaskRCNN``'s inference scripts, ``LanguageModeling/BART``'s
``run_eval`` beam decoding, the Kaldi C++ backend). Here each recipe is a
function that wraps the model's jitted inference in a
:class:`~.batcher.ContinuousBatcher` and returns a ready
:class:`~.server.ModelEndpoint` plus the ``input_spec`` needed to export a
model repository (``save_model_repository``) for it.

All endpoints use static-shape inference (padded batch buckets), report the
batcher's chip-side latency split via ``/v2/models/<name>/stats``, and are
exercised end-to-end in ``tests/test_serving_recipes.py``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .batcher import ContinuousBatcher
from .server import ModelEndpoint

__all__ = [
    "efficientdet_endpoint",
    "maskrcnn_endpoint",
    "bart_endpoint",
    "tft_endpoint",
    "quartznet_streaming_server",
]


def efficientdet_endpoint(
    task, params, model_state, *,
    name: str = "efficientdet",
    batch_buckets=(1, 2, 4, 8),
    max_out: int = 100,
    score_threshold: float = 0.05,
) -> ModelEndpoint:
    """Detections endpoint (reference EfficientDet ``validate.py`` /
    per-model triton runner): image -> (boxes, scores, labels, valid)."""
    s = task.cfg.image_size

    infer = jax.jit(lambda im: task.predict(
        params, model_state, im, max_out=max_out,
        score_threshold=score_threshold))

    def fn(batch):
        boxes, scores, labels, valid = infer(jnp.asarray(batch["image"]))
        return {"boxes": boxes, "scores": scores,
                "labels": labels, "valid": valid}

    return ModelEndpoint(
        name=name,
        batcher=ContinuousBatcher(fn, batch_buckets=batch_buckets),
        input_spec={"image": ((s, s, 3), "float32")},
        output_names=("boxes", "scores", "labels", "valid"),
    )


def maskrcnn_endpoint(
    task, params, model_state, *,
    name: str = "maskrcnn",
    batch_buckets=(1, 2, 4),
    max_out: int = 50,
    score_threshold: float = 0.05,
) -> ModelEndpoint:
    """Instance-segmentation endpoint: image -> detections + mask grids."""
    s = task.cfg.image_size

    infer = jax.jit(lambda im: task.predict(
        params, model_state, im, max_out=max_out,
        score_threshold=score_threshold))

    def fn(batch):
        boxes, scores, labels, valid, masks = infer(jnp.asarray(batch["image"]))
        return {"boxes": boxes, "scores": scores, "labels": labels,
                "valid": valid, "masks": masks}

    return ModelEndpoint(
        name=name,
        batcher=ContinuousBatcher(fn, batch_buckets=batch_buckets),
        input_spec={"image": ((s, s, 3), "float32")},
        output_names=("boxes", "scores", "labels", "valid", "masks"),
    )


def bart_endpoint(
    model, params, tcfg, *,
    name: str = "bart",
    beam_size: int = 4,
    max_target_len: int = 64,
    batch_buckets=(1, 2, 4, 8),
) -> ModelEndpoint:
    """Summarization endpoint (reference BART ``run_eval.py`` beam search):
    padded source token ids -> best beam token ids."""
    from ..models.translation import beam_search_cached

    def decode(src):
        memory, memory_mask = model.apply(
            {"params": params}, src, method=model.encode
        )
        seqs, scores = beam_search_cached(
            model, params,
            jnp.repeat(memory, beam_size, axis=0),
            jnp.repeat(memory_mask, beam_size, axis=0),
            src.shape[0], beam_size,
            max_len=max_target_len, bos_id=tcfg.bos_id,
            eos_id=tcfg.eos_id, pad_id=tcfg.pad_id,
        )
        return seqs[:, 0], scores[:, 0]

    decode = jax.jit(decode)

    def fn(batch):
        tokens, scores = decode(jnp.asarray(batch["src"], jnp.int32))
        return {"tokens": tokens, "scores": scores}

    return ModelEndpoint(
        name=name,
        batcher=ContinuousBatcher(fn, batch_buckets=batch_buckets),
        input_spec={"src": ((tcfg.max_len,), "int32")},
        output_names=("tokens", "scores"),
    )


def tft_endpoint(
    task, params, *,
    name: str = "tft",
    batch_buckets=(1, 2, 4, 8, 16),
) -> ModelEndpoint:
    """Forecasting endpoint (reference ``TFT/triton/``): observed + known
    covariate windows -> per-quantile horizon predictions."""
    cfg = task.cfg

    infer = jax.jit(lambda obs, known: task.predict_fn(params, obs, known))

    def fn(batch):
        return {"quantiles": infer(
            jnp.asarray(batch["observed"]), jnp.asarray(batch["known"])
        )}

    return ModelEndpoint(
        name=name,
        batcher=ContinuousBatcher(fn, batch_buckets=batch_buckets),
        input_spec={
            "observed": ((cfg.encoder_len, cfg.n_observed), "float32"),
            "known": ((cfg.encoder_len + cfg.horizon, cfg.n_known), "float32"),
        },
        output_names=("quantiles",),
    )


def quartznet_streaming_server(
    task, params, model_state, *,
    chunk_frames: int = 64,
    context_frames: int = 32,
    mel_cfg=None,
):
    """Streaming ASR server over a CTC model (the Kaldi serving recipe;
    QuartzNet-15x5 by default). Returns a ``StreamingAsrServer`` whose
    sessions hold per-correlation-id decode state."""
    from ..models.tts.audio import MelConfig
    from .streaming_asr import StreamingAsrServer

    variables = {"params": params, **model_state}

    infer = jax.jit(lambda mel: task.model.apply(variables, mel, train=False))

    def infer_fn(mel):
        return np.asarray(infer(jnp.asarray(mel)))

    stride = int(np.prod([b.stride for b in task.cfg.blocks]))
    return StreamingAsrServer(
        infer_fn,
        mel_cfg=mel_cfg or MelConfig(n_mels=task.cfg.n_mels),
        chunk_frames=chunk_frames, context_frames=context_frames,
        time_stride=stride,
    )
