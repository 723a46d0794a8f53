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
    "jasper_offline_endpoint",
    "gnmt_endpoint",
    "transformer_xl_generate_endpoint",
    "unet_endpoint",
    "ncf_endpoint",
    "fastpitch_hifigan_endpoint",
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
            vocab_size=tcfg.vocab_size,
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


def jasper_offline_endpoint(
    task, params, model_state, *,
    name: str = "jasper",
    max_frames: int = 512,
    max_tokens: int = 128,
    batch_buckets=(1, 2, 4, 8),
) -> ModelEndpoint:
    """Offline (non-streaming) ASR endpoint — the reference's
    ``Jasper/triton/jasper-client.py`` batch path: padded mel features +
    valid-frame count -> greedy-CTC token ids.

    The acoustic model (log-prob frames) runs jitted on device; the greedy
    collapse (argmax / dedup / de-blank, ``triton/speech_utils.py`` decoder)
    is tiny O(T) host work per request, exactly where the reference does it
    (client-side postprocessing)."""
    from ..models.asr import greedy_ctc_decode

    stride = int(np.prod([b.stride for b in task.cfg.blocks]))
    variables = {"params": params, **model_state}
    infer = jax.jit(
        lambda feats: task.model.apply(variables, feats, train=False))

    def fn(batch):
        feats = np.asarray(batch["feats"])
        flen = np.asarray(batch["feat_len"])[:, 0]
        # zero the padded tail: conv receptive fields cross the valid/pad
        # boundary, so client-supplied pad garbage would otherwise leak into
        # the last valid frames (training pads with zeros — same convention)
        t_in = np.arange(feats.shape[1])
        feats = np.where((t_in < flen[:, None])[:, :, None], feats, 0.0)
        logp = np.asarray(infer(jnp.asarray(feats)))
        n_valid = (flen + stride - 1) // stride
        # mask padded frames to blank so they can't emit tokens
        t_idx = np.arange(logp.shape[1])[None, :]
        blank_only = np.full_like(logp, -1e9)
        blank_only[:, :, 0] = 0.0
        logp = np.where((t_idx < n_valid[:, None])[:, :, None],
                        logp, blank_only)
        tokens = np.full((logp.shape[0], max_tokens), -1, np.int32)
        n_tokens = np.zeros((logp.shape[0], 1), np.int32)
        for i, toks in enumerate(greedy_ctc_decode(logp)):
            toks = toks[:max_tokens]
            tokens[i, : len(toks)] = toks
            n_tokens[i, 0] = len(toks)
        return {"tokens": tokens, "n_tokens": n_tokens}

    return ModelEndpoint(
        name=name,
        batcher=ContinuousBatcher(fn, batch_buckets=batch_buckets),
        input_spec={
            "feats": ((max_frames, task.cfg.n_mels), "float32"),
            "feat_len": ((1,), "int32"),
        },
        output_names=("tokens", "n_tokens"),
    )


def gnmt_endpoint(
    task, params, *,
    name: str = "gnmt",
    beam_size: int = 4,
    max_len: int = 32,
    max_target_len: int = 32,
    batch_buckets=(1, 2, 4),
) -> ModelEndpoint:
    """Translation endpoint (reference ``GNMT/translate.py`` /
    ``seq2seq/inference/beam_search.py``): padded source ids -> best-beam
    target ids, GNMT length-normalized beam search. The LSTM decoder is
    causal by construction, so the full-prefix re-decode in ``beam_search``
    is exact."""
    from ..models.translation.beam_search import beam_search

    cfg = task.cfg
    model = task.model

    def decode(src):
        b = src.shape[0]
        memory, mask = model.apply({"params": params}, src,
                                   method=model.encode)
        mem_t = jnp.repeat(memory, beam_size, axis=0)
        mask_t = jnp.repeat(mask, beam_size, axis=0)

        def decode_logits(tgt):
            return model.apply({"params": params}, tgt, mem_t, mask_t,
                               method=model.decode)

        seqs, scores = beam_search(
            decode_logits, b, beam_size, max_len=max_target_len,
            bos_id=cfg.bos_id, eos_id=cfg.eos_id, pad_id=cfg.pad_id,
            vocab_size=cfg.vocab_size,
        )
        return seqs[:, 0], scores[:, 0]

    decode = jax.jit(decode)

    def fn(batch):
        tokens, scores = decode(jnp.asarray(batch["src"], jnp.int32))
        return {"tokens": tokens, "scores": scores}

    return ModelEndpoint(
        name=name,
        batcher=ContinuousBatcher(fn, batch_buckets=batch_buckets),
        input_spec={"src": ((max_len,), "int32")},
        output_names=("tokens", "scores"),
    )


def transformer_xl_generate_endpoint(
    task, params, *,
    name: str = "transformer_xl",
    gen_len: int = 32,
    batch_buckets=(1, 2, 4),
) -> ModelEndpoint:
    """LM text-generation endpoint (the reference Transformer-XL ships
    ``pytorch/eval.py`` / ``pytorch/inference`` for segment-level scoring):
    a full ``seg_len`` context window -> ``gen_len`` greedily decoded
    continuation tokens.

    Decoding slides the window one token per step (roll + append) and
    re-runs the full segment with ``mem_valid=0`` — the one mode where the
    relative-position table needs no reslicing, so it is exact; the mems
    recurrence stays the training-path optimization."""
    cfg = task.cfg
    model = task.model

    def generate(tokens):
        b = tokens.shape[0]

        def step(i, carry):
            window, out = carry
            logits, _ = model.apply({"params": params}, window)
            # logits are cfg.padded_vocab wide (lane padding); a padded id
            # must never be emitted or fed back into the context window
            nxt = jnp.argmax(
                logits[:, -1, :cfg.vocab_size], axis=-1).astype(jnp.int32)
            window = jnp.concatenate([window[:, 1:], nxt[:, None]], axis=1)
            return window, jax.lax.dynamic_update_index_in_dim(
                out, nxt, i, axis=1)

        out0 = jnp.zeros((b, gen_len), jnp.int32)
        _, out = jax.lax.fori_loop(0, gen_len, step, (tokens, out0))
        return out

    generate = jax.jit(generate)

    def fn(batch):
        return {"generated": generate(jnp.asarray(batch["context"], jnp.int32))}

    return ModelEndpoint(
        name=name,
        batcher=ContinuousBatcher(fn, batch_buckets=batch_buckets),
        input_spec={"context": ((cfg.seg_len,), "int32")},
        output_names=("generated",),
    )


def unet_endpoint(
    task, params, *,
    name: str = "unet",
    patch: int = 64,
    batch_buckets=(1, 2, 4),
) -> ModelEndpoint:
    """Segmentation endpoint (reference
    ``nnUNet/triton/run_inference_on_triton.py``): image patch ->
    per-voxel class labels + probabilities. Whole-patch inference at the
    trained patch size, 2D or 3D by ``cfg.spatial_rank``."""
    cfg = task.cfg

    def predict(image):
        logits = task.model.apply({"params": params}, image)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), probs

    predict = jax.jit(predict)

    def fn(batch):
        mask, probs = predict(jnp.asarray(batch["image"]))
        return {"mask": mask, "probs": probs}

    spatial = (patch,) * cfg.spatial_rank
    return ModelEndpoint(
        name=name,
        batcher=ContinuousBatcher(fn, batch_buckets=batch_buckets),
        input_spec={"image": ((*spatial, cfg.in_channels), "float32")},
        output_names=("mask", "probs"),
    )


def ncf_endpoint(
    task, params, *,
    name: str = "ncf",
    n_candidates: int = 100,
    batch_buckets=(1, 2, 4, 8, 16),
) -> ModelEndpoint:
    """Recommendation scoring endpoint (reference ``NCF/inference.py``):
    one user + a candidate item list -> per-item scores and the top-ranked
    order, the HR@10 evaluation query shape served online."""

    def score(users, items):
        u = jnp.broadcast_to(users, items.shape)
        s = task.model.apply({"params": params}, u.reshape(-1),
                             items.reshape(-1)).reshape(items.shape)
        order = jnp.argsort(-s, axis=-1).astype(jnp.int32)
        return s, order

    score = jax.jit(score)

    def fn(batch):
        scores, order = score(
            jnp.asarray(batch["user"], jnp.int32),
            jnp.asarray(batch["items"], jnp.int32),
        )
        return {"scores": scores, "ranking": order}

    return ModelEndpoint(
        name=name,
        batcher=ContinuousBatcher(fn, batch_buckets=batch_buckets),
        input_spec={
            "user": ((1,), "int32"),
            "items": ((n_candidates,), "int32"),
        },
        output_names=("scores", "ranking"),
    )


def fastpitch_hifigan_endpoint(
    fp_task, fp_params, hifi_task, hifi_params, *,
    name: str = "fastpitch_tts",
    max_text_len: int = 128,
    max_mel_len: int = 832,
    pace: float = 1.0,
    batch_buckets=(1, 2, 4),
) -> ModelEndpoint:
    """Parallel text-to-speech endpoint (reference ``FastPitch/triton/`` —
    FastPitch mel generation paired with the HiFi-GAN vocoder,
    ``FastPitch/inference.py``): padded symbol ids -> waveform.

    One jitted chain: FastPitch ``infer`` (duration/pitch(/energy)
    prediction + length regulation, static ``max_mel_len``) -> HiFi-GAN
    generator (mel -> audio at ``hop_length`` samples/frame). Returns the
    full padded waveform plus ``audio_len`` (= predicted mel frames x hop)
    so the client trims; mel frames past the predicted length are masked
    by the length regulator, matching the reference's padded-batch
    deployment shape."""
    fp = fp_task.model
    gen = hifi_task.gen
    hop = hifi_task.cfg.hop_length
    if fp_task.cfg.n_mels != hifi_task.cfg.n_mels:
        raise ValueError(
            f"FastPitch n_mels {fp_task.cfg.n_mels} != HiFiGAN n_mels "
            f"{hifi_task.cfg.n_mels}")
    up = 1
    for r in hifi_task.cfg.upsample_rates:
        up *= r
    if up != hop:
        raise ValueError(
            f"HiFiGAN upsample_rates product {up} != hop_length {hop}; "
            "audio_len (= mel frames x hop) would mis-state the waveform")

    def synth(text):
        mel, mel_len = fp.apply({"params": fp_params}, text,
                                pace=pace, max_mel_len=max_mel_len,
                                method=fp.infer)
        audio = gen.apply({"params": hifi_params}, mel)
        return mel_len.astype(jnp.int32), audio.astype(jnp.float32)

    synth = jax.jit(synth)

    def fn(batch):
        mel_len, audio = synth(jnp.asarray(batch["text"], jnp.int32))
        return {"audio": audio, "audio_len": mel_len * hop,
                "mel_len": mel_len}

    return ModelEndpoint(
        name=name,
        batcher=ContinuousBatcher(fn, batch_buckets=batch_buckets),
        input_spec={"text": ((max_text_len,), "int32")},
        output_names=("audio", "audio_len", "mel_len"),
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
