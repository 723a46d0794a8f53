"""Streaming ASR serving (the Kaldi recipe role): chunked == full decode."""

import jax
import jax.numpy as jnp
import numpy as np

from deeplearningexamples_tpu.models.asr import (
    Jasper,
    JasperBlock,
    JasperConfig,
    greedy_ctc_decode,
)
from deeplearningexamples_tpu.models.tts.audio import MelConfig, mel_spectrogram
from deeplearningexamples_tpu.serving.streaming_asr import StreamingAsrServer

# small Jasper: stride 2, receptive field well under 32 input frames
CFG = JasperConfig(
    n_mels=64, vocab_size=12,
    blocks=(
        JasperBlock(1, 32, 5, 0.0, residual=False, stride=2),
        JasperBlock(2, 32, 5, 0.0),
        JasperBlock(1, 48, 1, 0.0, residual=False),
    ),
)


def _make_infer():
    model = Jasper(CFG, dtype=jnp.float32)
    x0 = jnp.zeros((1, 32, CFG.n_mels))
    variables = model.init(jax.random.key(0), x0, train=False)
    fwd = jax.jit(lambda x: model.apply(variables, x, train=False))
    return lambda feats: np.asarray(fwd(jnp.asarray(feats))), variables, model


def test_streaming_matches_full_utterance():
    infer, variables, model = _make_infer()
    mel_cfg = MelConfig(n_mels=CFG.n_mels)
    rng = np.random.default_rng(0)
    # length chosen so the mel frame count is EVEN: stride-2 SAME convs
    # distribute padding by length parity, so streaming windows (always
    # even) align with the full utterance only at even frame counts
    audio = rng.normal(size=22000).astype(np.float32) * 0.2

    # full-utterance reference
    mel = mel_spectrogram(audio, mel_cfg).T  # (T, M)
    full_logp = infer(mel[None])[0]

    # windowed logits must equal the full-utterance logits numerically
    # (same math, different XLA program -> tolerance, not bitwise)
    chunk, context, s2 = 16, 16, 2
    emitted, bands = 0, []
    t = mel.shape[0]
    while emitted < t:
        take = min(chunk, t - emitted)
        start = max(emitted - context, 0)
        ctx = emitted - start
        end = min(emitted + take + context, t)
        w = mel[start:end]
        pad = (2 * context + chunk) - w.shape[0]
        if pad > 0:
            w = np.pad(w, ((0, pad), (0, 0)))
        lp = infer(w[None])[0]
        bands.append(lp[ctx // s2:-(-(ctx + take) // s2)])
        emitted += take
    streamed_logp = np.concatenate(bands)
    assert streamed_logp.shape == full_logp.shape
    # windows with full right context are EXACT; the last windows see the
    # utterance tail where intermediate BN biases shift the padded region
    # (inherent to chunked conv+BN inference), so only the final
    # (chunk+context)/stride frames carry tolerance
    exact = (t - chunk - context) // s2
    np.testing.assert_allclose(streamed_logp[:exact], full_logp[:exact],
                               atol=1e-4)
    np.testing.assert_allclose(streamed_logp[exact:], full_logp[exact:],
                               atol=0.5)

    # and the server's incremental CTC collapse equals decoding its own
    # streamed logits in one shot
    server = StreamingAsrServer(infer, mel_cfg, chunk_frames=chunk,
                                context_frames=context, time_stride=s2)
    chunks = np.array_split(audio, 7)
    out = None
    for i, ch in enumerate(chunks):
        out = server.process_chunk("stream-1", ch, last=(i == len(chunks) - 1))
    assert out["final"]
    assert out["transcript"] == greedy_ctc_decode(streamed_logp[None])[0]
    assert server.active_streams == 0


def test_streaming_partials_are_prefix_consistent():
    infer, *_ = _make_infer()
    mel_cfg = MelConfig(n_mels=64)
    rng = np.random.default_rng(1)
    audio = rng.normal(size=16200).astype(np.float32) * 0.2
    server = StreamingAsrServer(infer, mel_cfg, chunk_frames=16,
                                context_frames=16, time_stride=2)
    prev = []
    for i, ch in enumerate(np.array_split(audio, 5)):
        r = server.process_chunk("s", ch, last=(i == 4))
        # transcripts only grow (greedy CTC is append-only across chunks)
        assert r["transcript"][:len(prev)] == prev
        prev = r["transcript"]


def test_interleaved_streams_isolated():
    infer, *_ = _make_infer()
    mel_cfg = MelConfig(n_mels=64)
    rng = np.random.default_rng(2)
    a1 = rng.normal(size=12100).astype(np.float32) * 0.2
    a2 = rng.normal(size=12100).astype(np.float32) * 0.2

    server = StreamingAsrServer(infer, mel_cfg, chunk_frames=16,
                                context_frames=16, time_stride=2)
    # interleave two streams; each must equal its own sequential run
    seq = StreamingAsrServer(infer, mel_cfg, chunk_frames=16,
                             context_frames=16, time_stride=2)
    r1 = r2 = e1 = e2 = None
    c1, c2 = np.array_split(a1, 3), np.array_split(a2, 3)
    for i in range(3):
        last = i == 2
        r1 = server.process_chunk("a", c1[i], last=last)
        r2 = server.process_chunk("b", c2[i], last=last)
    for i in range(3):
        last = i == 2
        e1 = seq.process_chunk("a", c1[i], last=last)
    for i in range(3):
        last = i == 2
        e2 = seq.process_chunk("b", c2[i], last=last)
    assert r1["transcript"] == e1["transcript"]
    assert r2["transcript"] == e2["transcript"]
