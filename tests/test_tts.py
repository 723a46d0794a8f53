"""TTS tests: audio frontend vs analytic cases, text frontend, Tacotron2
teacher-forced + inference, WaveGlow invertibility + loss."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplearningexamples_tpu.models.tts import (
    MelConfig,
    N_SYMBOLS,
    Tacotron2Config,
    Tacotron2Task,
    WaveGlowConfig,
    WaveGlowTask,
    mel_filterbank,
    mel_spectrogram,
    text_to_sequence,
    sequence_to_text,
)

TINY_T2 = Tacotron2Config(
    symbols_embedding_dim=32, encoder_embedding_dim=32, n_mel_channels=16,
    attention_rnn_dim=32, decoder_rnn_dim=32, prenet_dim=16, attention_dim=16,
    attention_location_n_filters=4, attention_location_kernel_size=7,
    postnet_embedding_dim=32, postnet_n_convolutions=3, max_decoder_steps=40,
)
TINY_WG = WaveGlowConfig(
    n_mel_channels=16, n_flows=4, n_group=8, n_early_every=2, n_early_size=2,
    wn_n_layers=2, wn_n_channels=32, segment_length=1024, hop_length=64,
)


# -- audio frontend ---------------------------------------------------------


def test_symbols_count_matches_reference():
    assert N_SYMBOLS == 148  # reference tacotron2/text/symbols.py inventory


def test_text_roundtrip():
    seq = text_to_sequence("Hello, world!")
    assert len(seq) > 0
    assert sequence_to_text(seq) == "hello, world!"
    seq2 = text_to_sequence("say {HH AH0 L OW1}.")
    assert sequence_to_text(seq2) == "say {HH}{AH0}{L}{OW1}."
    # cleaner expands abbreviations
    assert sequence_to_text(text_to_sequence("Dr. Smith")) == "doctor smith"


def test_mel_filterbank_shape_and_coverage():
    cfg = MelConfig()
    fb = mel_filterbank(cfg)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # every mel filter has support
    assert (fb.sum(axis=1) > 0).all()


def test_mel_spectrogram_pure_tone():
    cfg = MelConfig()
    t = np.arange(22050) / cfg.sampling_rate
    audio = 0.5 * np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    mel = mel_spectrogram(audio, cfg)
    assert mel.shape[0] == 80
    # energy concentrates near the mel bin containing 440 Hz
    peak_bin = mel.mean(axis=1).argmax()
    fb = mel_filterbank(cfg)
    freqs = np.linspace(0, cfg.sampling_rate / 2, fb.shape[1])
    center = freqs[fb[peak_bin].argmax()]
    assert 300 < center < 600


# -- Tacotron2 --------------------------------------------------------------


def _t2_batch(b=2, t_text=11, t_mel=24, n_mel=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "text": jnp.asarray(rng.integers(1, 40, (b, t_text)), jnp.int32),
        "text_lengths": jnp.asarray([t_text, t_text - 3], jnp.int32),
        "mel": jnp.asarray(rng.normal(size=(b, t_mel, n_mel)), jnp.float32),
        "mel_lengths": jnp.asarray([t_mel, t_mel - 5], jnp.int32),
    }


def test_tacotron2_teacher_forced_shapes_and_training():
    import optax
    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step

    task = Tacotron2Task(TINY_T2, dtype=jnp.float32)
    params, mstate = task.init(jax.random.key(0), text_len=11, mel_len=24)
    tx = optax.adam(1e-2)
    state = create_train_state(params, tx, jax.random.key(1), mstate)
    step = make_train_step(task.loss_fn, tx, donate=False)
    batch = _t2_batch()
    losses = []
    for _ in range(20):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    # prenet dropout is always on (reference quirk) so compare window means
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_tacotron2_infer_shapes():
    task = Tacotron2Task(TINY_T2, dtype=jnp.float32)
    params, mstate = task.init(jax.random.key(0), text_len=11, mel_len=24)
    batch = _t2_batch()
    mel, lengths, aligns = task.infer_fn(
        params, mstate, batch["text"], batch["text_lengths"], max_steps=20
    )
    assert mel.shape == (2, 20, 16)
    assert aligns.shape == (2, 20, 11)
    assert (np.asarray(lengths) <= 20).all()
    # attention rows are a distribution over text positions
    np.testing.assert_allclose(
        np.asarray(aligns.astype(jnp.float32)).sum(-1), 1.0, atol=1e-3
    )


# -- WaveGlow ---------------------------------------------------------------


def test_waveglow_forward_and_loss_decreases():
    import optax
    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step

    task = WaveGlowTask(TINY_WG, dtype=jnp.float32)
    params, _ = task.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    t_mel = TINY_WG.segment_length // TINY_WG.hop_length + 1
    batch = {
        "audio": jnp.asarray(rng.normal(size=(2, 1024)) * 0.1, jnp.float32),
        "mel": jnp.asarray(rng.normal(size=(2, t_mel, 16)), jnp.float32),
    }
    tx = optax.adam(1e-3)
    state = create_train_state(params, tx, jax.random.key(1), {})
    step = make_train_step(task.loss_fn, tx, donate=False)
    losses = []
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_waveglow_invertibility():
    """fresh model (zero-init couplings): infer(forward(x)) structure holds —
    run forward then manually invert using the same params via infer with the
    forward z is not directly exposed, so check: forward of inferred audio
    reproduces the injected noise (flows are exactly invertible)."""
    task = WaveGlowTask(TINY_WG, dtype=jnp.float32)
    params, _ = task.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    t_mel = 16
    mel = jnp.asarray(rng.normal(size=(1, t_mel, 16)), jnp.float32)
    audio = task.infer_fn(params, mel, sigma=1.0, rng=jax.random.key(7))
    t_groups = audio.shape[1] // TINY_WG.n_group
    z, log_s, log_det = task.model.apply({"params": params}, audio, mel)
    # z must be unit-gaussian-ish: it IS the injected noise, reconstructed
    assert np.isfinite(np.asarray(z)).all()
    assert abs(float(jnp.std(z)) - 1.0) < 0.15
    assert np.isfinite(float(log_s)) and np.isfinite(float(log_det))


def test_waveglow_logdet_matches_weights():
    task = WaveGlowTask(TINY_WG, dtype=jnp.float32)
    params, _ = task.init(jax.random.key(0))
    audio = jnp.zeros((1, 1024))
    t_mel = TINY_WG.segment_length // TINY_WG.hop_length + 1
    mel = jnp.zeros((1, t_mel, 16))
    _, log_s, log_det = task.model.apply({"params": params}, audio, mel)
    # zero-init end convs -> log_s == 0 on first forward
    assert float(log_s) == 0.0
    # orthogonal 1x1 weights -> |det| = 1 -> log_det == 0 (up to fp error)
    assert abs(float(log_det)) < 1e-2


def test_hifigan_gan_training_step():
    import optax
    from deeplearningexamples_tpu.models.tts import HiFiGanConfig, HiFiGanTask

    cfg = HiFiGanConfig(
        n_mels=16, upsample_rates=(4, 4), upsample_kernels=(8, 8),
        upsample_initial_channel=32, resblock_kernels=(3,),
        resblock_dilations=((1, 3),), periods=(2, 3),
        segment_length=1024, hop_length=16,
    )
    task = HiFiGanTask(cfg, dtype=jnp.float32, mel_loss_weight=1.0)
    g_params, d_params = task.init(jax.random.key(0))
    g_tx, d_tx = optax.adam(2e-4), optax.adam(2e-4)
    g_opt, d_opt = g_tx.init(g_params), d_tx.init(d_params)
    g_step, d_step = task.make_steps(g_tx, d_tx)

    rng = np.random.default_rng(0)
    t_mel = cfg.segment_length // cfg.hop_length
    batch = {
        "mel": jnp.asarray(rng.normal(size=(2, t_mel, 16)), jnp.float32),
        "audio": jnp.asarray(0.3 * np.sin(np.linspace(0, 200, 1024))[None]
                             * np.ones((2, 1)), jnp.float32),
    }
    # generator output covers the full segment
    audio = task.gen.apply({"params": g_params}, batch["mel"])
    assert audio.shape == (2, cfg.segment_length)
    assert np.abs(np.asarray(audio)).max() <= 1.0

    d_losses, g_losses = [], []
    for _ in range(4):
        d_params, d_opt, dl = d_step(d_params, d_opt, g_params, batch)
        g_params, g_opt, gl, aux = g_step(g_params, g_opt, d_params, batch)
        d_losses.append(float(dl))
        g_losses.append(float(gl))
    assert all(np.isfinite(d_losses)) and all(np.isfinite(g_losses))
    assert d_losses[-1] < d_losses[0]  # D learns to separate real/fake
    assert float(aux["mel_l1"]) > 0


def test_length_regulate_exact():
    from deeplearningexamples_tpu.models.tts import length_regulate

    x = jnp.asarray(np.arange(1, 4, dtype=np.float32)[None, :, None])  # tokens 1,2,3
    dur = jnp.asarray([[2, 1, 3]])
    out, mask = length_regulate(x, dur, max_len=8)
    np.testing.assert_allclose(
        np.asarray(out[0, :, 0]), [1, 1, 2, 3, 3, 3, 0, 0]
    )
    assert np.asarray(mask[0]).tolist() == [True] * 6 + [False] * 2


def test_fastpitch_trains_and_infers():
    import optax
    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step
    from deeplearningexamples_tpu.models.tts import FastPitchConfig, FastPitchTask

    cfg = FastPitchConfig(
        n_symbols=40, d_model=32, encoder_layers=2, decoder_layers=2,
        conv_filters=64, n_mels=8, max_mel_len=64, head_dim=16,
    )
    task = FastPitchTask(cfg, dtype=jnp.float32)
    params, _ = task.init(jax.random.key(0))
    tx = optax.adam(2e-3)
    state = create_train_state(params, tx, jax.random.key(1))
    step = make_train_step(task.loss_fn, tx, donate=False)
    rng = np.random.default_rng(0)
    text = rng.integers(1, 40, (2, 10)).astype(np.int32)
    dur = rng.integers(1, 4, (2, 10)).astype(np.int32)
    mel_len = int(dur.sum(1).max())
    batch = {
        "text": jnp.asarray(text),
        "durations": jnp.asarray(dur),
        "pitch": jnp.asarray(rng.normal(size=(2, 10)), jnp.float32),
        "mel": jnp.asarray(rng.normal(size=(2, mel_len, 8)), jnp.float32),
    }
    losses = []
    for _ in range(15):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]

    mel, mel_lens = task.model.apply(
        {"params": state.params}, jnp.asarray(text),
        method=task.model.infer,
    )
    assert mel.shape == (2, cfg.max_mel_len, 8)
    assert (np.asarray(mel_lens) >= 0).all()


def test_text_normalization_numbers_and_unidecode():
    """Reference numbers.py / unidecoder behaviors (golden cases)."""
    from deeplearningexamples_tpu.models.tts.text import (
        CMUDict, normalize_numbers, sequence_to_text, unidecode,
    )

    assert normalize_numbers("$17.50") == "seventeen dollars, fifty cents"
    assert normalize_numbers("$1") == "one dollar"
    assert normalize_numbers("£100") == "one hundred pounds"
    # 1000 < n < 3000 uses the reference's year-style grouping even outside
    # year contexts (numbers.py _expand_number)
    assert normalize_numbers("1,234 things") == "twelve thirty-four things"
    assert normalize_numbers("4,321 things") == \
        "four thousand three hundred twenty-one things"
    assert normalize_numbers("in 1905") == "in nineteen oh five"
    assert normalize_numbers("in 1999") == "in nineteen ninety-nine"
    assert normalize_numbers("year 2000") == "year two thousand"
    assert normalize_numbers("year 2008") == "year two thousand eight"
    assert normalize_numbers("1700 men") == "seventeen hundred men"
    assert normalize_numbers("3rd place, 21st try") == "third place, twenty-first try"
    assert normalize_numbers("1.5 km") == "one point five km"
    assert normalize_numbers("42") == "forty-two"

    assert unidecode("café naïve Łódź") == "cafe naive Lodz"
    assert unidecode("“smart” — quotes…") == '"smart" - quotes...'

    # end-to-end: cleaner path through text_to_sequence
    s = sequence_to_text(text_to_sequence("Dr. Smith paid $17.50."))
    assert s == "doctor smith paid seventeen dollars, fifty cents."


def test_cmudict_lookup_in_sequence():
    from deeplearningexamples_tpu.models.tts.text import CMUDict

    lines = [
        ";;; comment\n",
        "HELLO  HH AH0 L OW1\n",
        "HELLO(1)  HH EH0 L OW1\n",
        "WORLD  W ER1 L D\n",
    ]
    d = CMUDict(lines)
    assert len(d) == 2
    assert d.lookup("hello") == ["HH AH0 L OW1", "HH EH0 L OW1"]

    seq = text_to_sequence("hello world!", cmudict=d)
    assert sequence_to_text(seq) == "{HH}{AH0}{L}{OW1} {W}{ER1}{L}{D}!"
    # unknown words fall back to letters
    seq2 = text_to_sequence("hello zzz", cmudict=d)
    assert sequence_to_text(seq2).endswith(" zzz")
