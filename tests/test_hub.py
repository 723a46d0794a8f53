"""Model-zoo entry points (``hub.py`` — the reference's repo-root
``hubconf.py:1-34`` TorchHub surface: ``nvidia_resnet50`` ...
``nvidia_fastpitch``, ``nvidia_hifigan``, ``nvidia_tft``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplearningexamples_tpu import hub


def test_list_models_covers_reference_hubconf():
    """Every family the reference hubconf exposes has a registry entry."""
    names = hub.list_models()
    for expected in (
        "resnet50", "resnext101-32x4d", "se-resnext101-32x4d",
        "efficientnet-b0", "efficientnet-b4", "efficientnet-widese-b0",
        "efficientnet-widese-b4", "gpunet-0", "ssd300", "tacotron2",
        "waveglow", "fastpitch", "hifigan", "tft",
    ):
        assert expected in names, expected


def test_create_unknown_name_raises():
    with pytest.raises(KeyError):
        hub.create("not-a-model")


def test_fastpitch_entry_infer():
    """hub.load builds FastPitch + params; mel inference runs
    (reference ``hubconf.py:29`` nvidia_fastpitch)."""
    from deeplearningexamples_tpu.models.tts import FastPitchConfig

    cfg = FastPitchConfig(n_symbols=32, d_model=16, n_heads=1, head_dim=16,
                          encoder_layers=1, decoder_layers=1, conv_filters=32,
                          n_mels=8, max_mel_len=64, predictor_filters=8,
                          energy=True)
    model, variables = hub.load("fastpitch", cfg=cfg, dtype=jnp.float32)
    text = jnp.array([[3, 7, 11, 2, 0, 0, 0, 0]], jnp.int32)
    mel, mel_len = model.apply({"params": variables["params"]}, text,
                               max_mel_len=16, method=model.infer)
    assert mel.shape == (1, 16, cfg.n_mels)
    assert 0 <= int(mel_len[0]) <= 16


def test_hifigan_entry_and_repo_roundtrip(tmp_path):
    """hub.load builds the HiFi-GAN generator; loading from a model
    repository restores bit-identical params (reference ``hubconf.py:31``)."""
    from deeplearningexamples_tpu.models.tts import HiFiGanConfig
    from deeplearningexamples_tpu.serving import save_model_repository

    cfg = HiFiGanConfig(n_mels=8, upsample_rates=(4, 2),
                        upsample_kernels=(8, 4),
                        upsample_initial_channel=16,
                        resblock_kernels=(3,), resblock_dilations=((1, 3),),
                        segment_length=256, hop_length=8)
    gen, variables = hub.load("hifigan", cfg=cfg, dtype=jnp.float32)
    mel = jax.random.normal(jax.random.key(2), (1, 16, cfg.n_mels))
    audio = gen.apply({"params": variables["params"]}, mel)
    assert audio.shape == (1, 16 * cfg.hop_length)
    assert np.all(np.abs(np.asarray(audio)) <= 1.0)  # tanh output

    save_model_repository(str(tmp_path), "hifigan",
                          variables["params"],
                          input_spec={"mel": ((16, cfg.n_mels), "float32")},
                          output_names=("audio",))
    gen2, restored = hub.load("hifigan", pretrained=str(tmp_path / "hifigan"),
                              cfg=cfg, dtype=jnp.float32)
    audio2 = gen2.apply({"params": restored}, mel)
    np.testing.assert_array_equal(np.asarray(audio), np.asarray(audio2))


def test_tft_entry_predict():
    """hub.load builds TFT + params; quantile prediction runs
    (reference ``hubconf.py:34`` nvidia_tft)."""
    from deeplearningexamples_tpu.models.tft import TFTConfig

    cfg = TFTConfig(hidden=8, n_heads=1, encoder_len=8, horizon=4)
    model, variables = hub.load("tft", cfg=cfg)
    x = {
        "s_cat": jnp.zeros((2, cfg.num_static_vars), jnp.int32),
        "k_cont": jnp.zeros((2, cfg.example_length, cfg.n_known)),
        "target": jnp.zeros((2, cfg.encoder_len, 1)),
        "o_cont": jnp.zeros((2, cfg.encoder_len, cfg.n_observed_cont)),
    }
    pred = model.apply({"params": variables["params"]}, x,
                       deterministic=True)
    assert pred.shape == (2, cfg.horizon, len(cfg.quantiles))
