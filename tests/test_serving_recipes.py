"""Per-family serving recipes: each endpoint runs end-to-end through the
batcher (and one through the HTTP server), and the batcher's chip-side
latency decomposition is populated."""

import numpy as np

import jax
import jax.numpy as jnp


def test_efficientdet_endpoint_and_stats():
    from deeplearningexamples_tpu.models.efficientdet import (
        EfficientDetConfig, EfficientDetTask,
    )
    from deeplearningexamples_tpu.serving.recipes import efficientdet_endpoint

    task = EfficientDetTask(
        EfficientDetConfig(image_size=128, fpn_width=16, fpn_depth=1,
                           head_depth=1, num_classes=8),
        dtype=jnp.float32,
    )
    params, mstate = task.init(jax.random.key(0))
    ep = efficientdet_endpoint(task, params, mstate, batch_buckets=(1, 2),
                               max_out=10)
    try:
        img = np.zeros((128, 128, 3), np.float32)
        out = ep.batcher.infer({"image": img}, timeout=300)
        assert out["boxes"].shape == (10, 4)
        assert out["valid"].dtype == bool
        stats = ep.batcher.stats()
        assert stats["dispatches"] >= 1
        assert stats["device_ms_mean"] > 0
        assert stats["wait_ms_mean"] >= 0
    finally:
        ep.batcher.close()


def test_tft_endpoint_through_server():
    from deeplearningexamples_tpu.models.tft import TFTConfig, TFTTask
    from deeplearningexamples_tpu.serving import InferenceServer, http_infer
    from deeplearningexamples_tpu.serving.recipes import tft_endpoint

    task = TFTTask(TFTConfig(hidden=16, n_heads=2, encoder_len=12, horizon=4))
    params, _ = task.init(jax.random.key(0))
    ep = tft_endpoint(task, params, batch_buckets=(1, 2))
    server = InferenceServer(port=0)
    server.register(ep)
    server.start()
    try:
        rng = np.random.default_rng(0)
        out = http_infer(
            server.addr, "tft",
            {
                "observed": rng.normal(size=(12, 4)).astype(np.float32),
                "known": rng.normal(size=(16, 2)).astype(np.float32),
            },
        )
        q = np.asarray(out["outputs"]["quantiles"])
        assert q.shape == (4, 3)
        # stats endpoint reports the split
        import json
        import urllib.request

        with urllib.request.urlopen(
            f"http://127.0.0.1:{server.addr[1]}/v2/models/tft/stats"
        ) as r:
            stats = json.loads(r.read())
        assert stats["dispatches"] >= 1 and "device_ms_p95" in stats
    finally:
        server.stop()
        ep.batcher.close()


def test_bart_endpoint_beam_decode():
    from deeplearningexamples_tpu.models.bart import BartTask
    from deeplearningexamples_tpu.models.translation import TransformerConfig
    from deeplearningexamples_tpu.serving.recipes import bart_endpoint

    tcfg = TransformerConfig(vocab_size=32, d_model=32, d_ff=64, num_heads=2,
                             encoder_layers=1, decoder_layers=1, max_len=16)
    task = BartTask(tcfg, jnp.float32)
    params, _ = task.init(jax.random.key(0))
    ep = bart_endpoint(task.model, params, tcfg, beam_size=2,
                       max_target_len=8, batch_buckets=(1, 2))
    try:
        src = np.full((16,), tcfg.pad_id, np.int32)
        src[:5] = [tcfg.bos_id, 7, 8, 9, tcfg.eos_id]
        out = ep.batcher.infer({"src": src}, timeout=300)
        assert out["tokens"].shape == (8,)
        assert np.isfinite(out["scores"])
    finally:
        ep.batcher.close()


def test_quartznet_streaming_recipe():
    from deeplearningexamples_tpu.models.asr import (
        JasperBlock, JasperConfig, JasperTask,
    )
    from deeplearningexamples_tpu.serving.recipes import (
        quartznet_streaming_server,
    )

    cfg = JasperConfig(blocks=(
        JasperBlock(1, 32, 11, 0.0, residual=False, separable=True, stride=2),
        JasperBlock(2, 32, 11, 0.0, separable=True),
    ))
    task = JasperTask(cfg, jnp.float32)
    params, mstate = task.init(jax.random.key(0))
    srv = quartznet_streaming_server(task, params, mstate, chunk_frames=32,
                                     context_frames=16)
    rng = np.random.default_rng(0)
    audio = rng.normal(size=16000).astype(np.float32) * 0.1
    r1 = srv.process_chunk("c1", audio[:8000])
    r2 = srv.process_chunk("c1", audio[8000:], last=True)
    assert "transcript" in r2 and r2["final"]
    assert srv.active_streams == 0  # property


def test_jasper_offline_endpoint_roundtrip(tmp_path):
    """Offline ASR serving (reference ``Jasper/triton/jasper-client.py``):
    padded mel feats + valid length -> greedy-CTC tokens, with a model-repo
    export/restore that is bit-identical."""
    from deeplearningexamples_tpu.models.asr import (
        JasperBlock, JasperConfig, JasperTask,
    )
    from deeplearningexamples_tpu.serving import (
        load_model_repository, save_model_repository,
    )
    from deeplearningexamples_tpu.serving.recipes import jasper_offline_endpoint

    cfg = JasperConfig(blocks=(
        JasperBlock(1, 32, 11, 0.0, residual=False, stride=2),
        JasperBlock(2, 32, 11, 0.0),
    ))
    task = JasperTask(cfg, jnp.float32)
    params, mstate = task.init(jax.random.key(0))
    ep = jasper_offline_endpoint(task, params, mstate, max_frames=64,
                                 max_tokens=16, batch_buckets=(1, 2))

    save_model_repository(str(tmp_path), "jasper", params,
                          input_spec=ep.input_spec,
                          output_names=ep.output_names)
    template = jax.tree_util.tree_map(np.zeros_like, params)
    restored, config = load_model_repository(str(tmp_path), "jasper", template)
    assert config["inputs"]["feats"]["shape"] == [64, cfg.n_mels]
    ep2 = jasper_offline_endpoint(task, restored, mstate,
                                  name="jasper_restored", max_frames=64,
                                  max_tokens=16, batch_buckets=(1, 2))
    try:
        rng = np.random.default_rng(0)
        req = {"feats": rng.normal(size=(64, cfg.n_mels)).astype(np.float32),
               "feat_len": np.array([40], np.int32)}
        a = ep.batcher.infer(req, timeout=300)
        b = ep2.batcher.infer(req, timeout=300)
        assert a["tokens"].shape == (16,)
        assert 0 <= int(a["n_tokens"][0]) <= 16
        # padded frames must not emit: valid output frames = ceil(40/2)
        np.testing.assert_array_equal(a["tokens"], b["tokens"])
        np.testing.assert_array_equal(a["n_tokens"], b["n_tokens"])
    finally:
        ep.batcher.close()
        ep2.batcher.close()


def test_jasper_offline_padding_invariance():
    """The valid-length mask makes transcripts invariant to pad frames —
    the property the reference gets from DALI's length metadata."""
    from deeplearningexamples_tpu.models.asr import (
        JasperBlock, JasperConfig, JasperTask,
    )
    from deeplearningexamples_tpu.serving.recipes import jasper_offline_endpoint

    cfg = JasperConfig(blocks=(
        JasperBlock(1, 32, 11, 0.0, residual=False, stride=2),
    ))
    task = JasperTask(cfg, jnp.float32)
    params, mstate = task.init(jax.random.key(1))
    ep = jasper_offline_endpoint(task, params, mstate, max_frames=64,
                                 max_tokens=16, batch_buckets=(1,))
    try:
        rng = np.random.default_rng(1)
        feats = rng.normal(size=(64, cfg.n_mels)).astype(np.float32)
        a = ep.batcher.infer(
            {"feats": feats, "feat_len": np.array([32], np.int32)},
            timeout=300)
        feats2 = feats.copy()
        feats2[32:] = 99.0  # garbage in the padded tail
        b = ep.batcher.infer(
            {"feats": feats2, "feat_len": np.array([32], np.int32)},
            timeout=300)
        np.testing.assert_array_equal(a["tokens"], b["tokens"])
    finally:
        ep.batcher.close()


def test_gnmt_endpoint_roundtrip(tmp_path):
    """Translation serving (reference ``GNMT/translate.py`` beam search):
    source ids -> best-beam target ids; export/restore bit-identical."""
    from deeplearningexamples_tpu.models.translation import GnmtConfig, GnmtTask
    from deeplearningexamples_tpu.serving import (
        load_model_repository, save_model_repository,
    )
    from deeplearningexamples_tpu.serving.recipes import gnmt_endpoint

    cfg = GnmtConfig(vocab_size=32, hidden_size=16, num_layers=2, dropout=0.0)
    task = GnmtTask(cfg, jnp.float32)
    params, _ = task.init(jax.random.key(0))
    ep = gnmt_endpoint(task, params, beam_size=2, max_len=8,
                       max_target_len=8, batch_buckets=(1, 2))
    save_model_repository(str(tmp_path), "gnmt", params,
                          input_spec=ep.input_spec,
                          output_names=ep.output_names)
    template = jax.tree_util.tree_map(np.zeros_like, params)
    restored, _ = load_model_repository(str(tmp_path), "gnmt", template)
    ep2 = gnmt_endpoint(task, restored, name="gnmt_restored", beam_size=2,
                        max_len=8, max_target_len=8, batch_buckets=(1, 2))
    try:
        src = np.full((8,), cfg.pad_id, np.int32)
        src[:4] = [5, 6, 7, cfg.eos_id]
        a = ep.batcher.infer({"src": src}, timeout=300)
        b = ep2.batcher.infer({"src": src}, timeout=300)
        assert a["tokens"].shape == (8,)
        assert int(a["tokens"][0]) == cfg.bos_id
        # classifier logits are padded_vocab (128) wide; lane-padded ids
        # must never surface even on an untrained model
        assert np.all((a["tokens"] >= 0) & (a["tokens"] < cfg.vocab_size))
        assert np.isfinite(a["scores"])
        np.testing.assert_array_equal(a["tokens"], b["tokens"])
    finally:
        ep.batcher.close()
        ep2.batcher.close()


def test_transformer_xl_generate_endpoint():
    """LM generation serving (reference Transformer-XL ``pytorch/eval.py``
    inference role): context window -> greedy continuation, deterministic."""
    from deeplearningexamples_tpu.models.transformer_xl import (
        TransformerXLConfig, TransformerXLTask,
    )
    from deeplearningexamples_tpu.serving.recipes import (
        transformer_xl_generate_endpoint,
    )

    cfg = TransformerXLConfig(vocab_size=64, d_model=32, n_heads=2, d_head=16,
                              d_ff=64, n_layers=2, seg_len=16, mem_len=16)
    task = TransformerXLTask(cfg, jnp.float32)
    params, _ = task.init(jax.random.key(0))
    ep = transformer_xl_generate_endpoint(task, params, gen_len=8,
                                          batch_buckets=(1, 2))
    try:
        ctx = np.arange(16, dtype=np.int32) % cfg.vocab_size
        a = ep.batcher.infer({"context": ctx}, timeout=300)
        b = ep.batcher.infer({"context": ctx}, timeout=300)
        assert a["generated"].shape == (8,)
        # logits are padded_vocab (128) wide; greedy decode must never
        # emit a lane-padded id (it would feed back into the window)
        assert np.all((a["generated"] >= 0)
                      & (a["generated"] < cfg.vocab_size))
        np.testing.assert_array_equal(a["generated"], b["generated"])
    finally:
        ep.batcher.close()


def test_transformer_xl_repo_roundtrip(tmp_path):
    """Export the Transformer-XL LM to a model repository, restore into a
    fresh endpoint, and require bit-identical greedy generations (the
    reference's triton model-store contract)."""
    from deeplearningexamples_tpu.models.transformer_xl import (
        TransformerXLConfig, TransformerXLTask,
    )
    from deeplearningexamples_tpu.serving import (
        load_model_repository, save_model_repository,
    )
    from deeplearningexamples_tpu.serving.recipes import (
        transformer_xl_generate_endpoint,
    )

    cfg = TransformerXLConfig(vocab_size=64, d_model=32, n_heads=2, d_head=16,
                              d_ff=64, n_layers=2, seg_len=16, mem_len=16)
    task = TransformerXLTask(cfg, jnp.float32)
    params, _ = task.init(jax.random.key(4))
    ep = transformer_xl_generate_endpoint(task, params, gen_len=8,
                                          batch_buckets=(1, 2))
    save_model_repository(str(tmp_path), "txl", params,
                          input_spec=ep.input_spec,
                          output_names=ep.output_names)
    template = jax.tree_util.tree_map(np.zeros_like, params)
    restored, _ = load_model_repository(str(tmp_path), "txl", template)
    ep2 = transformer_xl_generate_endpoint(task, restored,
                                           name="txl_restored", gen_len=8,
                                           batch_buckets=(1, 2))
    try:
        ctx = (np.arange(16, dtype=np.int32) * 3) % cfg.vocab_size
        a = ep.batcher.infer({"context": ctx}, timeout=300)
        b = ep2.batcher.infer({"context": ctx}, timeout=300)
        np.testing.assert_array_equal(a["generated"], b["generated"])
    finally:
        ep.batcher.close()
        ep2.batcher.close()


def test_unet_endpoint_roundtrip(tmp_path):
    """Segmentation serving (reference ``nnUNet/triton/
    run_inference_on_triton.py``): patch -> labels + probs; export/restore
    bit-identical."""
    from deeplearningexamples_tpu.models.unet import UNetConfig, UNetTask
    from deeplearningexamples_tpu.serving import (
        load_model_repository, save_model_repository,
    )
    from deeplearningexamples_tpu.serving.recipes import unet_endpoint

    cfg = UNetConfig(spatial_rank=2, in_channels=1, n_classes=3,
                     base_filters=8, depth=2, deep_supervision=False)
    task = UNetTask(cfg, jnp.float32)
    params, _ = task.init(jax.random.key(0), patch=32)
    ep = unet_endpoint(task, params, patch=32, batch_buckets=(1, 2))
    save_model_repository(str(tmp_path), "unet", params,
                          input_spec=ep.input_spec,
                          output_names=ep.output_names)
    template = jax.tree_util.tree_map(np.zeros_like, params)
    restored, _ = load_model_repository(str(tmp_path), "unet", template)
    ep2 = unet_endpoint(task, restored, name="unet_restored", patch=32,
                        batch_buckets=(1, 2))
    try:
        rng = np.random.default_rng(0)
        img = rng.normal(size=(32, 32, 1)).astype(np.float32)
        a = ep.batcher.infer({"image": img}, timeout=300)
        b = ep2.batcher.infer({"image": img}, timeout=300)
        assert a["mask"].shape == (32, 32)
        assert a["probs"].shape == (32, 32, 3)
        np.testing.assert_allclose(np.sum(a["probs"], -1), 1.0, rtol=1e-5)
        np.testing.assert_array_equal(a["mask"], b["mask"])
    finally:
        ep.batcher.close()
        ep2.batcher.close()


def test_ncf_endpoint_ranking(tmp_path):
    """Recommendation serving (reference ``NCF/inference.py``): user +
    candidate items -> scores and ranking; ranking consistent with scores,
    and the exported repository restores to bit-identical scores."""
    from deeplearningexamples_tpu.models.ncf import NcfConfig, NcfTask
    from deeplearningexamples_tpu.serving import (
        load_model_repository, save_model_repository,
    )
    from deeplearningexamples_tpu.serving.recipes import ncf_endpoint

    cfg = NcfConfig(nb_users=50, nb_items=40, mf_dim=8,
                    mlp_layer_sizes=(16, 8))
    task = NcfTask(cfg, jnp.float32)
    params, _ = task.init(jax.random.key(0))
    ep = ncf_endpoint(task, params, n_candidates=10, batch_buckets=(1, 2))
    save_model_repository(str(tmp_path), "ncf", params,
                          input_spec=ep.input_spec,
                          output_names=ep.output_names)
    template = jax.tree_util.tree_map(np.zeros_like, params)
    restored, _ = load_model_repository(str(tmp_path), "ncf", template)
    ep2 = ncf_endpoint(task, restored, name="ncf_restored", n_candidates=10,
                       batch_buckets=(1, 2))
    try:
        items = np.arange(10, dtype=np.int32)
        out = ep.batcher.infer(
            {"user": np.array([3], np.int32), "items": items}, timeout=300)
        assert out["scores"].shape == (10,)
        order = out["ranking"]
        s = out["scores"]
        assert np.all(np.diff(s[order]) <= 1e-7)  # ranking sorts descending
        out2 = ep2.batcher.infer(
            {"user": np.array([3], np.int32), "items": items}, timeout=300)
        np.testing.assert_array_equal(out["scores"], out2["scores"])
    finally:
        ep.batcher.close()
        ep2.batcher.close()


def test_tft_model_repository_roundtrip(tmp_path):
    """Per-family serving repo for a round-2 model (reference ships a
    ``TFT/triton/`` deployment dir): save the repo from live params using
    the recipe's own input_spec, restore in a fresh template, rebuild the
    endpoint, and assert inference is bit-identical to pre-export."""
    from deeplearningexamples_tpu.models.tft import TFTConfig, TFTTask
    from deeplearningexamples_tpu.serving import (
        load_model_repository,
        save_model_repository,
    )
    from deeplearningexamples_tpu.serving.recipes import tft_endpoint

    task = TFTTask(TFTConfig(hidden=16, n_heads=2, encoder_len=12, horizon=4))
    params, _ = task.init(jax.random.key(0))
    ep = tft_endpoint(task, params, batch_buckets=(1, 2))

    save_model_repository(
        str(tmp_path), "tft", params,
        input_spec=ep.input_spec, output_names=ep.output_names,
    )
    template = jax.tree_util.tree_map(np.zeros_like, params)
    restored, config = load_model_repository(str(tmp_path), "tft", template)
    assert config["inputs"]["observed"]["shape"] == [12, 4]
    assert config["outputs"] == ["quantiles"]

    ep2 = tft_endpoint(task, restored, name="tft_restored", batch_buckets=(1, 2))
    try:
        rng = np.random.default_rng(0)
        req = {
            "observed": rng.normal(size=(12, 4)).astype(np.float32),
            "known": rng.normal(size=(16, 2)).astype(np.float32),
        }
        a = np.asarray(ep.batcher.infer(req)["quantiles"])
        b = np.asarray(ep2.batcher.infer(req)["quantiles"])
        np.testing.assert_array_equal(a, b)
    finally:
        ep.batcher.close()
        ep2.batcher.close()


def test_fastpitch_hifigan_endpoint_roundtrip(tmp_path):
    """Parallel TTS serving (reference ``FastPitch/triton/`` — FastPitch +
    HiFi-GAN vocoder): padded symbol ids -> waveform; repo export/restore of
    both param trees is bit-identical."""
    from deeplearningexamples_tpu.models.tts import (
        FastPitchConfig, FastPitchTask, HiFiGanConfig, HiFiGanTask,
    )
    from deeplearningexamples_tpu.serving import (
        load_model_repository, save_model_repository,
    )
    from deeplearningexamples_tpu.serving.recipes import (
        fastpitch_hifigan_endpoint,
    )

    fcfg = FastPitchConfig(n_symbols=32, d_model=16, n_heads=1, head_dim=16,
                           encoder_layers=1, decoder_layers=1,
                           conv_filters=32, n_mels=8, max_mel_len=64,
                           predictor_filters=8, energy=True)
    hcfg = HiFiGanConfig(n_mels=8, upsample_rates=(4, 2),
                         upsample_kernels=(8, 4),
                         upsample_initial_channel=16,
                         resblock_kernels=(3,), resblock_dilations=((1, 3),),
                         segment_length=256, hop_length=8,
                         mpd_channels=(4, 8), msd_channels=(4, 8),
                         msd_scales=2)
    fp_task = FastPitchTask(fcfg, jnp.float32)
    hf_task = HiFiGanTask(hcfg, jnp.float32)
    fp_params, _ = fp_task.init(jax.random.key(0))
    g_params, _ = hf_task.init(jax.random.key(1))

    ep = fastpitch_hifigan_endpoint(
        fp_task, fp_params, hf_task, g_params,
        max_text_len=16, max_mel_len=32, batch_buckets=(1, 2))
    save_model_repository(
        str(tmp_path), "fastpitch_tts",
        {"fastpitch": fp_params, "hifigan": g_params},
        input_spec=ep.input_spec, output_names=ep.output_names)
    template = jax.tree_util.tree_map(
        np.zeros_like, {"fastpitch": fp_params, "hifigan": g_params})
    restored, _ = load_model_repository(str(tmp_path), "fastpitch_tts",
                                        template)
    ep2 = fastpitch_hifigan_endpoint(
        fp_task, restored["fastpitch"], hf_task, restored["hifigan"],
        name="fastpitch_tts_restored", max_text_len=16, max_mel_len=32,
        batch_buckets=(1, 2))
    try:
        text = np.zeros((16,), np.int32)
        text[:5] = [3, 7, 11, 2, 9]
        a = ep.batcher.infer({"text": text}, timeout=300)
        b = ep2.batcher.infer({"text": text}, timeout=300)
        hop = hcfg.hop_length
        assert a["audio"].shape == (32 * hop,)
        assert int(a["audio_len"]) == int(a["mel_len"]) * hop
        assert 0 <= int(a["mel_len"]) <= 32
        assert np.all(np.abs(a["audio"]) <= 1.0)  # tanh output
        np.testing.assert_array_equal(a["audio"], b["audio"])
    finally:
        ep.batcher.close()
        ep2.batcher.close()
