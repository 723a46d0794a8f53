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
