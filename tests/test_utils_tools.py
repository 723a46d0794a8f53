"""Checkpoint tools + dist bootstrap fallback."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


def test_strip_checkpoint_roundtrip(tmp_path):
    from deeplearningexamples_tpu.core.checkpoint import CheckpointManager
    from deeplearningexamples_tpu.core.train import create_train_state
    from deeplearningexamples_tpu.serving.export import load_model_repository
    from deeplearningexamples_tpu.utils.checkpoint_tools import strip_checkpoint

    params = {"w": jnp.arange(4.0)}
    tx = optax.sgd(0.1)
    state = create_train_state(params, tx, jax.random.key(0),
                               {"batch_stats": {"m": jnp.ones(2)}}, ema=True)
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    ckpt_dir = str(tmp_path / "ckpt")
    CheckpointManager(ckpt_dir).save(7, state)

    repo = str(tmp_path / "repo")
    strip_checkpoint(
        ckpt_dir, state, repo, "toy",
        input_spec={"x": ((4,), "float32")}, use_ema=True,
    )
    payload, config = load_model_repository(repo, "toy")
    assert config["metadata"]["step"] == 7 and config["metadata"]["ema"]
    np.testing.assert_allclose(np.asarray(payload["params"]["w"]), np.arange(4.0))
    assert "batch_stats" in payload
    # optimizer state is gone
    assert "opt_state" not in payload


def test_classify_image(tmp_path):
    from PIL import Image

    from deeplearningexamples_tpu.models.convnets import ARCHS, ResNet, ResNetArch
    from deeplearningexamples_tpu.native import available
    from deeplearningexamples_tpu.utils.checkpoint_tools import classify_image

    if not available():
        pytest.skip("no native toolchain")
    arch = ResNetArch(layers=(1, 1, 1, 1), widths=(8, 8, 8, 8))
    model = ResNet(arch, num_classes=3, dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (80, 80, 3), dtype=np.uint8)
    )
    p = tmp_path / "x.jpg"
    img.save(p, "JPEG")
    out = classify_image(model, variables, str(p), labels=["cat", "dog", "fish"],
                         image_size=64, top_k=2)
    assert len(out) == 2
    assert out[0][0] in {"cat", "dog", "fish"}
    assert 0 <= out[0][1] <= 1 and out[0][1] >= out[1][1]


def test_initialize_distributed_single_process():
    from deeplearningexamples_tpu.parallel.dist import initialize_distributed

    info = initialize_distributed()
    assert info["process_count"] == 1
    assert info["device_count"] >= 1
