"""Int8 quantization: roundtrip error bounds, stochastic unbiasedness,
quantized matmul accuracy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplearningexamples_tpu.ops.quantization import (
    dequantize,
    int8_matmul,
    quantize_activations,
    quantize_per_channel,
)


def test_weight_quant_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 32)) * np.linspace(0.1, 2.0, 32),
                    jnp.float32)
    q, scale = quantize_per_channel(w, axis=1)
    assert q.dtype == jnp.int8 and scale.shape == (1, 32)
    back = dequantize(q, scale)
    # per-channel symmetric int8: max error <= scale/2 per channel
    err = np.abs(np.asarray(back - w))
    assert (err <= np.asarray(scale)[0] / 2 + 1e-7).all()


def test_activation_quant_unbiased():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(128, 128)), jnp.float32)
    # stochastic rounding: averaging dequantized draws converges to x
    acc = np.zeros(x.shape, np.float64)
    n = 16
    for s in range(n):
        q, scale = quantize_activations(x, seed=s)
        acc += np.asarray(q, np.float64) * float(scale)
    bias = np.abs(acc / n - np.asarray(x)).mean()
    single_err = np.abs(
        np.asarray(quantize_activations(x, 0)[0], np.float64)
        * float(quantize_activations(x, 0)[1]) - np.asarray(x)
    ).mean()
    assert bias < single_err  # averaging reduces error -> rounding is stochastic


def test_int8_matmul_close_to_fp32():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(32, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 48)) * 0.1, jnp.float32)
    w_q, w_scale = quantize_per_channel(w, axis=1)
    out_q = int8_matmul(x, w_q, w_scale[0][None, :])
    out_f = x @ w
    rel = float(jnp.linalg.norm(out_q - out_f) / jnp.linalg.norm(out_f))
    assert rel < 0.02  # <2% relative error for well-scaled int8


def test_fake_quantize_ste():
    from deeplearningexamples_tpu.ops.quantization import fake_quantize

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32))
    fq = fake_quantize(w, -1)
    # quantize-dequantize error bounded by half a step per channel
    absmax = np.abs(np.asarray(w)).max(axis=(0, 1, 2))
    step = absmax / 127.0
    err = np.abs(np.asarray(fq) - np.asarray(w))
    assert (err <= step[None, None, None, :] / 2 + 1e-6).all()
    # straight-through: gradient of sum(fq) wrt w is 1 except at the clip
    # boundary (the per-channel absmax element ties maximum/minimum -> 0.5)
    g = np.asarray(jax.grad(lambda w: jnp.sum(fake_quantize(w, -1)))(w))
    assert ((g == 1.0) | (g == 0.5)).all()
    # only the per-channel absmax elements sit on the clip boundary
    assert (g == 1.0).mean() >= 1.0 - 16 / g.size - 1e-9


def test_qat_resnet_trains_and_shares_param_tree():
    import optax

    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step
    from deeplearningexamples_tpu.models.convnets import (
        ARCHS, ClassificationTask, ResNet,
    )

    arch = ARCHS["resnet18"]
    fp = ResNet(arch, num_classes=10, dtype=jnp.float32)
    q = ResNet(arch, num_classes=10, dtype=jnp.float32, quantized=True)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    vfp = fp.init(jax.random.key(0), x, train=False)
    vq = q.init(jax.random.key(0), x, train=False)
    # QAT must not change the parameter tree (fp32 ckpt -> QAT fine-tune)
    assert jax.tree_util.tree_structure(vfp["params"]) == \
        jax.tree_util.tree_structure(vq["params"])

    task = ClassificationTask(q, num_classes=10)
    params, mstate = task.init(jax.random.key(0), (32, 32, 3))
    tx = optax.sgd(0.05, momentum=0.9)
    state = create_train_state(params, tx, jax.random.key(1), mstate)
    step = make_train_step(task.loss_fn, tx, donate=False)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 10, 8).astype(np.int32)),
    }
    losses = []
    for _ in range(6):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
