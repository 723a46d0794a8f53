"""Flat-parameter fused LAMB (core/flat.py) vs the per-tensor XLA LAMB.

The flat path is the production optimizer for BERT pretraining (VERDICT
round-1 item 3); these tests pin its math to ``ops.lamb.lamb`` and prove the
end-to-end train-step integration (flat gradients via unflatten's VJP,
``returns_new_params`` contract).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplearningexamples_tpu.core.flat import (
    default_wd_mask,
    flatten_train,
    unflatten,
)
from deeplearningexamples_tpu.core.train import create_train_state, make_train_step
from deeplearningexamples_tpu.ops.lamb import lamb


def _tree(rng):
    return {
        "dense": {
            "kernel": jnp.asarray(rng.normal(size=(64, 32)), jnp.float32),
            "bias": jnp.asarray(rng.normal(size=(32,)), jnp.float32),
        },
        "ln": {
            "scale": jnp.asarray(rng.normal(size=(64,)), jnp.float32),
            "bias": jnp.asarray(rng.normal(size=(64,)), jnp.float32),
        },
    }


def test_flat_lamb_matches_tree_lamb():
    rng = np.random.default_rng(0)
    params = _tree(rng)

    def loss_fn(p, ms, batch, r):
        x = batch["x"]
        y = jnp.tanh(x * p["ln"]["scale"] + p["ln"]["bias"]) @ p["dense"]["kernel"]
        y = y + p["dense"]["bias"]
        loss = jnp.mean((y - batch["y"]) ** 2)
        return loss, (ms, {})

    lr = 0.01
    mask = default_wd_mask(params)
    tx_tree = lamb(lr, weight_decay=0.01, mask=mask)
    flat_loss, tx_flat, flat_params = flatten_train(
        loss_fn, params, lr=lr, weight_decay=0.01
    )

    step_tree = make_train_step(loss_fn, tx_tree)
    step_flat = make_train_step(flat_loss, tx_flat)
    s_tree = create_train_state(params, tx_tree, jax.random.key(1))
    s_flat = create_train_state(flat_params, tx_flat, jax.random.key(1))

    batch = {
        "x": jnp.asarray(rng.normal(size=(8, 64)), jnp.float32),
        "y": jnp.asarray(rng.normal(size=(8, 32)), jnp.float32),
    }
    for _ in range(3):
        s_tree, m_tree = step_tree(s_tree, batch)
        s_flat, m_flat = step_flat(s_flat, batch)

    got = unflatten(flat_loss.layout, s_flat.params, flat_loss.dtypes)
    for path, a in jax.tree_util.tree_flatten_with_path(s_tree.params)[0]:
        b = got
        for k in path:
            b = b[k.key]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=2e-6, err_msg=str(path))
    np.testing.assert_allclose(
        float(m_tree["loss"]), float(m_flat["loss"]), rtol=1e-5
    )


def test_flat_grad_equals_tree_grad():
    rng = np.random.default_rng(1)
    params = _tree(rng)

    def loss_fn(p, ms, batch, r):
        y = batch["x"] @ p["dense"]["kernel"] * jnp.mean(p["ln"]["scale"])
        return jnp.sum(y**2) * 1e-3, (ms, {})

    flat_loss, _, flat_params = flatten_train(loss_fn, params, lr=0.1)
    batch = {"x": jnp.asarray(rng.normal(size=(4, 64)), jnp.float32)}

    g_tree = jax.grad(lambda p: loss_fn(p, {}, batch, None)[0])(params)
    g_flat = jax.grad(lambda f: flat_loss(f, {}, batch, None)[0])(flat_params)
    g_back = unflatten(flat_loss.layout, g_flat, flat_loss.dtypes)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        g_tree, g_back,
    )


def test_default_wd_mask_excludes_bias_and_scale():
    params = _tree(np.random.default_rng(2))
    mask = default_wd_mask(params)
    assert mask["dense"]["kernel"] is True
    assert mask["dense"]["bias"] is False
    assert mask["ln"]["scale"] is False
    assert mask["ln"]["bias"] is False


def test_flat_lamb_bf16_moments_close():
    rng = np.random.default_rng(3)
    params = _tree(rng)

    def loss_fn(p, ms, batch, r):
        y = batch["x"] @ p["dense"]["kernel"] + p["dense"]["bias"]
        return jnp.mean(y**2), (ms, {})

    outs = {}
    for name, mdt in [("fp32", jnp.float32), ("bf16", jnp.bfloat16)]:
        flat_loss, tx, fp = flatten_train(
            loss_fn, params, lr=0.01, moment_dtype=mdt
        )
        step = make_train_step(flat_loss, tx)
        s = create_train_state(fp, tx, jax.random.key(0))
        batch = {"x": jnp.asarray(rng.normal(size=(8, 64)), jnp.float32)}
        for _ in range(2):
            s, _ = step(s, batch)
        outs[name] = np.asarray(s.params)
    # u = m/(sqrt(v)+eps) is ill-conditioned where the gradient is ~0, so a
    # handful of elements diverge under bf16 moments by design; assert the
    # overwhelming majority track the fp32 trajectory
    close = np.isclose(outs["fp32"], outs["bf16"], rtol=0.05, atol=1e-3)
    assert close.mean() > 0.99, f"only {close.mean():.4f} of params close"
