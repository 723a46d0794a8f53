"""Mask-regenerating dropout op (ops/dropout.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from deeplearningexamples_tpu.ops.dropout import RegenDropout, regen_dropout


def _args(key):
    return jax.random.key_data(key), str(jax.random.key_impl(key))


def test_regen_dropout_semantics():
    key = jax.random.key(7)
    kd, impl = _args(key)
    x = jnp.ones((64, 256), jnp.float32)
    rate = 0.3
    y = regen_dropout(x, kd, rate, impl)
    y2 = regen_dropout(x, kd, rate, impl)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))  # deterministic
    vals = np.unique(np.asarray(y))
    scale = 1.0 / (1.0 - rate)
    assert all(abs(v) < 1e-6 or abs(v - scale) < 1e-5 for v in vals)
    keep = float((np.asarray(y) != 0).mean())
    assert abs(keep - (1 - rate)) < 0.03  # 16k samples
    # different key -> different mask
    kd2, _ = _args(jax.random.key(8))
    y3 = regen_dropout(x, kd2, rate, impl)
    assert not np.array_equal(np.asarray(y), np.asarray(y3))


def test_regen_dropout_grad_matches_forward_mask():
    """bwd must regenerate the EXACT forward mask: d/dx sum(dropout(x)) is
    the keep/(1-rate) mask itself."""
    key = jax.random.key(3)
    kd, impl = _args(key)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((32, 128)),
                    jnp.float32)
    rate = 0.4
    y = regen_dropout(x, kd, rate, impl)
    g = jax.grad(lambda x: jnp.sum(regen_dropout(x, kd, rate, impl)))(x)
    mask_fwd = np.asarray(y) / np.where(np.asarray(x) == 0, 1, np.asarray(x))
    # compare where x != 0 (mask = y/x there); zeros of x carry no signal
    nz = np.asarray(x) != 0
    np.testing.assert_allclose(np.asarray(g)[nz], mask_fwd[nz], rtol=1e-6)


def test_regen_dropout_module_and_rate0():
    import flax.linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic):
            return RegenDropout(0.5)(x, deterministic)

    net = Net()
    x = jnp.ones((8, 8))
    # deterministic passthrough needs no rng
    out = net.apply({}, x, True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    out2 = net.apply({}, x, False, rngs={"dropout": jax.random.key(0)})
    assert set(np.unique(np.asarray(out2))) <= {0.0, 2.0}

    class Net0(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic):
            return RegenDropout(0.0)(x, deterministic)

    out3 = Net0().apply({}, x, False)
    np.testing.assert_array_equal(np.asarray(out3), np.asarray(x))


def test_regen_dropout_rbg_impl():
    key = jax.random.key(5, impl="rbg")
    kd, impl = _args(key)
    x = jnp.ones((16, 128), jnp.bfloat16)
    y = regen_dropout(x, kd, 0.1, impl)
    y2 = regen_dropout(x, kd, 0.1, impl)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))
    g = jax.grad(lambda x: jnp.sum(
        regen_dropout(x, kd, 0.1, impl).astype(jnp.float32)))(x)
    np.testing.assert_array_equal(
        np.asarray(g) != 0, np.asarray(y) != 0)
