"""Golden tests: Pallas flash attention vs pure-jnp reference (fwd + grads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplearningexamples_tpu.ops import flash_attention, mha_reference


def make_qkv(b=2, h=4, s=128, d=64, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    shape = (b, h, s, d)
    q = jnp.asarray(rng.normal(size=shape), dtype)
    k = jnp.asarray(rng.normal(size=shape), dtype)
    v = jnp.asarray(rng.normal(size=shape), dtype)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_forward_matches_reference(causal):
    q, k, v = make_qkv()
    out = flash_attention(q, k, v, causal=causal, block_q=64)
    ref = mha_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_forward_with_padding_mask():
    q, k, v = make_qkv(b=2, s=128)
    mask = np.ones((2, 128), np.int32)
    mask[0, 100:] = 0
    mask[1, 64:] = 0
    mask = jnp.asarray(mask)
    out = flash_attention(q, k, v, key_mask=mask, block_q=64)
    ref = mha_reference(q, k, v, key_mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_grads_match_reference(causal):
    q, k, v = make_qkv(b=1, h=2, s=64, d=64)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal, block_q=32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=causal) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, rtol=5e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_grads_with_mask():
    q, k, v = make_qkv(b=2, h=2, s=64, d=64)
    mask = np.ones((2, 64), np.int32)
    mask[0, 48:] = 0
    mask = jnp.asarray(mask)

    g1 = jax.grad(lambda q: jnp.sum(flash_attention(q, k, v, key_mask=mask, block_q=32)))(q)
    g2 = jax.grad(lambda q: jnp.sum(mha_reference(q, k, v, key_mask=mask)))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=5e-4, rtol=5e-4)


def test_bf16_forward_close():
    q, k, v = make_qkv(dtype=jnp.bfloat16)
    out = flash_attention(q, k, v)
    ref = mha_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=3e-2, rtol=3e-2
    )


def test_uneven_seq_blocks():
    # seq not a multiple of block_q exercises the cdiv/padding path
    q, k, v = make_qkv(b=1, h=1, s=96, d=64)
    out = flash_attention(q, k, v, block_q=64)
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_bshd_layout_matches_reference():
    """bshd layout (no head transpose) must equal the bhsd path and the
    jnp oracle, forward and backward."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deeplearningexamples_tpu.ops.flash_attention import (
        flash_attention, mha_reference,
    )

    rng = np.random.default_rng(0)
    b, h, s, d = 2, 4, 256, 64
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, size=(b, s)) | (np.arange(s) < 4),
                       jnp.int32)

    def to_bhsd(t):
        return t.transpose(0, 2, 1, 3)

    out_bshd = flash_attention(q, k, v, key_mask=mask, layout="bshd")
    out_ref = mha_reference(to_bhsd(q), to_bhsd(k), to_bhsd(v), key_mask=mask)
    np.testing.assert_allclose(
        np.asarray(to_bhsd(out_bshd)), np.asarray(out_ref), atol=2e-5, rtol=2e-5
    )

    def loss_bshd(q, k, v):
        return jnp.sum(flash_attention(q, k, v, key_mask=mask, layout="bshd") ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, key_mask=mask) ** 2)

    g_bshd = jax.grad(loss_bshd, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(to_bhsd(q), to_bhsd(k), to_bhsd(v))
    for a, b_ in zip(g_bshd, g_ref):
        np.testing.assert_allclose(
            np.asarray(to_bhsd(a)), np.asarray(b_), atol=5e-4, rtol=5e-4
        )


@pytest.mark.parametrize("causal", [False, True])
def test_kblocked_matches_reference(causal):
    """Online-softmax K-blocked kernels (block_k set) vs the jnp oracle,
    forward and backward, with a ragged key mask."""
    rng = np.random.default_rng(7)
    b, h, s, d = 2, 2, 64, 32
    q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    mask = np.ones((b, s), np.int32)
    mask[0, 48:] = 0
    mask = jnp.asarray(mask)

    out = flash_attention(q, k, v, key_mask=mask, causal=causal,
                          block_q=16, block_k=16)
    ref = mha_reference(q, k, v, key_mask=mask, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, key_mask=mask, causal=causal,
                            block_q=16, block_k=16)
        return jnp.sum(o * jnp.cos(o))

    def loss_ref(q, k, v):
        o = mha_reference(q, k, v, key_mask=mask, causal=causal)
        return jnp.sum(o * jnp.cos(o))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=5e-4)


def test_kblocked_bshd_layout():
    rng = np.random.default_rng(8)
    b, s, h, d = 2, 64, 2, 32
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    out = flash_attention(q, k, v, block_q=16, block_k=32, layout="bshd")
    ref = mha_reference(*(t.transpose(0, 2, 1, 3) for t in (q, k, v)))
    np.testing.assert_allclose(np.asarray(out.transpose(0, 2, 1, 3)),
                               np.asarray(ref), atol=2e-5, rtol=2e-5)


def _reference_with_hash_dropout(q, k, v, seed, rate, key_mask=None):
    """jnp reference applying the SAME stateless hash mask the kernel
    uses (bhsd path salt = bi * H + hi) — enables exact-equality tests."""
    from deeplearningexamples_tpu.ops.flash_attention import _dropout_scale

    b, h, s, d = q.shape
    scale = 1.0 / np.sqrt(d)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    if key_mask is not None:
        logits = jnp.where(key_mask[:, None, None, :].astype(bool),
                           logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    rows = jnp.arange(s, dtype=jnp.int32)[:, None] * jnp.ones((1, s), jnp.int32)
    cols = jnp.arange(s, dtype=jnp.int32)[None, :] * jnp.ones((s, 1), jnp.int32)
    drops = jnp.stack([
        jnp.stack([
            _dropout_scale(rows, cols, jnp.int32(seed), bi * h + hi, rate)
            for hi in range(h)
        ]) for bi in range(b)
    ])  # (B, H, S, S)
    return jnp.einsum("bhqk,bhkd->bhqd", p * drops, v.astype(jnp.float32))


def test_inkernel_dropout_matches_hash_reference():
    """The kernel's dropout must EXACTLY equal softmax->mask->V with the
    same hash mask, forward and backward — not just statistically."""
    rng = np.random.default_rng(0)
    b, h, s, d = 2, 2, 64, 32
    q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    rate, seed = 0.3, 1234

    out = flash_attention(q, k, v, block_q=32, dropout_rate=rate,
                          dropout_seed=seed)
    ref = _reference_with_hash_dropout(q, k, v, seed, rate)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # dropped fraction is near the rate
    kept = float((np.asarray(out) != 0).mean())
    assert kept > 0.5  # outputs mix many keys; just sanity that it ran

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, block_q=32, dropout_rate=rate,
                            dropout_seed=seed)
        return jnp.sum(o * jnp.sin(o))

    def loss_ref(q, k, v):
        o = _reference_with_hash_dropout(q, k, v, seed, rate)
        return jnp.sum(o * jnp.sin(o))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=5e-4)


def test_inkernel_dropout_seed_and_rate_semantics():
    rng = np.random.default_rng(1)
    b, h, s, d = 1, 2, 64, 32
    q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    # rate 0 == plain flash
    base = flash_attention(q, k, v, block_q=32)
    z = flash_attention(q, k, v, block_q=32, dropout_rate=0.0,
                        dropout_seed=7)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(z))
    # same seed -> deterministic; different seed -> different
    a1 = flash_attention(q, k, v, block_q=32, dropout_rate=0.5,
                         dropout_seed=7)
    a2 = flash_attention(q, k, v, block_q=32, dropout_rate=0.5,
                         dropout_seed=7)
    a3 = flash_attention(q, k, v, block_q=32, dropout_rate=0.5,
                         dropout_seed=8)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert not np.allclose(np.asarray(a1), np.asarray(a3))
    # expectation preserved (inverted-scale dropout): means agree loosely
    assert abs(float(a1.mean()) - float(base.mean())) < 0.05


def test_inkernel_dropout_bshd_layout():
    rng = np.random.default_rng(2)
    b, s, h, d = 2, 64, 2, 64
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    mask = np.ones((b, s), np.int32)
    mask[1, 48:] = 0
    mask = jnp.asarray(mask)
    out = flash_attention(q, k, v, key_mask=mask, block_q=32, layout="bshd",
                          dropout_rate=0.4, dropout_seed=99)
    assert out.shape == (b, s, h, d)
    assert np.isfinite(np.asarray(out)).all()
    # deterministic
    out2 = flash_attention(q, k, v, key_mask=mask, block_q=32, layout="bshd",
                           dropout_rate=0.4, dropout_seed=99)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # gradients flow
    g = jax.grad(lambda q: jnp.sum(flash_attention(
        q, k, v, key_mask=mask, block_q=32, layout="bshd",
        dropout_rate=0.4, dropout_seed=99) ** 2))(q)
    assert np.isfinite(np.asarray(g)).all()
