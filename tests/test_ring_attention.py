"""Ring attention (sequence-parallel) vs the single-device oracle.

The reference has no sequence/context parallelism (SURVEY.md §2.D), so the
bar here is our own `mha_reference` oracle: the ring's cross-device online
softmax must match exact full attention — forward and gradients — on the
8-device CPU mesh with the `sequence` axis populated.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplearningexamples_tpu.ops.flash_attention import mha_reference
from deeplearningexamples_tpu.ops.ring_attention import ring_attention
from deeplearningexamples_tpu.parallel import MeshSpec, build_mesh

B, H, S, D = 2, 2, 64, 16


@pytest.fixture(scope="module")
def seq_mesh():
    return build_mesh(MeshSpec(data=1, model=1, sequence=8))


def _qkv(seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.key(seed), 3)
    q = jax.random.normal(ks[0], (B, H, S, D), dtype)
    k = jax.random.normal(ks[1], (B, H, S, D), dtype)
    v = jax.random.normal(ks[2], (B, H, S, D), dtype)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_forward_matches_oracle(seq_mesh, causal):
    q, k, v = _qkv()
    out = jax.jit(
        lambda q, k, v: ring_attention(q, k, v, mesh=seq_mesh, causal=causal)
    )(q, k, v)
    ref = mha_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_key_mask_matches_oracle(seq_mesh):
    q, k, v = _qkv(seed=1)
    # every row keeps >= 1 valid key (an all-masked row has no softmax limit)
    mask = (jax.random.uniform(jax.random.key(7), (B, S)) > 0.3)
    mask = mask.at[:, 0].set(True).astype(jnp.float32)
    out = jax.jit(
        lambda q, k, v, m: ring_attention(q, k, v, m, mesh=seq_mesh)
    )(q, k, v, mask)
    ref = mha_reference(q, k, v, key_mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_gradients_match_oracle(seq_mesh, causal):
    q, k, v = _qkv(seed=2)
    g = jax.random.normal(jax.random.key(9), (B, H, S, D))

    def ring_loss(q, k, v):
        return jnp.sum(
            ring_attention(q, k, v, mesh=seq_mesh, causal=causal) * g
        )

    def ref_loss(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=causal) * g)

    got = jax.jit(jax.grad(ring_loss, argnums=(0, 1, 2)))(q, k, v)
    want = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5,
            err_msg=f"d{name} mismatch",
        )


def test_bf16_inputs_fp32_accumulate(seq_mesh):
    q, k, v = _qkv(seed=3, dtype=jnp.bfloat16)
    out = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh=seq_mesh))(
        q, k, v
    )
    assert out.dtype == jnp.bfloat16
    ref = mha_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=2e-2, rtol=2e-2
    )


def test_seq_not_divisible_raises(seq_mesh):
    q, k, v = _qkv()
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention(q[:, :, :60], k[:, :, :60], v[:, :, :60],
                       mesh=seq_mesh)


def test_bert_ring_impl_matches_xla(seq_mesh):
    """BERT with attention_impl="ring" under jax.set_mesh(sequence=8) must
    match the plain-XLA attention path on the same params — the model-level
    integration of the SP op (long-context BERT beyond one chip's S^2)."""
    import dataclasses

    from deeplearningexamples_tpu.models.bert.modeling import (
        BERT_CONFIGS, BertModel,
    )

    tiny = BERT_CONFIGS["tiny"]
    m_ring = BertModel(
        dataclasses.replace(tiny, attention_impl="ring"), dtype=jnp.float32)
    m_xla = BertModel(
        dataclasses.replace(tiny, attention_impl="xla"), dtype=jnp.float32)
    ids = jax.random.randint(jax.random.key(0), (2, 64), 0, 1000)
    mask = jnp.concatenate(
        [jnp.ones((2, 40), jnp.int32), jnp.zeros((2, 24), jnp.int32)], axis=1)
    variables = m_xla.init(jax.random.key(1), ids, mask)
    seq_xla, pooled_xla = m_xla.apply(variables, ids, mask)
    with jax.set_mesh(seq_mesh):
        seq_ring, pooled_ring = jax.jit(
            lambda v, i, m: m_ring.apply(v, i, m)
        )(variables, ids, mask)
    np.testing.assert_allclose(
        np.asarray(seq_ring)[:, :40], np.asarray(seq_xla)[:, :40],
        rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(pooled_ring), np.asarray(pooled_xla),
        rtol=2e-4, atol=2e-4)


def test_zigzag_forward_matches_oracle(seq_mesh):
    """Zigzag layout (2n-chunk load-balanced causal ring) must equal exact
    full attention — same numerics as contiguous, half the ring FLOPs."""
    q, k, v = _qkv(seed=11)
    out = jax.jit(
        lambda q, k, v: ring_attention(
            q, k, v, mesh=seq_mesh, causal=True, zigzag=True)
    )(q, k, v)
    ref = mha_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_zigzag_gradients_match_oracle(seq_mesh):
    q, k, v = _qkv(seed=12)
    g = jax.random.normal(jax.random.key(13), (B, H, S, D))

    def zz_loss(q, k, v):
        return jnp.sum(
            ring_attention(q, k, v, mesh=seq_mesh, causal=True, zigzag=True)
            * g
        )

    def ref_loss(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=True) * g)

    got = jax.jit(jax.grad(zz_loss, argnums=(0, 1, 2)))(q, k, v)
    want = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5,
            err_msg=f"d{name} mismatch (zigzag)",
        )


def test_zigzag_key_mask_matches_oracle(seq_mesh):
    q, k, v = _qkv(seed=14)
    mask = (jax.random.uniform(jax.random.key(15), (B, S)) > 0.3)
    mask = mask.at[:, 0].set(True).astype(jnp.float32)
    out = jax.jit(
        lambda q, k, v, m: ring_attention(
            q, k, v, m, mesh=seq_mesh, causal=True, zigzag=True)
    )(q, k, v, mask)
    ref = mha_reference(q, k, v, key_mask=mask, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_zigzag_dropout_matches_contiguous(seq_mesh):
    """The dropout hash is on GLOBAL positions, so the zigzag decomposition
    must drop the exact same attention entries as the contiguous ring."""
    q, k, v = _qkv(seed=16)
    seed = 777
    out_zz = jax.jit(
        lambda q, k, v: ring_attention(
            q, k, v, mesh=seq_mesh, causal=True, zigzag=True,
            dropout_rate=0.1, dropout_seed=seed)
    )(q, k, v)
    out_ring = jax.jit(
        lambda q, k, v: ring_attention(
            q, k, v, mesh=seq_mesh, causal=True,
            dropout_rate=0.1, dropout_seed=seed)
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(out_zz), np.asarray(out_ring),
                               atol=1e-5, rtol=1e-5)


def test_zigzag_requires_causal(seq_mesh):
    q, k, v = _qkv()
    with pytest.raises(ValueError, match="causal"):
        ring_attention(q, k, v, mesh=seq_mesh, causal=False, zigzag=True)


def test_dropout_matches_flash_interpret(seq_mesh):
    """Attention-prob dropout in the ring uses the flash kernel's stateless
    positional hash on GLOBAL positions with the same salt scheme, so for
    one seed the 8-way ring and the single-device flash kernel (interpret
    path on CPU) must produce the SAME dropped attention — exactly."""
    from deeplearningexamples_tpu.ops.flash_attention import flash_attention

    q, k, v = _qkv(seed=5)
    seed = 1234
    out_ring = jax.jit(
        lambda q, k, v: ring_attention(
            q, k, v, mesh=seq_mesh, dropout_rate=0.1, dropout_seed=seed)
    )(q, k, v)
    out_flash = flash_attention(
        q, k, v, dropout_rate=0.1, dropout_seed=seed)
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_flash),
                               atol=1e-5, rtol=1e-5)
    # and dropout actually did something
    out_nodrop = ring_attention(q, k, v, mesh=seq_mesh)
    assert np.abs(np.asarray(out_ring) - np.asarray(out_nodrop)).max() > 1e-3
