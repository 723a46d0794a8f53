"""BERT tests: shapes, LAMB math vs manual reference, pretrain/SQuAD steps."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deeplearningexamples_tpu.core.train import create_train_state, make_train_step
from deeplearningexamples_tpu.data import SyntheticBertLoader
from deeplearningexamples_tpu.models.bert import (
    BertConfig,
    BertPretrainTask,
    BertSquadTask,
)
from deeplearningexamples_tpu.ops.lamb import lamb

TINY = BertConfig(
    vocab_size=1000, hidden_size=64, num_layers=2, num_heads=2,
    intermediate_size=128, max_position_embeddings=128,
)


def test_pretrain_forward_shapes():
    task = BertPretrainTask(TINY, dtype=jnp.float32)
    params, _ = task.init(jax.random.key(0), seq_len=32)
    ids = jnp.ones((2, 32), jnp.int32)
    mlm, nsp = task.model.apply({"params": params}, ids, ids, jnp.zeros_like(ids))
    assert mlm.shape == (2, 32, TINY.padded_vocab)
    assert nsp.shape == (2, 2)
    # vocab padded to lane width
    assert TINY.padded_vocab % 128 == 0


def test_mlm_loss_ignores_unmasked():
    logits = jnp.zeros((1, 4, 10))
    labels = jnp.asarray([[-1, 3, -1, -1]])
    from deeplearningexamples_tpu.models.bert.task import _masked_lm_loss

    loss = _masked_lm_loss(logits, labels)
    # uniform logits -> loss = log(10) over exactly one position
    np.testing.assert_allclose(float(loss), np.log(10), rtol=1e-5)


def test_pretrain_step_loss_decreases():
    task = BertPretrainTask(TINY, dtype=jnp.float32)
    params, mstate = task.init(jax.random.key(0), seq_len=32)
    tx = lamb(1e-3, weight_decay=0.01)
    state = create_train_state(params, tx, jax.random.key(1), mstate)
    step = make_train_step(task.loss_fn, tx, donate=False)
    loader = SyntheticBertLoader(4, seq_len=32, vocab_size=1000, steps=8)
    losses = []
    for batch in loader:
        state, m = step(state, jax.tree.map(jnp.asarray, batch))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_squad_step_runs():
    task = BertSquadTask(TINY, dtype=jnp.float32)
    params, mstate = task.init(jax.random.key(0), seq_len=32)
    tx = optax.adamw(3e-5)
    state = create_train_state(params, tx, jax.random.key(1), mstate)
    step = make_train_step(task.loss_fn, tx, donate=False)
    batch = {
        "input_ids": jnp.ones((4, 32), jnp.int32),
        "attention_mask": jnp.ones((4, 32), jnp.int32),
        "token_type_ids": jnp.zeros((4, 32), jnp.int32),
        "start_positions": jnp.asarray([1, 2, 3, 4]),
        "end_positions": jnp.asarray([5, 6, 7, 8]),
    }
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    start, end = task.predict_fn(state.params, batch)
    assert start.shape == (4, 32) and end.shape == (4, 32)


def test_lamb_matches_manual_single_param():
    """One LAMB step vs hand-computed NVLAMB update."""
    p = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    g = jnp.asarray([[0.1, 0.2], [0.3, 0.4]])
    lr, b1, b2, eps, wd = 0.1, 0.9, 0.999, 1e-6, 0.01
    tx = lamb(lr, b1, b2, eps, wd, grad_clip_norm=None)
    st = tx.init({"w": p})
    updates, _ = tx.update({"w": g}, st, {"w": p})

    # manual
    m = (1 - b1) * g / (1 - b1)  # bias-corrected first step
    v = (1 - b2) * g**2 / (1 - b2)
    u = m / (np.sqrt(v) + eps) + wd * p
    ratio = np.linalg.norm(p) / np.linalg.norm(u)
    expected = -lr * ratio * u
    np.testing.assert_allclose(np.asarray(updates["w"]), expected, rtol=1e-5)


def test_lamb_grad_clip():
    p = {"w": jnp.ones((4,))}
    g = {"w": jnp.full((4,), 100.0)}
    tx = lamb(0.1, grad_clip_norm=1.0)
    st = tx.init(p)
    updates, _ = tx.update(g, st, p)
    assert np.all(np.isfinite(np.asarray(updates["w"])))


def test_attention_impl_xla_matches_flash():
    """attention_impl="xla" (short-seq ablation path) must produce the same
    forward as the flash kernel — same params, nontrivial padding mask."""
    import dataclasses

    from deeplearningexamples_tpu.models.bert.modeling import BertModel

    cfg_xla = dataclasses.replace(TINY, attention_impl="xla")
    m_flash = BertModel(TINY, dtype=jnp.float32)
    m_xla = BertModel(cfg_xla, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.key(0), (2, 32), 0, 1000)
    mask = jnp.asarray(np.concatenate(
        [np.ones((2, 20), np.int32), np.zeros((2, 12), np.int32)], axis=1))
    variables = m_flash.init(jax.random.key(1), ids, mask)
    seq_flash, pooled_flash = m_flash.apply(variables, ids, mask)
    seq_xla, pooled_xla = m_xla.apply(variables, ids, mask)
    np.testing.assert_allclose(
        np.asarray(seq_flash)[:, :20], np.asarray(seq_xla)[:, :20],
        rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(pooled_flash), np.asarray(pooled_xla),
        rtol=2e-4, atol=2e-4)


def test_remat_same_loss():
    cfg_remat = BertConfig(
        vocab_size=1000, hidden_size=64, num_layers=2, num_heads=2,
        intermediate_size=128, max_position_embeddings=128, remat=True,
    )
    t1 = BertPretrainTask(TINY, dtype=jnp.float32)
    t2 = BertPretrainTask(cfg_remat, dtype=jnp.float32)
    params, _ = t1.init(jax.random.key(0), seq_len=16)
    batch = next(iter(SyntheticBertLoader(2, seq_len=16, vocab_size=1000, steps=1)))
    batch = jax.tree.map(jnp.asarray, batch)
    l1, _ = t1.loss_fn(params, {}, batch, jax.random.key(2))
    l2, _ = t2.loss_fn(params, {}, batch, jax.random.key(2))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
