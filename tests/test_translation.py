"""Transformer NMT + beam search tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deeplearningexamples_tpu.models.translation import (
    Transformer,
    TransformerConfig,
    TransformerTask,
    beam_search,
)

TINY = TransformerConfig(
    vocab_size=50, d_model=32, d_ff=64, num_heads=2,
    encoder_layers=2, decoder_layers=2, max_len=24,
)


def test_transformer_trains_copy_task():
    """Overfit copying a fixed 'sentence' — loss must collapse."""
    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step

    task = TransformerTask(TINY, dtype=jnp.float32)
    params, _ = task.init(jax.random.key(0))
    tx = optax.adam(3e-3)
    state = create_train_state(params, tx, jax.random.key(1))
    step = make_train_step(task.loss_fn, tx, donate=False)
    rng = np.random.default_rng(0)
    src = rng.integers(3, 50, (8, 10)).astype(np.int32)
    tgt = np.concatenate(
        [np.full((8, 1), TINY.bos_id), src,
         np.full((8, 1), TINY.eos_id)], axis=1
    ).astype(np.int32)
    batch = {"src": jnp.asarray(src), "tgt": jnp.asarray(tgt)}
    losses = []
    for _ in range(60):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.5

    # greedy-ish beam search reproduces the memorized targets
    model = task.model
    memory, memory_mask = model.apply(
        {"params": state.params}, jnp.asarray(src), method=model.encode
    )
    beam = 2
    mem_t = jnp.repeat(memory, beam, axis=0)
    mask_t = jnp.repeat(memory_mask, beam, axis=0)

    def decode_logits(tgt_ids):
        return model.apply(
            {"params": state.params}, tgt_ids, mem_t, mask_t,
            method=model.decode,
        )

    seqs, scores = beam_search(
        decode_logits, batch_size=8, beam_size=beam, max_len=14,
        bos_id=TINY.bos_id, eos_id=TINY.eos_id, pad_id=TINY.pad_id,
    )
    assert seqs.shape == (8, beam, 14)
    # best beam should start by copying the first source tokens
    match = np.mean(np.asarray(seqs[:, 0, 1:4]) == src[:, :3])
    assert match > 0.5
    # scores sorted best-first
    assert np.all(np.asarray(scores[:, 0]) >= np.asarray(scores[:, 1]) - 1e-5)


def test_beam_search_eos_and_shapes():
    """A decoder that always emits EOS: all beams finish at t=1 and pad after."""
    v = 8

    def decode_logits(tgt_ids):
        logits = jnp.zeros((tgt_ids.shape[0], tgt_ids.shape[1], v))
        return logits.at[:, :, 2].set(5.0)  # eos_id=2

    seqs, scores = beam_search(decode_logits, batch_size=2, beam_size=3,
                               max_len=6)
    s = np.asarray(seqs)
    # best beam: EOS right after BOS, padding after finish
    assert (s[:, 0, 1] == 2).all()
    assert (s[:, 0, 2:] == 1).all()
    # every beam pads after its EOS
    for b in range(2):
        for k in range(3):
            row = s[b, k]
            eos_pos = np.where(row == 2)[0]
            if len(eos_pos):
                assert (row[eos_pos[0] + 1 :] == 1).all()
    assert np.isfinite(np.asarray(scores[:, 0])).all()


def test_gnmt_trains_copy_task():
    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step
    from deeplearningexamples_tpu.models.translation import GnmtConfig, GnmtTask

    cfg = GnmtConfig(vocab_size=40, hidden_size=32, num_layers=4)
    task = GnmtTask(cfg, dtype=jnp.float32)
    params, _ = task.init(jax.random.key(0))
    # the reference's uniform(-0.1, 0.1) LSTM init (now matched exactly —
    # parity-tested) converges slower on toy tasks than flax defaults did
    tx = optax.adam(5e-3)
    state = create_train_state(params, tx, jax.random.key(1))
    step = make_train_step(task.loss_fn, tx, donate=False)
    rng = np.random.default_rng(0)
    src = rng.integers(4, 40, (4, 6)).astype(np.int32)
    tgt = np.concatenate(
        [np.full((4, 1), cfg.bos_id), src, np.full((4, 1), cfg.eos_id)], axis=1
    ).astype(np.int32)
    batch = {"src": jnp.asarray(src), "tgt": jnp.asarray(tgt)}
    losses = []
    for _ in range(60):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.6


def test_cached_beam_search_matches_uncached():
    """KV-cached decode must produce the same best sequences as full-prefix."""
    from deeplearningexamples_tpu.models.translation import beam_search_cached

    task = TransformerTask(TINY, dtype=jnp.float32)
    params, _ = task.init(jax.random.key(3))
    rng = np.random.default_rng(1)
    src = rng.integers(3, 50, (3, 8)).astype(np.int32)
    model = task.model
    memory, memory_mask = model.apply({"params": params}, jnp.asarray(src),
                                      method=model.encode)
    beam = 3
    mem_t = jnp.repeat(memory, beam, axis=0)
    mask_t = jnp.repeat(memory_mask, beam, axis=0)

    def decode_logits(tgt_ids):
        return model.apply({"params": params}, tgt_ids, mem_t, mask_t,
                           method=model.decode)

    s1, f1 = beam_search(decode_logits, 3, beam, max_len=10,
                         bos_id=TINY.bos_id, eos_id=TINY.eos_id,
                         pad_id=TINY.pad_id)
    s2, f2 = beam_search_cached(model, params, mem_t, mask_t, 3, beam,
                                max_len=10, bos_id=TINY.bos_id,
                                eos_id=TINY.eos_id, pad_id=TINY.pad_id)
    np.testing.assert_array_equal(np.asarray(s1[:, 0]), np.asarray(s2[:, 0]))
    np.testing.assert_allclose(np.asarray(f1[:, 0]), np.asarray(f2[:, 0]),
                               rtol=1e-4)
