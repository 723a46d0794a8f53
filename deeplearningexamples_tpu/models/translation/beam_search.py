"""Beam search decoding (jit-compatible, static shapes).

The role of fairseq's ``SequenceGenerator`` in the reference Transformer and
GNMT recipes: length-normalized beam search with EOS handling. Implemented
as a ``lax.fori_loop`` over a static step budget with a (batch, beam) state;
each step re-runs the decoder over the padded prefix (causal mask makes this
correct; a KV-cache variant is the planned serving optimization).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["beam_search"]

NEG = -1e9


def beam_search(
    decode_logits: Callable[[jax.Array], jax.Array],
    batch_size: int,
    beam_size: int = 4,
    max_len: int = 64,
    bos_id: int = 0,
    eos_id: int = 2,
    pad_id: int = 1,
    length_penalty: float = 0.6,
    vocab_size: int | None = None,
):
    """``decode_logits(tgt_ids (B*beam, L)) -> (B*beam, L, V)``: full-prefix
    causal decoder (the encoder memory is closed over, pre-tiled to B*beam).
    Returns (sequences (B, beam, L), scores (B, beam)) sorted best-first.

    ``vocab_size``: logit columns at or past it are lane-padding (models
    emit ``cfg.padded_vocab``-wide logits for the MXU) — mask them so a
    padded id can never be emitted."""
    bb = batch_size * beam_size

    seqs = jnp.full((bb, max_len), pad_id, jnp.int32).at[:, 0].set(bos_id)
    # only beam 0 live initially (identical prefixes must not be double-counted)
    scores = jnp.tile(
        jnp.asarray([0.0] + [NEG] * (beam_size - 1)), (batch_size,)
    )
    finished = jnp.zeros((bb,), bool)

    def step(t, carry):
        seqs, scores, finished = carry
        logits = decode_logits(seqs)  # (bb, L, V)
        logp = jax.nn.log_softmax(logits[:, t - 1].astype(jnp.float32), axis=-1)
        v = logp.shape[-1]
        if vocab_size is not None and vocab_size < v:
            logp = jnp.where(jnp.arange(v)[None, :] < vocab_size, logp, NEG)
        # finished beams: only "pad" continuation at no cost
        cont = jnp.where(finished[:, None], NEG, logp)
        cont = jnp.where(
            finished[:, None] & (jnp.arange(v)[None, :] == pad_id), 0.0, cont
        )
        cand = scores[:, None] + cont  # (bb, V)
        cand = cand.reshape(batch_size, beam_size * v)
        top_scores, top_idx = jax.lax.top_k(cand, beam_size)  # (B, beam)
        beam_src = top_idx // v  # which beam it came from
        token = top_idx % v

        flat_src = (
            beam_src + jnp.arange(batch_size)[:, None] * beam_size
        ).reshape(-1)
        new_seqs = seqs[flat_src].at[:, t].set(token.reshape(-1))
        new_finished = finished[flat_src] | (token.reshape(-1) == eos_id)
        return new_seqs, top_scores.reshape(-1), new_finished

    seqs, scores, finished = jax.lax.fori_loop(
        1, max_len, step, (seqs, scores, finished)
    )

    # length-normalized final scores ((5+len)/6)^alpha, GNMT-style
    lengths = jnp.sum((seqs != pad_id), axis=1).astype(jnp.float32)
    norm = ((5.0 + lengths) / 6.0) ** length_penalty
    final = (scores / norm).reshape(batch_size, beam_size)
    order = jnp.argsort(-final, axis=1)
    seqs = seqs.reshape(batch_size, beam_size, max_len)
    seqs = jnp.take_along_axis(seqs, order[:, :, None], axis=1)
    final = jnp.take_along_axis(final, order, axis=1)
    return seqs, final


def beam_search_cached(
    model,
    params,
    memory: jax.Array,  # (B*beam, S, D) — pre-tiled encoder output
    memory_mask: jax.Array,
    batch_size: int,
    beam_size: int = 4,
    max_len: int = 64,
    bos_id: int = 0,
    eos_id: int = 2,
    pad_id: int = 1,
    length_penalty: float = 0.6,
    vocab_size: int | None = None,
):
    """KV-cached beam search over ``Transformer.decode_step``: O(L) decoder
    work per step instead of the full-prefix O(L^2) of ``beam_search``.
    The flax "cache" collection rides in the loop carry and is gathered
    along the batch axis when beams reorder. ``vocab_size`` masks
    lane-padded logit columns (see ``beam_search``)."""
    if max_len > model.cfg.max_len:
        raise ValueError(
            f"max_len={max_len} exceeds the model's KV-cache capacity "
            f"(cfg.max_len={model.cfg.max_len}); dynamic_update_slice would "
            "silently clamp at the last slot"
        )
    bb = batch_size * beam_size

    # initialize cache by tracing one step shape
    _, cache = model.apply(
        {"params": params}, jnp.full((bb,), bos_id, jnp.int32), 0,
        memory, memory_mask, method=model.decode_step, mutable=["cache"],
    )
    cache = jax.tree_util.tree_map(jnp.zeros_like, cache)

    seqs = jnp.full((bb, max_len), pad_id, jnp.int32).at[:, 0].set(bos_id)
    scores = jnp.tile(jnp.asarray([0.0] + [NEG] * (beam_size - 1)), (batch_size,))
    finished = jnp.zeros((bb,), bool)

    def step(t, carry):
        seqs, scores, finished, cache = carry
        logits, new_cache = model.apply(
            {"params": params, **cache}, seqs[:, t - 1], t - 1,
            memory, memory_mask, method=model.decode_step, mutable=["cache"],
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        v = logp.shape[-1]
        if vocab_size is not None and vocab_size < v:
            logp = jnp.where(jnp.arange(v)[None, :] < vocab_size, logp, NEG)
        cont = jnp.where(finished[:, None], NEG, logp)
        cont = jnp.where(
            finished[:, None] & (jnp.arange(v)[None, :] == pad_id), 0.0, cont
        )
        cand = (scores[:, None] + cont).reshape(batch_size, beam_size * v)
        top_scores, top_idx = jax.lax.top_k(cand, beam_size)
        beam_src = top_idx // v
        token = top_idx % v
        flat_src = (
            beam_src + jnp.arange(batch_size)[:, None] * beam_size
        ).reshape(-1)
        new_seqs = seqs[flat_src].at[:, t].set(token.reshape(-1))
        new_finished = finished[flat_src] | (token.reshape(-1) == eos_id)
        # reorder the cache to follow surviving beams
        new_cache = jax.tree_util.tree_map(
            lambda x: x[flat_src] if x.ndim > 0 and x.shape[0] == bb else x,
            new_cache,
        )
        return new_seqs, top_scores.reshape(-1), new_finished, new_cache

    seqs, scores, finished, _ = jax.lax.fori_loop(
        1, max_len, step, (seqs, scores, finished, cache)
    )
    lengths = jnp.sum((seqs != pad_id), axis=1).astype(jnp.float32)
    norm = ((5.0 + lengths) / 6.0) ** length_penalty
    final = (scores / norm).reshape(batch_size, beam_size)
    order = jnp.argsort(-final, axis=1)
    seqs = seqs.reshape(batch_size, beam_size, max_len)
    seqs = jnp.take_along_axis(seqs, order[:, :, None], axis=1)
    final = jnp.take_along_axis(final, order, axis=1)
    return seqs, final
