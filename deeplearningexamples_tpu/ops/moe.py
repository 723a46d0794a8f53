"""Mixture-of-Experts FFN with expert parallelism over the mesh ``model``
axis.

The reference has no MoE / expert parallelism anywhere (SURVEY.md §2.D
"EP — No"), so this is a beyond-parity capability, built the GSPMD way:
dispatch and combine are dense einsums over a static-capacity one-hot
routing tensor (the Mesh-TensorFlow / Switch-Transformer formulation), so
the whole layer is differentiable, static-shaped, and MXU-friendly; when
the expert axis of the parameters is sharded over ``model``, XLA lowers the
dispatch/combine einsums to the all_to_all exchanges the reference would
have had to hand-write — no manual collectives in the layer itself
(``tests/test_moe.py`` asserts sharded == replicated numerics).

Router semantics (Switch Transformer, top-1):
- router logits in fp32; softmax over experts
- each token goes to its argmax expert, subject to a static per-expert
  capacity ``C = ceil(T/E * capacity_factor)``; overflow tokens are DROPPED
  (contribute zero — the residual stream carries them, standard Switch
  behavior)
- position within the expert's buffer is assigned first-come-first-served
  via a cumulative sum over the token axis (deterministic)
- auxiliary load-balance loss = E * sum_e fraction_tokens(e) * mean_prob(e)
  (Switch eq. 4) returned alongside the output
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["MoEConfig", "MoEFeedForward", "moe_reference"]


@dataclass(frozen=True)
class MoEConfig:
    d_model: int = 64
    d_ff: int = 256
    num_experts: int = 8
    capacity_factor: float = 1.25


def _route_top1(logits: jax.Array, capacity: int):
    """logits (T, E) fp32 -> dispatch (T, E, C) one-hot, combine (T, E, C)
    prob-weighted, aux scalar. Pure function of logits so tests can oracle
    it directly."""
    t, e = logits.shape
    probs = jax.nn.softmax(logits, axis=-1)
    expert = jnp.argmax(probs, axis=-1)  # (T,)
    onehot = jax.nn.one_hot(expert, e, dtype=jnp.float32)  # (T, E)
    # position of each token inside its expert's buffer (exclusive cumsum)
    pos = jnp.cumsum(onehot, axis=0) - onehot  # (T, E)
    pos_in_expert = jnp.sum(pos * onehot, axis=-1)  # (T,)
    keep = pos_in_expert < capacity
    onehot = onehot * keep[:, None].astype(onehot.dtype)
    slot = jax.nn.one_hot(
        pos_in_expert.astype(jnp.int32), capacity, dtype=jnp.float32
    )
    dispatch = onehot[:, :, None] * slot[:, None, :]  # (T, E, C)
    gate = jnp.sum(probs * onehot, axis=-1)  # (T,) 0 for dropped
    combine = dispatch * gate[:, None, None]
    # Switch load-balance loss: differentiable through mean probs only
    frac = jnp.mean(onehot, axis=0)
    mean_prob = jnp.mean(probs, axis=0)
    aux = e * jnp.sum(frac * mean_prob)
    return dispatch, combine, aux


class MoEFeedForward(nn.Module):
    """Drop-in FFN block replacement: (…, T, d_model) -> (…, T, d_model),
    plus the Switch aux loss. Shard ``wi``/``wo``'s leading expert axis over
    the ``model`` mesh axis for expert parallelism (param tree:
    ``router/kernel``, ``wi``, ``wo``)."""

    cfg: MoEConfig

    @nn.compact
    def __call__(self, x: jax.Array):
        cfg = self.cfg
        lead = x.shape[:-2]
        t, d = x.shape[-2], x.shape[-1]
        tokens = x.reshape((-1, t, d))
        capacity = int(-(-t // cfg.num_experts) * cfg.capacity_factor)
        capacity = max(capacity, 1)

        router = nn.Dense(
            cfg.num_experts, use_bias=False, dtype=jnp.float32,
            name="router",
        )
        wi = self.param(
            "wi", nn.initializers.lecun_normal(),
            (cfg.num_experts, d, cfg.d_ff), jnp.float32,
        )
        wo = self.param(
            "wo", nn.initializers.lecun_normal(),
            (cfg.num_experts, cfg.d_ff, d), jnp.float32,
        )

        def per_batch(xb):
            logits = router(xb.astype(jnp.float32))
            dispatch, combine, aux = _route_top1(logits, capacity)
            # dispatch: (T,E,C) x (T,D) -> expert inputs (E,C,D); with wi/wo
            # expert-sharded, GSPMD lowers this pair to the all_to_all
            # token exchange of hand-written EP
            xe = jnp.einsum("tec,td->ecd", dispatch, xb.astype(jnp.float32))
            h = jax.nn.gelu(jnp.einsum("ecd,edf->ecf", xe, wi))
            ye = jnp.einsum("ecf,efd->ecd", h, wo)
            yb = jnp.einsum("tec,ecd->td", combine, ye)
            return yb.astype(x.dtype), aux

        y, aux = jax.vmap(per_batch)(tokens)
        return y.reshape(lead + (t, d)), jnp.mean(aux)


def moe_reference(params, x, cfg: MoEConfig):
    """Oracle: route each token with the same top-1/capacity rule, then run
    its expert's FFN directly (no dispatch einsums). Matches
    ``MoEFeedForward`` exactly — used by tests."""
    wi, wo = params["wi"], params["wo"]
    wg = params["router"]["kernel"]
    lead = x.shape[:-2]
    t, d = x.shape[-2], x.shape[-1]
    capacity = max(int(-(-t // cfg.num_experts) * cfg.capacity_factor), 1)
    out = []
    for xb in x.reshape((-1, t, d)):
        logits = xb.astype(jnp.float32) @ wg
        probs = jax.nn.softmax(logits, axis=-1)
        expert = jnp.argmax(probs, axis=-1)
        counts = {}
        rows = []
        for i in range(t):
            e = int(expert[i])
            pos = counts.get(e, 0)
            counts[e] = pos + 1
            if pos >= capacity:
                rows.append(jnp.zeros((d,), jnp.float32))
                continue
            h = jax.nn.gelu(xb[i].astype(jnp.float32) @ wi[e])
            rows.append((h @ wo[e]) * probs[i, e])
        out.append(jnp.stack(rows))
    return jnp.stack(out).reshape(lead + (t, d)).astype(x.dtype)
