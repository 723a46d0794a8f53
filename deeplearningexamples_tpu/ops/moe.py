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

Router semantics (Switch Transformer top-1, GShard-style top-2):
- router logits in fp32; softmax over experts
- ``router_top_k=1`` (default): each token goes to its argmax expert with
  gate = its softmax prob (Switch behavior, unchanged)
- ``router_top_k=2``: each token also goes to its second-choice expert;
  the two gates are renormalized over the chosen pair (g_j / (g1+g2),
  GShard/ST-MoE convention). Capacity is assigned pass-by-pass: every
  first choice takes its buffer slot before any second choice does, so a
  hot expert drops second-choice traffic first
- static per-expert capacity ``C = ceil(T/E * capacity_factor * k)``;
  overflow tokens are DROPPED per-assignment (the kept assignment — if any
  — and the residual stream still carry the token, standard behavior)
- position within the expert's buffer is assigned first-come-first-served
  via a cumulative sum over the token axis (deterministic)
- auxiliary load-balance loss = E * sum_e fraction_tokens(e) * mean_prob(e)
  over FIRST choices (Switch eq. 4; GShard computes the same on top-1)
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
    router_top_k: int = 1  # 1 = Switch, 2 = GShard-style top-2


def _route_topk(logits: jax.Array, capacity: int, k: int):
    """logits (T, E) fp32 -> dispatch (T, E, C) one-hot, combine (T, E, C)
    gate-weighted, aux scalar. Pure function of logits so tests can oracle
    it directly. ``k=1`` reproduces Switch top-1 exactly (gate = softmax
    prob, no renormalization); ``k>=2`` renormalizes the chosen gates."""
    t, e = logits.shape
    probs = jax.nn.softmax(logits, axis=-1)
    masked = probs
    onehots, raw_gates = [], []
    for _ in range(k):
        expert = jnp.argmax(masked, axis=-1)  # (T,)
        oh = jax.nn.one_hot(expert, e, dtype=jnp.float32)  # (T, E)
        onehots.append(oh)
        raw_gates.append(jnp.sum(probs * oh, axis=-1))  # (T,)
        masked = masked * (1.0 - oh)
    if k == 1:
        gates = raw_gates
    else:
        denom = sum(raw_gates)
        gates = [g / jnp.maximum(denom, 1e-9) for g in raw_gates]

    dispatch = jnp.zeros((t, e, capacity), jnp.float32)
    combine = jnp.zeros((t, e, capacity), jnp.float32)
    # pass-by-pass slot assignment: all j-th choices are placed before any
    # (j+1)-th choice. Offsetting by the TOTAL prior-pass count (kept AND
    # dropped) is correct: a dropped assignment means that expert's buffer
    # is already full, so later positions are >= capacity either way.
    prior = jnp.zeros((e,), jnp.float32)
    for oh, gate in zip(onehots, gates):
        # position of each token inside its expert's buffer (exclusive
        # cumsum over the token axis, offset by earlier passes)
        pos = jnp.cumsum(oh, axis=0) - oh + prior[None, :]  # (T, E)
        pos_in_expert = jnp.sum(pos * oh, axis=-1)  # (T,)
        keep = pos_in_expert < capacity
        kept = oh * keep[:, None].astype(oh.dtype)
        slot = jax.nn.one_hot(
            pos_in_expert.astype(jnp.int32), capacity, dtype=jnp.float32
        )
        d = kept[:, :, None] * slot[:, None, :]  # (T, E, C)
        dispatch = dispatch + d
        combine = combine + d * gate[:, None, None]
        prior = prior + jnp.sum(oh, axis=0)
    # Switch load-balance loss on FIRST choices: differentiable through
    # mean probs only
    frac = jnp.mean(onehots[0], axis=0)
    mean_prob = jnp.mean(probs, axis=0)
    aux = e * jnp.sum(frac * mean_prob)
    return dispatch, combine, aux


def _route_top1(logits: jax.Array, capacity: int):
    """Back-compat alias: Switch top-1 routing (see ``_route_topk``)."""
    return _route_topk(logits, capacity, 1)


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
        k = cfg.router_top_k
        capacity = int(-(-t // cfg.num_experts) * cfg.capacity_factor * k)
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
            dispatch, combine, aux = _route_topk(logits, capacity, k)
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
    """Oracle: route each token with the same top-k/capacity rule, then run
    its experts' FFNs directly (no dispatch einsums). Matches
    ``MoEFeedForward`` exactly — used by tests."""
    wi, wo = params["wi"], params["wo"]
    wg = params["router"]["kernel"]
    lead = x.shape[:-2]
    t, d = x.shape[-2], x.shape[-1]
    k = cfg.router_top_k
    capacity = max(
        int(-(-t // cfg.num_experts) * cfg.capacity_factor * k), 1
    )
    out = []
    for xb in x.reshape((-1, t, d)):
        logits = xb.astype(jnp.float32) @ wg
        probs = jax.nn.softmax(logits, axis=-1)
        # per-token expert choices, pass by pass
        masked = probs
        choices, raw_gates = [], []
        for _ in range(k):
            e_i = jnp.argmax(masked, axis=-1)
            choices.append([int(v) for v in e_i])
            raw_gates.append([float(probs[i, int(e_i[i])]) for i in range(t)])
            masked = masked * (1.0 - jax.nn.one_hot(e_i, cfg.num_experts))
        if k == 1:
            gates = raw_gates
        else:
            gates = []
            for j in range(k):
                gates.append([
                    raw_gates[j][i]
                    / max(sum(raw_gates[jj][i] for jj in range(k)), 1e-9)
                    for i in range(t)
                ])
        rows = [jnp.zeros((d,), jnp.float32) for _ in range(t)]
        counts = {}
        for j in range(k):  # all first choices take slots before any second
            for i in range(t):
                e = choices[j][i]
                pos = counts.get(e, 0)
                counts[e] = pos + 1
                if pos >= capacity:
                    continue
                h = jax.nn.gelu(xb[i].astype(jnp.float32) @ wi[e])
                rows[i] = rows[i] + (h @ wo[e]) * gates[j][i]
        out.append(jnp.stack(rows))
    return jnp.stack(out).reshape(lead + (t, d)).astype(x.dtype)
