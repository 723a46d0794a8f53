"""MoE / expert parallelism vs a per-token oracle and vs replicated.

The reference has no MoE (SURVEY.md §2.D "EP — No"); the bar is (a) the
dispatch-einsum layer matches a direct per-token routing oracle, (b) the
expert-sharded layer matches the replicated layer bit-for-bit on the
8-device mesh, (c) gradients flow (router included via the gate weight).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplearningexamples_tpu.ops.moe import (
    MoEConfig, MoEFeedForward, moe_reference,
)
from deeplearningexamples_tpu.parallel import MeshSpec, build_mesh

CFG = MoEConfig(d_model=16, d_ff=32, num_experts=8, capacity_factor=2.0)


@pytest.fixture(scope="module")
def layer_and_params():
    layer = MoEFeedForward(CFG)
    x = jax.random.normal(jax.random.key(0), (2, 24, CFG.d_model))
    params = layer.init(jax.random.key(1), x)["params"]
    return layer, params, x


def test_matches_per_token_oracle(layer_and_params):
    layer, params, x = layer_and_params
    y, aux = layer.apply({"params": params}, x)
    ref = moe_reference(params, x, CFG)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    assert np.isfinite(float(aux)) and float(aux) > 0


def test_capacity_drops_overflow():
    cfg = MoEConfig(d_model=8, d_ff=16, num_experts=4, capacity_factor=0.5)
    layer = MoEFeedForward(cfg)
    # steer every token to one expert: feed identical tokens
    x = jnp.tile(jax.random.normal(jax.random.key(2), (1, 1, 8)), (1, 16, 1))
    params = layer.init(jax.random.key(3), x)["params"]
    y, _ = layer.apply({"params": params}, x)
    ref = moe_reference(params, x, cfg)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    # capacity = ceil(16/4 * 0.5) = 2 -> 14 of 16 identical tokens dropped
    assert np.count_nonzero(np.abs(np.asarray(y[0])).sum(-1) > 1e-6) == 2


def test_expert_sharded_matches_replicated(layer_and_params):
    layer, params, x = layer_and_params
    mesh = build_mesh(MeshSpec(data=1, model=8))
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharded = dict(params)
    sharded["wi"] = jax.device_put(
        params["wi"], NamedSharding(mesh, P("model", None, None)))
    sharded["wo"] = jax.device_put(
        params["wo"], NamedSharding(mesh, P("model", None, None)))

    @jax.jit
    def fwd(p, x):
        return layer.apply({"params": p}, x)[0]

    y_rep = fwd(params, x)
    y_shard = fwd(sharded, x)
    np.testing.assert_allclose(np.asarray(y_shard), np.asarray(y_rep),
                               atol=1e-6, rtol=1e-6)


CFG2 = MoEConfig(d_model=16, d_ff=32, num_experts=8, capacity_factor=2.0,
                 router_top_k=2)


def test_top2_matches_per_token_oracle():
    layer = MoEFeedForward(CFG2)
    x = jax.random.normal(jax.random.key(4), (2, 24, CFG2.d_model))
    params = layer.init(jax.random.key(5), x)["params"]
    y, aux = layer.apply({"params": params}, x)
    ref = moe_reference(params, x, CFG2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    assert np.isfinite(float(aux)) and float(aux) > 0


def test_top2_uses_two_experts_with_renormalized_gates():
    """At ample capacity, every token's output must be the gate-weighted sum
    of BOTH chosen experts' FFNs with gates summing to 1 over the pair."""
    cfg = MoEConfig(d_model=8, d_ff=16, num_experts=4, capacity_factor=4.0,
                    router_top_k=2)
    layer = MoEFeedForward(cfg)
    x = jax.random.normal(jax.random.key(6), (1, 12, cfg.d_model))
    params = layer.init(jax.random.key(7), x)["params"]
    y, _ = layer.apply({"params": params}, x)

    wg = params["router"]["kernel"]
    wi, wo = params["wi"], params["wo"]
    xb = x[0].astype(jnp.float32)
    probs = jax.nn.softmax(xb @ wg, axis=-1)
    top2 = np.argsort(-np.asarray(probs), axis=-1)[:, :2]
    want = []
    for i in range(12):
        e1, e2 = int(top2[i, 0]), int(top2[i, 1])
        g1, g2 = float(probs[i, e1]), float(probs[i, e2])
        s = g1 + g2
        f1 = (jax.nn.gelu(xb[i] @ wi[e1]) @ wo[e1]) * (g1 / s)
        f2 = (jax.nn.gelu(xb[i] @ wi[e2]) @ wo[e2]) * (g2 / s)
        want.append(f1 + f2)
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(jnp.stack(want)),
                               atol=1e-5, rtol=1e-5)


def test_top2_first_choices_take_slots_first():
    """With capacity starved, second-choice traffic must be dropped before
    any first choice is — identical tokens all pick the same (e1, e2)."""
    cfg = MoEConfig(d_model=8, d_ff=16, num_experts=4, capacity_factor=0.25,
                    router_top_k=2)
    # capacity = ceil(16/4 * 0.25 * 2) = 2 slots per expert
    layer = MoEFeedForward(cfg)
    x = jnp.tile(jax.random.normal(jax.random.key(8), (1, 1, 8)), (1, 16, 1))
    params = layer.init(jax.random.key(9), x)["params"]
    y, _ = layer.apply({"params": params}, x)
    ref = moe_reference(params, x, cfg)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    # tokens 0-1: first choice kept (e1 buffer) AND second choice kept
    # (e2 buffer also has 2 slots); tokens 2+: both dropped -> zero rows
    nz = np.abs(np.asarray(y[0])).sum(-1) > 1e-6
    assert nz[:2].all() and not nz[2:].any()


def test_top2_expert_sharded_matches_replicated():
    layer = MoEFeedForward(CFG2)
    x = jax.random.normal(jax.random.key(10), (2, 24, CFG2.d_model))
    params = layer.init(jax.random.key(11), x)["params"]
    mesh = build_mesh(MeshSpec(data=1, model=8))
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharded = dict(params)
    sharded["wi"] = jax.device_put(
        params["wi"], NamedSharding(mesh, P("model", None, None)))
    sharded["wo"] = jax.device_put(
        params["wo"], NamedSharding(mesh, P("model", None, None)))

    @jax.jit
    def fwd(p, x):
        return layer.apply({"params": p}, x)[0]

    np.testing.assert_allclose(
        np.asarray(fwd(sharded, x)), np.asarray(fwd(params, x)),
        atol=1e-6, rtol=1e-6)


def test_gradients_flow(layer_and_params):
    layer, params, x = layer_and_params

    def loss(p):
        y, aux = layer.apply({"params": p}, x)
        return jnp.mean(y ** 2) + 0.01 * aux

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # the router must receive gradient through the gate weight + aux loss
    assert float(jnp.abs(g["router"]["kernel"]).sum()) > 0
    assert float(jnp.abs(g["wi"]).sum()) > 0
