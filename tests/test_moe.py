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
