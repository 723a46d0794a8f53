"""MoFlow: exact invertibility, NLL training, generation shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deeplearningexamples_tpu.models.moflow import (
    MoFlow,
    MoFlowConfig,
    MoFlowTask,
)

CFG = MoFlowConfig(
    n_node=6, n_atom_types=5, n_bond_types=4,
    bond_n_flow=4, bond_squeeze=3, bond_hidden=(32,),
    atom_n_flow=6, atom_hidden_gnn=(16,), atom_hidden_lin=(32,),
)


def _one_hot_graph(rng, bs):
    n, t, e = CFG.n_node, CFG.n_atom_types, CFG.n_bond_types
    atoms = jax.nn.one_hot(rng.integers(0, t, (bs, n)), t)
    bonds = rng.integers(0, e, (bs, n, n))
    bonds = np.triu(bonds, 1)
    bonds = bonds + bonds.transpose(0, 2, 1)
    adj = jax.nn.one_hot(bonds, e).transpose(0, 3, 1, 2)  # (B, E, N, N)
    return jnp.asarray(atoms), jnp.asarray(adj, jnp.float32)


def test_bond_glow_invertible():
    model = MoFlow(CFG)
    rng = np.random.default_rng(0)
    atoms, adj = _one_hot_graph(rng, 2)
    variables = model.init(jax.random.key(0), adj, atoms, train=False)
    nhwc = adj.transpose(0, 2, 3, 1) + 0.1
    z, logdet = model.apply(
        variables, nhwc, train=False,
        method=lambda m, a, train: m.bond_glow(a, train=train),
    )
    back = model.apply(
        variables, z, method=lambda m, a: m.bond_glow(a, reverse=True),
    )
    np.testing.assert_allclose(np.asarray(back), np.asarray(nhwc), atol=1e-4)
    assert logdet.shape == (2,) and np.isfinite(np.asarray(logdet)).all()


def test_atom_flow_invertible():
    model = MoFlow(CFG)
    rng = np.random.default_rng(1)
    atoms, adj = _one_hot_graph(rng, 2)
    variables = model.init(jax.random.key(0), adj, atoms, train=False)
    x = atoms + 0.05
    z, logdet = model.apply(
        variables, adj, x, train=False,
        method=lambda m, a, xx, train: m.atom_flow(a, xx, train=train),
    )
    back = model.apply(
        variables, adj, z,
        method=lambda m, a, xx: m.atom_flow(a, xx, reverse=True),
    )
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)
    assert np.isfinite(np.asarray(logdet)).all()


def test_moflow_trains_nll_decreases():
    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step

    task = MoFlowTask(CFG)
    params, mstate = task.init(jax.random.key(0))
    assert "ln_var" in params
    tx = optax.adam(1e-3)
    state = create_train_state(params, tx, jax.random.key(1), mstate)
    step = make_train_step(task.loss_fn, tx, donate=False)
    rng = np.random.default_rng(0)
    atoms, adj = _one_hot_graph(rng, 8)
    batch = {"atoms": atoms, "adj": adj}
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses


def test_moflow_generate_shapes():
    task = MoFlowTask(CFG)
    params, mstate = task.init(jax.random.key(0))
    adj, x = jax.jit(
        lambda p, m, r: task.generate(p, m, r, n=3)
    )(params, mstate, jax.random.key(2))
    assert adj.shape == (3, CFG.n_bond_types, CFG.n_node, CFG.n_node)
    assert x.shape == (3, CFG.n_node, CFG.n_atom_types)
    # discretized bonds: exactly one type active per pair
    np.testing.assert_allclose(np.asarray(adj).sum(axis=1), 1.0, atol=1e-5)
