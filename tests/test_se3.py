"""SE(3) ops + transformer: exact equivariance goldens, invariance e2e."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deeplearningexamples_tpu.models.se3_transformer import (
    SE3Config,
    SE3RegressionTask,
)
from deeplearningexamples_tpu.ops.se3 import (
    clebsch_gordan_real,
    real_spherical_harmonics,
    se3_basis,
)

CFG = SE3Config(num_layers=2, num_degrees=3, num_channels=8, num_heads=2,
                node_feature_dim=4)


def _random_rotation(rng):
    a = rng.normal(size=(3, 3))
    q, _ = np.linalg.qr(a)
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return jnp.asarray(q, jnp.float32)


def _wigner_d(rot, l_max, rng):
    """Derive real Wigner-D per degree from the SH themselves."""
    xs = jnp.asarray(rng.normal(size=(max(60, 4 * (l_max + 1) ** 2), 3)),
                     jnp.float32)
    sh = real_spherical_harmonics(xs, l_max)
    sh_r = real_spherical_harmonics(xs @ rot.T, l_max)
    return [jnp.linalg.lstsq(sh[l], sh_r[l])[0].T for l in range(l_max + 1)]


def test_spherical_harmonics_orthonormal_rotation():
    rng = np.random.default_rng(0)
    rot = _random_rotation(rng)
    ds = _wigner_d(rot, 4, rng)
    for l, d in enumerate(ds):
        err = np.abs(np.asarray(d @ d.T) - np.eye(2 * l + 1)).max()
        assert err < 1e-3, (l, err)  # D is orthogonal -> SH rotate linearly


def test_cg_selection_rules():
    q = clebsch_gordan_real(0, 1, 1)  # J=0 coupling 1x1 -> identity-ish
    assert q.shape == (1, 3, 3)
    np.testing.assert_allclose(np.abs(q[0]), np.abs(q[0].T), atol=1e-12)
    # J outside |d_in - d_out|..d_in+d_out is never requested by se3_basis;
    # coupling 2 (x) 1 -> J in {1,2,3}
    for j in (1, 2, 3):
        assert clebsch_gordan_real(j, 2, 1).shape == (2 * j + 1, 5, 3)


def test_basis_rotation_equivariance():
    rng = np.random.default_rng(1)
    rot = _random_rotation(rng)
    ds = _wigner_d(rot, 2, rng)
    x = jnp.asarray(rng.normal(size=(6, 3)), jnp.float32)
    b = se3_basis(x, 2)
    b_r = se3_basis(x @ rot.T, 2)
    for d_in in range(3):
        for d_out in range(3):
            key = f"{d_in},{d_out}"
            pred = jnp.einsum("iI,nIJK,kK->niJk", ds[d_in], b[key], ds[d_out])
            err = float(jnp.abs(pred - b_r[key]).max())
            assert err < 1e-3, (key, err)


def _mol_batch(rng, bs=2, n=6):
    pos = rng.normal(size=(bs, n, 3)).astype(np.float32) * 2
    species = jax.nn.one_hot(rng.integers(0, 4, (bs, n)), 4)
    mask = np.ones((bs, n), np.float32)
    mask[:, -1] = 0.0  # one padded atom
    # invariant target: masked sum of pairwise inverse distances
    d = np.linalg.norm(pos[:, :, None] - pos[:, None, :], axis=-1)
    np.fill_diagonal(d[0], np.inf)
    np.fill_diagonal(d[1], np.inf)
    pair = mask[:, :, None] * mask[:, None, :]
    target = (pair / np.maximum(d, 0.5)).sum(axis=(1, 2)) * 0.1
    return {
        "positions": jnp.asarray(pos), "species": jnp.asarray(species),
        "mask": jnp.asarray(mask), "target": jnp.asarray(target),
    }


def test_model_rotation_invariance():
    """The whole network's scalar output must be invariant under a random
    rigid rotation of the input coordinates — this pins every convention
    in the SH/CG/basis/attention stack at once."""
    task = SE3RegressionTask(CFG)
    params, _ = task.init(jax.random.key(0), n_atoms=6)
    rng = np.random.default_rng(2)
    batch = _mol_batch(rng)
    rot = _random_rotation(rng)
    out = task.model.apply({"params": params}, batch["positions"],
                           batch["species"], batch["mask"])
    out_r = task.model.apply({"params": params}, batch["positions"] @ rot.T,
                             batch["species"], batch["mask"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r),
                               rtol=2e-3, atol=2e-4)


def _trunk_outputs(rot, ds, pooling=None):
    """Port of the reference equivariance-test harness
    (``SE3Transformer/tests/test_equivariance.py:_get_outputs``): run the
    trunk on (coords, {type-0, type-1} features) and on the ROTATED pair
    (coords @ R.T, feats1 transformed by the degree-1 Wigner-D), returning
    both output fiber dicts. The reference cannot be imported here (its
    model math lives in dgl + e3nn, neither installed — see COVERAGE.md),
    so its test *semantics* are asserted on our implementation instead."""
    from deeplearningexamples_tpu.models.se3_transformer import SE3Trunk

    c, n = 8, 10
    trunk = SE3Trunk(fiber_in={0: c, 1: c}, fiber_hidden={0: c, 1: c, 2: c},
                     fiber_out={0: c, 1: c}, num_layers=2, num_heads=2)
    rng = np.random.default_rng(7)
    pos = jnp.asarray(rng.normal(size=(2, n, 3)), jnp.float32)
    feats = {
        "0": jnp.asarray(rng.normal(size=(2, n, c, 1)), jnp.float32),
        "1": jnp.asarray(rng.normal(size=(2, n, c, 3)), jnp.float32),
    }
    mask = jnp.ones((2, n))
    params = trunk.init(jax.random.key(0), pos, feats, mask)["params"]

    out1 = trunk.apply({"params": params}, pos, feats, mask)
    feats_r = {"0": feats["0"], "1": feats["1"] @ ds[1].T}
    out2 = trunk.apply({"params": params}, pos @ rot.T, feats_r, mask)
    if pooling == "avg":
        out1 = {d: jnp.mean(x, axis=1) for d, x in out1.items()}
        out2 = {d: jnp.mean(x, axis=1) for d, x in out2.items()}
    return out1, out2


def test_trunk_equivariance():
    """Reference ``test_equivariance``: per-node type-0 outputs invariant,
    type-1 outputs equivariant under a random rotation of the inputs."""
    rng = np.random.default_rng(11)
    rot = _random_rotation(rng)
    ds = _wigner_d(rot, 1, rng)
    out1, out2 = _trunk_outputs(rot, ds)
    np.testing.assert_allclose(np.asarray(out2["0"]), np.asarray(out1["0"]),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(out2["1"]),
                               np.asarray(out1["1"] @ ds[1].T), atol=2e-3)


def test_trunk_equivariance_pooled():
    """Reference ``test_equivariance_pooled``: avg-pooled type-1 features
    co-rotate."""
    rng = np.random.default_rng(12)
    rot = _random_rotation(rng)
    ds = _wigner_d(rot, 1, rng)
    out1, out2 = _trunk_outputs(rot, ds, pooling="avg")
    np.testing.assert_allclose(np.asarray(out2["1"]),
                               np.asarray(out1["1"] @ ds[1].T), atol=2e-3)


def test_trunk_invariance_pooled():
    """Reference ``test_invariance_pooled``: avg-pooled type-0 features
    invariant."""
    rng = np.random.default_rng(13)
    rot = _random_rotation(rng)
    ds = _wigner_d(rot, 1, rng)
    out1, out2 = _trunk_outputs(rot, ds, pooling="avg")
    np.testing.assert_allclose(np.asarray(out2["0"]), np.asarray(out1["0"]),
                               atol=2e-3)


def test_se3_trains():
    from deeplearningexamples_tpu.core.train import create_train_state, make_train_step

    task = SE3RegressionTask(CFG)
    params, mstate = task.init(jax.random.key(0), n_atoms=6)
    tx = optax.adam(3e-3)
    state = create_train_state(params, tx, jax.random.key(1), mstate)
    step = make_train_step(task.loss_fn, tx, donate=False)
    batch = _mol_batch(np.random.default_rng(3))
    losses = []
    for _ in range(10):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses
