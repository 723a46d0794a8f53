"""Pipeline parallelism (GPipe over a mesh axis) vs the sequential oracle.

The reference has no pipeline parallelism (SURVEY.md §2.D "PP — No"), so
the bar is exactness against running the same stages sequentially on one
device: forward AND gradients, including under a DP×PP mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplearningexamples_tpu.parallel import MeshSpec, build_mesh
from deeplearningexamples_tpu.parallel.pipeline import (
    pipeline_apply, stack_stage_params,
)

DIM = 16


def stage_fn(p, x):
    """One homogeneous trunk stage: Dense + gelu residual."""
    h = jnp.einsum("...d,de->...e", x, p["w"],
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return x + jax.nn.gelu(h + p["b"])


def make_stage_params(key):
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.normal(kw, (DIM, DIM), jnp.float32) * 0.2,
        "b": jax.random.normal(kb, (DIM,), jnp.float32) * 0.1,
    }


def sequential_oracle(stacked, x):
    def body(h, p):
        return stage_fn(p, h), None
    out, _ = jax.lax.scan(body, x, stacked)
    return out


@pytest.fixture(scope="module")
def stacked_params():
    keys = jax.random.split(jax.random.key(0), 8)
    return stack_stage_params([make_stage_params(k) for k in keys])


def _microbatches(m, mb, seed=1):
    return jax.random.normal(jax.random.key(seed), (m, mb, DIM), jnp.float32)


@pytest.mark.parametrize("n_micro", [1, 4, 8, 13])
def test_forward_matches_sequential(stacked_params, n_micro):
    mesh = build_mesh(MeshSpec(data=1, model=8))
    x = _microbatches(n_micro, 4)
    got = jax.jit(
        lambda p, x: pipeline_apply(stage_fn, p, x, mesh=mesh)
    )(stacked_params, x)
    want = jax.vmap(lambda xe: sequential_oracle(stacked_params, xe))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_gradients_match_sequential(stacked_params):
    mesh = build_mesh(MeshSpec(data=1, model=8))
    x = _microbatches(4, 4, seed=2)
    tgt = jax.random.normal(jax.random.key(3), x.shape)

    def pipe_loss(p, x):
        y = pipeline_apply(stage_fn, p, x, mesh=mesh)
        return jnp.mean((y - tgt) ** 2)

    def seq_loss(p, x):
        y = jax.vmap(lambda xe: sequential_oracle(p, xe))(x)
        return jnp.mean((y - tgt) ** 2)

    gp = jax.jit(jax.grad(pipe_loss))(stacked_params, x)
    gs = jax.grad(seq_loss)(stacked_params, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5),
        gp, gs,
    )


def test_dp_x_pp_composition(stacked_params):
    """2-way DP x 4-stage PP on the same 8 devices: each microbatch's batch
    dim is sharded over `data` while stages ride `model` — must still match
    sequential."""
    mesh = build_mesh(MeshSpec(data=2, model=4))
    stacked4 = jax.tree_util.tree_map(lambda p: p[:4], stacked_params)
    x = _microbatches(4, 8, seed=4)

    got = jax.jit(
        lambda p, x: pipeline_apply(stage_fn, p, x, mesh=mesh,
                                    batch_axis="data")
    )(stacked4, x)
    want = jax.vmap(lambda xe: sequential_oracle(stacked4, xe))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_remat_gradients_match_sequential(stacked_params):
    """remat=True (the 1F1B-equivalent memory mode: recompute stage forward
    in backward, store one activation per tick) must leave gradients
    bit-compatible with the non-remat pipeline and the sequential oracle."""
    mesh = build_mesh(MeshSpec(data=1, model=8))
    x = _microbatches(6, 4, seed=5)
    tgt = jax.random.normal(jax.random.key(6), x.shape)

    def pipe_loss(p, x):
        y = pipeline_apply(stage_fn, p, x, mesh=mesh, remat=True)
        return jnp.mean((y - tgt) ** 2)

    def seq_loss(p, x):
        y = jax.vmap(lambda xe: sequential_oracle(p, xe))(x)
        return jnp.mean((y - tgt) ** 2)

    gp = jax.jit(jax.grad(pipe_loss))(stacked_params, x)
    gs = jax.grad(seq_loss)(stacked_params, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5),
        gp, gs,
    )


def test_stage_count_mismatch_raises(stacked_params):
    mesh = build_mesh(MeshSpec(data=1, model=8))
    bad = jax.tree_util.tree_map(lambda p: p[:4], stacked_params)
    with pytest.raises(ValueError, match="stage axis"):
        pipeline_apply(stage_fn, bad, _microbatches(2, 2), mesh=mesh)
