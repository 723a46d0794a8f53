"""Core harness tests: config layering, logging schema, train step, mesh DP."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deeplearningexamples_tpu.core import config as cfgmod
from deeplearningexamples_tpu.core import losses
from deeplearningexamples_tpu.core import optimizers as opt
from deeplearningexamples_tpu.core.logging import (
    JSONStreamBackend,
    Logger,
    QuantileMeter,
    StdOutBackend,
)
from deeplearningexamples_tpu.core.train import create_train_state, make_train_step
from deeplearningexamples_tpu.parallel import MeshSpec, build_mesh, shard_batch


# -- config -----------------------------------------------------------------

from dataclasses import dataclass, field


@dataclass
class Opt:
    lr: float = 0.1
    momentum: float = 0.9


@dataclass
class Cfg:
    epochs: int = 90
    optimizer: Opt = field(default_factory=Opt)


def test_config_merge_and_yaml(tmp_path):
    cfg = Cfg()
    merged = cfgmod.merge(cfg, {"optimizer": {"lr": 2.048}})
    assert merged.optimizer.lr == 2.048 and merged.epochs == 90
    yml = tmp_path / "configs.yml"
    yml.write_text(
        """
precision:
  bf16: {optimizer: {lr: 1.0}}
platform:
  v5e-8: {epochs: 50}
models:
  resnet50:
    v5e-8:
      bf16: {optimizer: {momentum: 0.875}}
mode:
  benchmark_training_short: {epochs: 1}
"""
    )
    out = cfgmod.resolve(
        cfg, yaml_path=str(yml), precision="bf16", platform="v5e-8",
        model="resnet50", mode="benchmark_training_short",
    )
    assert out.optimizer.lr == 1.0
    assert out.optimizer.momentum == 0.875
    assert out.epochs == 1  # mode layer wins last

    with pytest.raises(KeyError):
        cfgmod.merge(cfg, {"bogus": 1})


def test_logger_schema(tmp_path):
    path = str(tmp_path / "raport.json")
    lg = Logger(backends=[JSONStreamBackend(path)])
    lg.register_metric("train.loss", "average", "iteration")
    lg.record("train.loss", 1.0)
    lg.record("train.loss", 3.0)
    lg.end_iteration((0, 10))
    lg.parameters({"lr": 0.1})
    lines = open(path).read().strip().splitlines()
    assert all(l.startswith("DLLL ") for l in lines)
    rec = json.loads(lines[0][5:])
    assert rec["type"] == "LOG" and rec["data"]["train.loss"] == 2.0
    assert rec["step"] == [0, 10]


def test_quantile_meter():
    m = QuantileMeter()
    for v in range(1, 101):
        m.record(float(v))
    q = m.get()
    assert abs(q["p50"] - 50.5) < 1.0 and q["p100"] == 100.0


# -- train step -------------------------------------------------------------


def _toy_setup():
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}

    def loss_fn(params, model_state, batch, rng):
        pred = batch["x"] @ params["w"] + params["b"]
        loss = jnp.mean((pred - batch["y"]) ** 2)
        return loss, (model_state, {"mse": loss})

    return params, loss_fn


def test_train_step_reduces_loss():
    params, loss_fn = _toy_setup()
    tx = optax.sgd(0.1)
    state = create_train_state(params, tx, jax.random.key(0))
    step = make_train_step(loss_fn, tx, donate=False)
    batch = {
        "x": jnp.asarray(np.random.randn(16, 4), jnp.float32),
        "y": jnp.zeros((16, 4)),
    }
    state, m0 = step(state, batch)
    for _ in range(20):
        state, m = step(state, batch)
    assert m["loss"] < m0["loss"]
    assert int(state.step) == 21


def test_grad_accum_matches_full_batch():
    params, loss_fn = _toy_setup()
    tx = optax.sgd(0.1)
    batch = {
        "x": jnp.asarray(np.random.default_rng(0).normal(size=(16, 4)), jnp.float32),
        "y": jnp.ones((16, 4)),
    }
    s1 = create_train_state(params, tx, jax.random.key(0))
    s2 = create_train_state(params, tx, jax.random.key(0))
    full = make_train_step(loss_fn, tx, accum_steps=1, donate=False)
    accum = make_train_step(loss_fn, tx, accum_steps=4, donate=False)
    s1, _ = full(s1, batch)
    s2, _ = accum(s2, batch)
    np.testing.assert_allclose(s1.params["w"], s2.params["w"], rtol=1e-5)


def test_ema_tracks_params():
    params, loss_fn = _toy_setup()
    tx = optax.sgd(0.5)
    state = create_train_state(params, tx, jax.random.key(0), ema=True)
    step = make_train_step(loss_fn, tx, ema_decay=0.5, donate=False)
    batch = {"x": jnp.ones((8, 4)), "y": jnp.zeros((8, 4))}
    state, _ = step(state, batch)
    # ema = 0.5*old + 0.5*new, strictly between
    assert not np.allclose(state.ema_params["w"], state.params["w"])
    assert not np.allclose(state.ema_params["w"], params["w"])


# -- mesh / DP --------------------------------------------------------------


def test_mesh_dp_grad_allreduce():
    assert jax.device_count() == 8
    mesh = build_mesh(MeshSpec(data=8))
    params, loss_fn = _toy_setup()
    tx = optax.sgd(0.1)
    state = create_train_state(params, tx, jax.random.key(0))
    step = make_train_step(loss_fn, tx, donate=False)
    batch_np = {
        "x": np.random.default_rng(0).normal(size=(32, 4)).astype(np.float32),
        "y": np.zeros((32, 4), np.float32),
    }
    batch = shard_batch(mesh, batch_np)
    state_sharded, m_sharded = step(state, batch)
    # single-device result must match the sharded result
    state_single, m_single = step(state, jax.tree.map(jnp.asarray, batch_np))
    np.testing.assert_allclose(
        np.asarray(state_sharded.params["w"]),
        np.asarray(state_single.params["w"]),
        rtol=1e-5,
    )


def test_mesh_spec_resolution():
    assert MeshSpec(data=-1, model=2).resolve(8) == (4, 2, 1)
    with pytest.raises(ValueError):
        MeshSpec(data=3).resolve(8)


# -- losses -----------------------------------------------------------------


def test_label_smoothing_matches_manual():
    logits = jnp.asarray([[2.0, 0.0, -1.0]])
    labels = jnp.asarray([0])
    ls = losses.smoothed_cross_entropy(logits, labels, 0.1)
    logp = jax.nn.log_softmax(logits)
    off = 0.1 / 2
    manual = -((1 - 0.1 - off) + off) * 0  # placeholder to mirror formula
    soft = jnp.asarray([[1.0, 0.0, 0.0]]) * (1 - 0.1 - off) + off
    manual = -jnp.sum(soft * logp)
    np.testing.assert_allclose(ls, manual, rtol=1e-6)


def test_mixup_preserves_mean():
    rng = jax.random.key(0)
    x = jnp.ones((8, 2, 2, 3))
    y = jax.nn.one_hot(jnp.arange(8) % 4, 4)
    mx, my = losses.mixup(rng, 0.2, x, y)
    np.testing.assert_allclose(mx, x, rtol=1e-6)  # mixing ones with ones
    np.testing.assert_allclose(jnp.sum(my, -1), jnp.ones(8), rtol=1e-6)


# -- lr policies ------------------------------------------------------------


def test_cosine_policy_endpoints():
    sched = opt.lr_cosine_policy(1.0, warmup_epochs=1, epochs=10, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(0.1)
    assert float(sched(9)) == pytest.approx(1.0)
    assert float(sched(10)) == pytest.approx(1.0, abs=1e-3)
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-6)


def test_step_policy():
    sched = opt.lr_step_policy(1.0, [30, 60], 0.1, warmup_epochs=0, steps_per_epoch=1)
    assert float(sched(0)) == 1.0
    assert float(sched(30)) == pytest.approx(0.1)
    assert float(sched(60)) == pytest.approx(0.01)


def test_no_decay_mask():
    params = {
        "Conv_0": {"kernel": jnp.zeros((3, 3, 4, 4))},
        "BatchNorm_0": {"scale": jnp.zeros((4,)), "bias": jnp.zeros((4,))},
        "Dense_0": {"kernel": jnp.zeros((4, 4)), "bias": jnp.zeros((4,))},
    }
    mask = opt.no_decay_mask(params)
    assert mask["Conv_0"]["kernel"] is True
    assert mask["BatchNorm_0"]["scale"] is False
    assert mask["Dense_0"]["bias"] is False


def test_zero_sharded_optimizer_state_matches_replicated():
    """ZeRO-1: sharding optimizer state over the data axis must not change
    the math, and the updated state keeps its sharding."""
    from deeplearningexamples_tpu.parallel import shard_optimizer_state

    mesh = build_mesh(MeshSpec(data=8))
    params = {"w": jnp.ones((64, 32)), "b": jnp.zeros((32,))}

    def loss_fn(p, s, batch, rng):
        pred = batch["x"] @ p["w"] + p["b"]
        return jnp.mean((pred - batch["y"]) ** 2), (s, {})

    tx = optax.adam(0.1)
    batch_np = {
        "x": np.random.default_rng(0).normal(size=(32, 64)).astype(np.float32),
        "y": np.zeros((32, 32), np.float32),
    }
    batch = shard_batch(mesh, batch_np)

    s_rep = create_train_state(params, tx, jax.random.key(0))
    s_sh = create_train_state(params, tx, jax.random.key(0))
    s_sh = s_sh.replace(opt_state=shard_optimizer_state(s_sh.opt_state, mesh))
    # adam mu for 'w' is (64, 32) = 2048 elems -> sharded with min_size small
    s_sh = s_sh.replace(
        opt_state=shard_optimizer_state(s_sh.opt_state, mesh, min_size=1024)
    )

    step = make_train_step(loss_fn, tx, donate=False)
    for _ in range(3):
        s_rep, _ = step(s_rep, batch)
        s_sh, m = step(s_sh, batch)
    np.testing.assert_allclose(
        np.asarray(s_rep.params["w"]), np.asarray(s_sh.params["w"]), rtol=1e-5
    )
    # the moment for 'w' stays sharded over data after updates
    mu_w = s_sh.opt_state[0].mu["w"]
    spec = mu_w.sharding.spec
    assert spec and spec[0] == "data"
