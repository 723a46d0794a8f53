"""Optimizer-update parity vs the reference's optimizer math (VERDICT r3 #1).

Four oracles, each transcribed from (or directly importing) the reference:

- NVLAMB: numpy transcription of ``multi_tensor_lamb.cu`` stage1
  (MOMENT_MODE_1, ``:148-157``) + stage2 trust-ratio gating (``:276-283``)
  driven with ``FusedLAMBAMP``'s global-norm pre-scaling
  (``fused_lamb/fused_lamb.py:160-200``). Both ``ops.lamb`` (per-tensor XLA)
  and ``ops.fused_lamb`` (flat Pallas) must track it step-for-step, including
  the no-decay group taking a PLAIN lr step (use_nvlamb=False default).
- BertAdam: the reference ``BERT/optimization.py:64-176`` imported directly
  (apex/amp_C stubbed — they are touched only by the unused FusedAdam path)
  vs ``core.optimizers.bert_adam``: no bias correction, per-parameter clip,
  schedule evaluated at the pre-increment step.
- bn-split SGD: ``torch.optim.SGD`` with the reference's bn/rest param groups
  (``image_classification/optimizers.py:34-66``) vs ``core.optimizers.sgd``.
- RMSprop: ``torch.optim.RMSprop`` (eps OUTSIDE the sqrt) with the EffNet
  recipe's eps=1e-3 vs ``core.optimizers.rmsprop``.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

REF_BERT = "/root/reference/PyTorch/LanguageModeling/BERT"


# ---------------------------------------------------------------------------
# NVLAMB numpy oracle
# ---------------------------------------------------------------------------


def nvlamb_oracle_step(params, grads, m, v, step, *, lr, wd, b1=0.9, b2=0.999,
                       eps=1e-6, max_grad_norm=1.0, use_nvlamb=False):
    """One NVLAMB step on dict-of-arrays state, mutating m/v, returning new
    params. ``step`` is the post-increment count (cu: group['step'] += 1
    before launch). adam_w_mode=1 (decoupled decay), grad_averaging=1."""
    gnorm = float(np.sqrt(sum(float((g.astype(np.float64) ** 2).sum())
                              for g in grads.values())))
    cgn = gnorm / max_grad_norm if gnorm > max_grad_norm else 1.0
    c1 = 1.0 - b1 ** step
    c2 = 1.0 - b2 ** step
    out = {}
    for k, p in params.items():
        sg = grads[k].astype(np.float32) / cgn
        m[k] = b1 * m[k] + (1 - b1) * sg
        v[k] = b2 * v[k] + (1 - b2) * sg * sg
        u = (m[k] / c1) / (np.sqrt(v[k] / c2) + eps) + wd[k] * p
        if use_nvlamb or wd[k] != 0.0:
            pn = float(np.linalg.norm(p))
            un = float(np.linalg.norm(u))
            ratio = lr * pn / un if (pn != 0.0 and un != 0.0) else lr
        else:
            ratio = lr
        out[k] = p - ratio * u
    return out


def _lamb_fixture(seed=0):
    rng = np.random.default_rng(seed)
    params = {
        "kernel": rng.standard_normal((64, 32)).astype(np.float32),
        "bias": rng.standard_normal((32,)).astype(np.float32),  # no-decay
        "ln_scale": np.ones((32,), np.float32),  # no-decay
        "zero_leaf": np.zeros((16,), np.float32),  # w_norm == 0 edge case
    }
    wd = {"kernel": 0.01, "bias": 0.0, "ln_scale": 0.0, "zero_leaf": 0.01}
    mask = {k: w != 0.0 for k, w in wd.items()}
    # step 3 grads scaled up so the global clip (norm > 1) actually fires
    grad_seq = []
    for s in range(6):
        scale = 40.0 if s == 2 else 0.02
        grad_seq.append({k: (scale * rng.standard_normal(p.shape)).astype(np.float32)
                         for k, p in params.items()})
    return params, wd, mask, grad_seq


@pytest.mark.parametrize("use_nvlamb", [False, True])
def test_ops_lamb_matches_nvlamb_oracle(use_nvlamb):
    from deeplearningexamples_tpu.ops.lamb import lamb

    params, wd, mask, grad_seq = _lamb_fixture()
    lr = 3e-3

    tx = lamb(lr, weight_decay=0.01, mask=mask, grad_clip_norm=1.0,
              use_nvlamb=use_nvlamb)
    jp = {k: jnp.asarray(v) for k, v in params.items()}
    st = tx.init(jp)

    op = {k: p.copy() for k, p in params.items()}
    om = {k: np.zeros_like(p) for k, p in params.items()}
    ov = {k: np.zeros_like(p) for k, p in params.items()}

    for step, g in enumerate(grad_seq, start=1):
        jg = {k: jnp.asarray(v) for k, v in g.items()}
        updates, st = tx.update(jg, st, jp)
        jp = optax.apply_updates(jp, updates)
        op = nvlamb_oracle_step(op, g, om, ov, step, lr=lr, wd=wd,
                                use_nvlamb=use_nvlamb)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(jp[k]), op[k], rtol=2e-5, atol=2e-6,
                err_msg=f"step {step} leaf {k} (use_nvlamb={use_nvlamb})")


def test_fused_lamb_matches_nvlamb_oracle():
    from deeplearningexamples_tpu.ops.fused_lamb import fused_lamb

    params, wd, mask, grad_seq = _lamb_fixture(seed=1)
    lr = 3e-3

    tx = fused_lamb(lr, weight_decay=0.01, mask=mask, grad_clip_norm=1.0)
    jp = {k: jnp.asarray(v) for k, v in params.items()}
    st = tx.init(jp)

    op = {k: p.copy() for k, p in params.items()}
    om = {k: np.zeros_like(p) for k, p in params.items()}
    ov = {k: np.zeros_like(p) for k, p in params.items()}

    for step, g in enumerate(grad_seq, start=1):
        jg = {k: jnp.asarray(v) for k, v in g.items()}
        updates, st = tx.update(jg, st, jp)
        jp = optax.apply_updates(jp, updates)
        op = nvlamb_oracle_step(op, g, om, ov, step, lr=lr, wd=wd)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(jp[k]), op[k], rtol=2e-5, atol=2e-6,
                err_msg=f"step {step} leaf {k}")


# ---------------------------------------------------------------------------
# BertAdam: import the reference optimizer itself
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_bert_adam():
    # apex/amp_C (used only by the FusedAdam/fp16 path we don't exercise)
    # are fully stubbed by conftest.py; just guard the generically-named
    # reference modules against collisions with other fixtures' imports
    saved = {k: sys.modules.get(k) for k in ("utils", "optimization")}
    sys.modules.pop("utils", None)
    sys.modules.pop("optimization", None)
    sys.path.insert(0, REF_BERT)
    try:
        import optimization as ref_optimization
        # drop the path immediately: the reference dir has a triton/
        # deployment folder that shadows the real triton package and breaks
        # torch._dynamo's lazy import inside Optimizer.__init__
        sys.path.remove(REF_BERT)
        yield ref_optimization
    finally:
        if REF_BERT in sys.path:
            sys.path.remove(REF_BERT)
        for k, vmod in saved.items():
            if vmod is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = vmod


def test_bert_adam_matches_reference(ref_bert_adam):
    from deeplearningexamples_tpu.core.optimizers import bert_adam

    rng = np.random.default_rng(5)
    arrs = {
        "w": rng.standard_normal((32, 16)).astype(np.float32),
        "b": rng.standard_normal((16,)).astype(np.float32),
        "ln": np.ones((16,), np.float32),
    }
    no_decay = {"w": False, "b": True, "ln": True}
    lr, warmup, t_total = 1e-2, 0.25, 20

    tps = {k: torch.nn.Parameter(torch.tensor(a)) for k, a in arrs.items()}
    groups = [
        {"params": [p for k, p in tps.items() if not no_decay[k]],
         "weight_decay": 0.01},
        {"params": [p for k, p in tps.items() if no_decay[k]],
         "weight_decay": 0.0},
    ]
    ref_opt = ref_bert_adam.BertAdam(
        groups, lr=lr, warmup=warmup, t_total=t_total,
        schedule="warmup_linear", max_grad_norm=1.0)

    tx = bert_adam(lr, warmup=warmup, t_total=t_total,
                   mask={k: not v for k, v in no_decay.items()})
    jp = {k: jnp.asarray(a) for k, a in arrs.items()}
    st = tx.init(jp)

    # include one big-grad step so the per-parameter clip fires
    for step in range(8):
        scale = 30.0 if step == 3 else 0.5
        g = {k: (scale * rng.standard_normal(a.shape)).astype(np.float32)
             for k, a in arrs.items()}
        for k, p in tps.items():
            p.grad = torch.tensor(g[k])
        ref_opt.step()
        updates, st = tx.update({k: jnp.asarray(v) for k, v in g.items()},
                                st, jp)
        jp = optax.apply_updates(jp, updates)
        for k in arrs:
            np.testing.assert_allclose(
                np.asarray(jp[k]), tps[k].detach().numpy(),
                rtol=2e-5, atol=2e-6, err_msg=f"step {step} leaf {k}")


# ---------------------------------------------------------------------------
# bn-split SGD and RMSprop vs torch.optim
# ---------------------------------------------------------------------------


def _run_torch_opt(make_opt, arrs, grad_seq, bn_keys):
    tps = {k: torch.nn.Parameter(torch.tensor(a)) for k, a in arrs.items()}
    opt = make_opt(tps)
    traj = []
    for g in grad_seq:
        for k, p in tps.items():
            p.grad = torch.tensor(g[k])
        opt.step()
        traj.append({k: p.detach().numpy().copy() for k, p in tps.items()})
    return traj


def _run_ours(tx, arrs, grad_seq):
    jp = {k: jnp.asarray(a) for k, a in arrs.items()}
    st = tx.init(jp)
    traj = []
    for g in grad_seq:
        updates, st = tx.update({k: jnp.asarray(v) for k, v in g.items()},
                                st, jp)
        jp = optax.apply_updates(jp, updates)
        traj.append({k: np.asarray(v) for k, v in jp.items()})
    return traj


@pytest.mark.parametrize("nesterov", [False, True])
def test_sgd_bn_split_matches_torch(nesterov):
    """Reference ``get_sgd_optimizer`` (optimizers.py:34-66): momentum SGD,
    L2 weight decay on non-bn params only."""
    from deeplearningexamples_tpu.core.optimizers import sgd

    rng = np.random.default_rng(7)
    arrs = {
        "conv_kernel": rng.standard_normal((3, 3, 8, 8)).astype(np.float32),
        "bn_scale": np.ones((8,), np.float32),
        "bn_bias": np.zeros((8,), np.float32),
    }
    grad_seq = [{k: (0.1 * rng.standard_normal(a.shape)).astype(np.float32)
                 for k, a in arrs.items()} for _ in range(5)]

    def make_opt(tps):
        bn = [p for k, p in tps.items() if "bn" in k]
        rest = [p for k, p in tps.items() if "bn" not in k]
        return torch.optim.SGD(
            [{"params": bn, "weight_decay": 0},
             {"params": rest, "weight_decay": 1e-4}],
            lr=0.1, momentum=0.875, nesterov=nesterov)

    ref = _run_torch_opt(make_opt, arrs, grad_seq, bn_keys=("bn_scale", "bn_bias"))

    # our mask: 1-D params (bn/bias) get no decay — matches the bn split here
    tx = sgd(0.1, momentum=0.875, weight_decay=1e-4, nesterov=nesterov,
             params_for_mask={k: jnp.asarray(a) for k, a in arrs.items()})
    ours = _run_ours(tx, arrs, grad_seq)

    for step, (r, o) in enumerate(zip(ref, ours)):
        for k in arrs:
            np.testing.assert_allclose(o[k], r[k], rtol=2e-6, atol=2e-7,
                                       err_msg=f"step {step} leaf {k}")


def test_rmsprop_matches_torch():
    """EffNet recipe RMSprop (optimizers.py:69-90): alpha=0.9, eps=1e-3
    OUTSIDE the sqrt, momentum buffer on the scaled update."""
    from deeplearningexamples_tpu.core.optimizers import rmsprop

    rng = np.random.default_rng(11)
    arrs = {
        "k": rng.standard_normal((16, 16)).astype(np.float32),
        "bn_s": np.ones((16,), np.float32),
    }
    grad_seq = [{k: (0.1 * rng.standard_normal(a.shape)).astype(np.float32)
                 for k, a in arrs.items()} for _ in range(5)]

    def make_opt(tps):
        bn = [tps["bn_s"]]
        rest = [tps["k"]]
        return torch.optim.RMSprop(
            [{"params": bn, "weight_decay": 0},
             {"params": rest, "weight_decay": 1e-5}],
            lr=0.05, alpha=0.9, eps=1e-3, momentum=0.9)

    ref = _run_torch_opt(make_opt, arrs, grad_seq, bn_keys=("bn_s",))
    tx = rmsprop(0.05, alpha=0.9, momentum=0.9, eps=1e-3, weight_decay=1e-5,
                 params_for_mask={k: jnp.asarray(a) for k, a in arrs.items()})
    ours = _run_ours(tx, arrs, grad_seq)

    for step, (r, o) in enumerate(zip(ref, ours)):
        for k in arrs:
            np.testing.assert_allclose(o[k], r[k], rtol=2e-5, atol=2e-6,
                                       err_msg=f"step {step} leaf {k}")
