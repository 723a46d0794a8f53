"""LAMB optimizer (NVLAMB semantics).

TPU-native equivalent of the reference's fused multi-tensor CUDA LAMB
(``PyTorch/LanguageModeling/BERT/lamb_amp_opt/csrc/multi_tensor_lamb.cu``,
``fused_lamb.py`` — SURVEY.md §2.C row 1). The CUDA implementation exists to
amortize kernel-launch overhead across hundreds of small tensors
(``multi_tensor_apply.cuh``) and to keep fp16 master-weight copies in sync;
on TPU neither problem exists: XLA compiles the whole optimizer update into
a handful of fused loops over the flattened parameter buffers, and bf16
training keeps fp32 params in the optimizer chain natively. What must be
preserved is the *math*:

    m = b1*m + (1-b1)*g          (bias-corrected)
    v = b2*v + (1-b2)*g^2        (bias-corrected)
    u = m_hat / (sqrt(v_hat) + eps) + wd * p
    ratio = ||p|| / ||u||        (1.0 where either norm is 0)
    p -= lr * ratio * u

plus the reference's pre-step global-gradient-norm clipping
(``multi_tensor_l2norm`` + grad_pre_div) which we implement with
``optax.clip_by_global_norm`` (a single fused reduction under XLA).

Trust-ratio gating matches ``LAMBStage2Functor`` exactly
(``multi_tensor_lamb.cu:276-283``): with ``use_nvlamb=False`` (the
``FusedLAMBAMP`` default used by ``run_pretraining.py:429``) the adaptive
ratio applies ONLY to tensors with nonzero weight decay — the no-decay
group (bias/gamma/beta/LayerNorm, ``run_pretraining.py:423-427``) takes a
plain ``lr`` step. ``use_nvlamb=True`` applies the ratio everywhere.
The update math is verified step-for-step against a numpy transcription
of the CUDA kernel in ``tests/test_optimizer_parity.py``.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["lamb"]


class ScaleByLambState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any


def _scale_by_lamb(
    b1: float, b2: float, eps: float, weight_decay: float, mask: Any | None,
    moment_dtype: Any = jnp.float32, use_nvlamb: bool = False,
) -> optax.GradientTransformation:
    """``moment_dtype=bfloat16`` halves optimizer-state HBM (2.7GB for
    BERT-Large) and its read/write traffic; the update math stays fp32
    (moments are upcast per step). A deliberate deviation from the
    reference's fp32 moments — gate behind a flag and validate loss curves."""

    def init(params):
        return ScaleByLambState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, moment_dtype), params),
            nu=jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, moment_dtype), params),
        )

    def update(grads, state, params):
        count = state.count + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: (b1 * m.astype(jnp.float32)
                          + (1 - b1) * g.astype(jnp.float32)).astype(moment_dtype),
            state.mu, grads,
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: (b2 * v.astype(jnp.float32)
                          + (1 - b2) * jnp.square(g.astype(jnp.float32))
                          ).astype(moment_dtype),
            state.nu,
            grads,
        )
        c1 = 1 - b1**count.astype(jnp.float32)
        c2 = 1 - b2**count.astype(jnp.float32)

        wd_tree = (
            mask
            if mask is not None
            else jax.tree_util.tree_map(lambda _: True, params)
        )

        def upd(m, v, p, use_wd):
            m = m.astype(jnp.float32)
            v = v.astype(jnp.float32)
            u = (m / c1) / (jnp.sqrt(v / c2) + eps)
            decay_here = weight_decay if (weight_decay and use_wd) else 0.0
            if decay_here:
                u = u + decay_here * p.astype(jnp.float32)
            w_norm = jnp.linalg.norm(p.astype(jnp.float32))
            u_norm = jnp.linalg.norm(u)
            # cu:276-283 — ratio only where use_nvlamb or decay != 0
            if use_nvlamb or decay_here:
                ratio = jnp.where(
                    (w_norm > 0) & (u_norm > 0), w_norm / u_norm, 1.0
                )
            else:
                ratio = 1.0
            return (-ratio * u).astype(p.dtype)  # note: lr applied downstream

        updates = jax.tree_util.tree_map(upd, mu, nu, params, wd_tree)
        return updates, ScaleByLambState(count, mu, nu)

    return optax.GradientTransformation(init, update)


def lamb(
    learning_rate: float | Callable[[int], float],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.01,
    mask: Any | None = None,
    grad_clip_norm: float | None = 1.0,
    moment_dtype: Any = jnp.float32,
    use_nvlamb: bool = False,
) -> optax.GradientTransformation:
    """NVLAMB: global-norm grad clip → LAMB trust-ratio update → lr.

    ``mask``: True where weight decay (and hence, with ``use_nvlamb=False``,
    the trust ratio) applies — the reference recipe excludes
    bias/gamma/beta/LayerNorm (``run_pretraining.py:423-427``).
    """
    chain = []
    if grad_clip_norm:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    chain.append(
        _scale_by_lamb(b1, b2, eps, weight_decay, mask, moment_dtype, use_nvlamb)
    )
    # updates already carry the negative sign; scale by +lr
    lr = learning_rate
    if callable(lr):
        chain.append(optax.scale_by_schedule(lambda c: lr(c)))
    else:
        chain.append(optax.scale(lr))
    return optax.chain(*chain)
