"""Optimizers and LR policies.

Re-creates the reference's optimizer layer (``image_classification/
optimizers.py``: ``get_optimizer`` :8-31, ``get_sgd_optimizer`` :34,
``lr_cosine_policy`` :120-130) plus the tricks scattered through the recipes:

- BN/bias parameters excluded from weight decay ("tencent_trick",
  SSD ``ssd/train.py:192``; ConvNets ``bn_weight_decay`` split)
- warmup + {step, linear, cosine, exponential} LR policies
- DLRM's polynomial-decay warmup schedule (``dlrm/scripts/utils.py``)
- BERT's ``PolyWarmUpScheduler`` (``schedulers.py:109``)

All schedules are pure functions ``step -> lr`` (optax convention), so they
live inside the jitted step — no host-side ``lr_scheduler(optimizer, i,
epoch)`` calls.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = [
    "sgd",
    "rmsprop",
    "bert_adam",
    "no_decay_mask",
    "lr_step_policy",
    "lr_linear_policy",
    "lr_cosine_policy",
    "lr_exponential_policy",
    "lr_poly_warmup",
    "dlrm_lr_schedule",
]


def no_decay_mask(params: Any, extra_no_decay: tuple[str, ...] = ()) -> Any:
    """True where weight decay applies: excludes biases, BN/LN scales, and any
    param whose path contains one of ``extra_no_decay`` substrings.

    Flax convention: BN params live under ``.../BatchNorm_*/{scale,bias}``,
    LN under ``LayerNorm``; 1-D params are biases/scales.
    """

    def decay(path, p) -> bool:
        names = [getattr(k, "key", str(k)) for k in path]
        joined = "/".join(str(n) for n in names).lower()
        if p.ndim <= 1:
            return False
        for s in ("batchnorm", "layernorm", "groupnorm", "embedding") + tuple(
            e.lower() for e in extra_no_decay
        ):
            if s in joined:
                return False
        return True

    return jax.tree_util.tree_map_with_path(decay, params)


def sgd(
    lr: float | Callable[[int], float],
    momentum: float = 0.875,
    weight_decay: float = 0.0,
    bn_weight_decay: bool = False,
    nesterov: bool = False,
    params_for_mask: Any = None,
) -> optax.GradientTransformation:
    """SGD with decoupled-from-BN weight decay (reference optimizers.py:34-66).

    Weight decay here is L2-added-to-grad (``optax.add_decayed_weights``
    pre-momentum), matching torch SGD semantics rather than AdamW-style.
    """
    chain = []
    if weight_decay:
        mask = (
            None
            if bn_weight_decay or params_for_mask is None
            else no_decay_mask(params_for_mask)
        )
        chain.append(optax.add_decayed_weights(weight_decay, mask=mask))
    chain.append(optax.trace(decay=momentum, nesterov=nesterov))
    chain.append(optax.scale_by_learning_rate(lr))
    return optax.chain(*chain)


def rmsprop(
    lr: float | Callable[[int], float],
    alpha: float = 0.9,
    momentum: float = 0.9,
    eps: float = 1e-3,
    weight_decay: float = 0.0,
    params_for_mask: Any = None,
) -> optax.GradientTransformation:
    """RMSprop as used by EfficientNet (reference optimizers.py:69-90)."""
    chain = []
    if weight_decay:
        mask = None if params_for_mask is None else no_decay_mask(params_for_mask)
        chain.append(optax.add_decayed_weights(weight_decay, mask=mask))
    # eps_in_sqrt=False: torch.optim.RMSprop adds eps OUTSIDE the sqrt
    # (avg = sqrt(v) + eps); with the recipe's eps=1e-3 the placement is a
    # real numerical difference early in training (tests/test_optimizer_parity).
    chain.append(optax.scale_by_rms(decay=alpha, eps=eps, eps_in_sqrt=False))
    if momentum:
        chain.append(optax.trace(decay=momentum))
    chain.append(optax.scale_by_learning_rate(lr))
    return optax.chain(*chain)


class _BertAdamState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any


def bert_adam(
    lr: float,
    warmup: float = -1.0,
    t_total: int = -1,
    schedule: str = "warmup_linear",
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.01,
    max_grad_norm: float = 1.0,
    mask: Any | None = None,
) -> optax.GradientTransformation:
    """``BertAdam`` (reference ``BERT/optimization.py:64-176``): Adam with NO
    bias correction, decoupled weight decay, PER-PARAMETER grad-norm clipping
    (``clip_grad_norm_(p, ...)`` inside the param loop, :145-146), and the
    warmup schedule evaluated at the PRE-increment step count (:166-168 uses
    ``state['step']`` before :174 increments it → the very first update is
    scaled by ``schedule(0)``, which is 0 for ``warmup_linear``). Used by the
    reference SQuAD/GLUE/SWAG fine-tune runners in fp32 mode
    (``run_squad.py:986``). Trajectory-parity-tested against the imported
    reference optimizer in ``tests/test_optimizer_parity.py``.
    """

    def sched_mult(step_f):
        x = step_f / t_total
        if schedule == "warmup_linear":
            w = jnp.maximum((x - 1.0) / (warmup - 1.0), 0.0)
        elif schedule == "warmup_constant":
            w = 1.0
        elif schedule == "warmup_poly":
            w = (1.0 - x) ** 0.5
        elif schedule == "warmup_cosine":
            w = 0.5 * (1.0 + jnp.cos(jnp.pi * x))
        else:
            raise ValueError(f"unknown schedule {schedule}")
        return jnp.where(x < warmup, x / warmup, w)

    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return _BertAdamState(jnp.zeros((), jnp.int32), z,
                              jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params):
        wd_tree = (
            mask if mask is not None
            else jax.tree_util.tree_map(lambda _: True, params)
        )
        lr_t = lr * sched_mult(state.count.astype(jnp.float32)) \
            if t_total != -1 else lr

        def upd(g, m, v, p, use_wd):
            g = g.astype(jnp.float32)
            if max_grad_norm > 0:
                # torch clip_grad_norm_ per tensor: coef = max/(norm+1e-6),
                # applied iff coef < 1
                coef = max_grad_norm / (jnp.linalg.norm(g) + 1e-6)
                g = g * jnp.minimum(coef, 1.0)
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            u = m / (jnp.sqrt(v) + eps)  # no bias correction — by design
            if weight_decay > 0:
                u = u + jnp.where(use_wd, weight_decay, 0.0) * p.astype(jnp.float32)
            return (-(lr_t * u)).astype(p.dtype), m, v

        out = jax.tree_util.tree_map(upd, grads, state.mu, state.nu, params,
                                     wd_tree)
        updates = jax.tree_util.tree_map(lambda t: t[0], out,
                                         is_leaf=lambda x: isinstance(x, tuple))
        mu = jax.tree_util.tree_map(lambda t: t[1], out,
                                    is_leaf=lambda x: isinstance(x, tuple))
        nu = jax.tree_util.tree_map(lambda t: t[2], out,
                                    is_leaf=lambda x: isinstance(x, tuple))
        return updates, _BertAdamState(state.count + 1, mu, nu)

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# LR policies (step -> lr). All take steps_per_epoch so warmup/decay are in
# the reference's epoch units while remaining pure step functions.
# ---------------------------------------------------------------------------


def _warmup(base_lr, step, warmup_steps):
    return jnp.where(
        warmup_steps > 0,
        base_lr * jnp.minimum((step + 1) / jnp.maximum(warmup_steps, 1), 1.0),
        base_lr,
    )


def lr_step_policy(
    base_lr: float, steps: list[int], decay_factor: float, warmup_epochs: int,
    steps_per_epoch: int,
) -> Callable:
    """Piecewise-constant decay at epoch boundaries (optimizers.py:94-105)."""
    boundaries = jnp.asarray([s * steps_per_epoch for s in steps])
    warmup_steps = warmup_epochs * steps_per_epoch

    def sched(step):
        n = jnp.sum(step >= boundaries)
        lr = base_lr * decay_factor**n
        return jnp.where(step < warmup_steps, _warmup(base_lr, step, warmup_steps), lr)

    return sched


def lr_linear_policy(base_lr: float, warmup_epochs: int, epochs: int, steps_per_epoch: int):
    warmup_steps = warmup_epochs * steps_per_epoch
    total = epochs * steps_per_epoch

    def sched(step):
        frac = (step - warmup_steps) / jnp.maximum(total - warmup_steps, 1)
        lr = base_lr * jnp.clip(1.0 - frac, 0.0, 1.0)
        return jnp.where(step < warmup_steps, _warmup(base_lr, step, warmup_steps), lr)

    return sched


def lr_cosine_policy(
    base_lr: float, warmup_epochs: int, epochs: int, steps_per_epoch: int,
    end_lr: float = 0.0,
):
    """Cosine anneal with linear warmup (reference optimizers.py:120-130)."""
    warmup_steps = warmup_epochs * steps_per_epoch
    total = epochs * steps_per_epoch

    def sched(step):
        frac = (step - warmup_steps) / jnp.maximum(total - warmup_steps, 1)
        frac = jnp.clip(frac, 0.0, 1.0)
        lr = end_lr + (base_lr - end_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
        return jnp.where(step < warmup_steps, _warmup(base_lr, step, warmup_steps), lr)

    return sched


def lr_exponential_policy(
    base_lr: float, warmup_epochs: int, epochs: int, steps_per_epoch: int,
    final_multiplier: float = 0.001, decay_factor: float | None = None,
    decay_step: int = 1,
):
    """Per-epoch exponential decay (reference optimizers.py:133-154)."""
    warmup_steps = warmup_epochs * steps_per_epoch
    es = epochs - warmup_epochs
    if decay_factor is None:
        import numpy as np

        decay_factor = float(np.exp(np.log(final_multiplier) / max(es // decay_step, 1)))

    def sched(step):
        e = (step - warmup_steps) // steps_per_epoch
        lr = base_lr * decay_factor ** jnp.maximum(e // decay_step, 0)
        return jnp.where(step < warmup_steps, _warmup(base_lr, step, warmup_steps), lr)

    return sched


def lr_poly_warmup(base_lr: float, warmup_steps: int, total_steps: int, power: float = 0.5):
    """BERT PolyWarmUpScheduler (reference BERT ``schedulers.py:109``)."""

    def sched(step):
        w = _warmup(base_lr, step, warmup_steps)
        frac = jnp.clip((step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1), 0.0, 1.0)
        decay = base_lr * (1.0 - frac) ** power
        return jnp.where(step < warmup_steps, w, decay)

    return sched


def dlrm_lr_schedule(
    base_lr: float, warmup_steps: int, warmup_factor: float,
    decay_start_step: int, decay_steps: int, decay_power: float = 2.0,
    end_lr_factor: float = 0.0,
):
    """DLRM polynomial decay with stepped warmup (``dlrm/scripts/utils.py``
    ``LearningRateScheduler``)."""

    def sched(step):
        warm = base_lr * (
            (step + 1) / jnp.maximum(warmup_steps, 1)
        ) if warmup_steps else base_lr
        frac = jnp.clip((step - decay_start_step) / jnp.maximum(decay_steps, 1), 0.0, 1.0)
        decayed = base_lr * jnp.maximum((1.0 - frac) ** decay_power, end_lr_factor)
        lr = jnp.where(step < warmup_steps, warm, base_lr)
        return jnp.where(step >= decay_start_step, decayed, lr)

    return sched
