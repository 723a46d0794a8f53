"""TrainState + jitted train/eval step factories — the L2 harness core.

TPU-native replacement for the reference's ``Executor``/``Trainer`` pair
(``PyTorch/Classification/ConvNets/image_classification/training.py:46-202``):

- one immutable ``TrainState`` pytree instead of stateful wrapper objects
- bf16 forward/backward with fp32 params (no GradScaler — bf16 has fp32's
  exponent range, so the APEX-AMP loss-scaling machinery is unnecessary)
- gradient accumulation as a ``lax.scan`` over microbatches *inside* the
  jitted step (reference ``batch_size_multiplier``, ``training.py:167-186``;
  BERT ``gradient_accumulation_steps`` + fp16 post-accumulation allreduce hook
  ``run_pretraining.py:459-475`` — here "accumulate fp32, psum once" falls out
  of XLA automatically)
- EMA of params as part of the state (reference ``models/common.py:191-218``)
- DDP is gone: with params replicated and batch sharded over the ``data`` mesh
  axis, XLA inserts the gradient all-reduce over ICI.

The loss function contract::

    loss_fn(params, model_state, batch, rng) -> (loss, (new_model_state, metrics))

``model_state`` carries mutable collections (flax ``batch_stats`` for BN);
``metrics`` is a dict of scalars averaged across microbatches.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
import optax
from flax import struct

__all__ = ["TrainState", "make_train_step", "make_eval_step", "create_train_state"]

LossFn = Callable[[Any, Any, Any, jax.Array], tuple[jax.Array, tuple[Any, Mapping]]]


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    model_state: Any  # mutable collections (batch_stats); empty dict if none
    opt_state: Any
    ema_params: Any  # None when EMA disabled
    rng: jax.Array


def create_train_state(
    params: Any,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    model_state: Any = None,
    ema: bool = False,
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        model_state=model_state if model_state is not None else {},
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if ema else None,
        rng=rng,
    )


def _split_microbatches(batch: Any, n: int) -> Any:
    """Reshape every leaf (B, ...) -> (n, B//n, ...)."""

    def split(x):
        if x.shape[0] % n:
            raise ValueError(
                f"batch dim {x.shape[0]} not divisible by accum_steps={n}"
            )
        return x.reshape((n, x.shape[0] // n) + x.shape[1:])

    return jax.tree_util.tree_map(split, batch)


def make_train_step(
    loss_fn: LossFn,
    tx: optax.GradientTransformation,
    *,
    accum_steps: int = 1,
    ema_decay: float | None = None,
    ema_steps: int = 1,
    donate: bool = True,
) -> Callable[[TrainState, Any], tuple[TrainState, Mapping]]:
    """Build the jitted training step.

    Returns ``train_step(state, batch) -> (state, metrics)``. ``batch`` is the
    per-process global batch; with ``accum_steps > 1`` it is split into
    microbatches scanned sequentially with fp32 gradient accumulation.
    """

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def single(params, model_state, batch, rng):
        (loss, (new_ms, metrics)), grads = grad_fn(params, model_state, batch, rng)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return grads, new_ms, metrics

    def accumulated(params, model_state, batch, rng):
        micro = _split_microbatches(batch, accum_steps)
        rngs = jax.random.split(rng, accum_steps)
        zero_grads = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params
        )

        def body(carry, xs):
            acc, ms = carry
            mb, r = xs
            grads, ms, metrics = single(params, ms, mb, r)
            acc = jax.tree_util.tree_map(
                lambda a, g: a + g.astype(jnp.float32), acc, grads
            )
            return (acc, ms), metrics

        (grads, new_ms), metrics = jax.lax.scan(
            body, (zero_grads, model_state), (micro, rngs)
        )
        grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads)
        metrics = jax.tree_util.tree_map(jnp.mean, metrics)
        return grads, new_ms, metrics

    compute_grads = accumulated if accum_steps > 1 else single

    def train_step(state: TrainState, batch: Any) -> tuple[TrainState, Mapping]:
        rng, step_rng = jax.random.split(state.rng)
        grads, new_ms, metrics = compute_grads(
            state.params, state.model_state, batch, step_rng
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        if getattr(tx, "returns_new_params", False):
            # flat fused-LAMB path (core/flat.py): the Pallas kernel already
            # wrote p' — skip apply_updates' extra pass over the buffer
            new_params = updates
        else:
            new_params = optax.apply_updates(state.params, updates)

        ema = state.ema_params
        if ema_decay is not None and ema is not None:
            # reference EMA updates every `ema_steps` with decay^steps warmup-free form
            should = (state.step % ema_steps) == 0
            d = jnp.where(should, ema_decay, 1.0)
            ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p * (1.0 - d), ema, new_params
            )

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            model_state=new_ms,
            opt_state=new_opt,
            ema_params=ema,
            rng=rng,
        )
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(
    metric_fn: Callable[[Any, Any, Any], Mapping],
) -> Callable[[TrainState, Any], Mapping]:
    """``metric_fn(params, model_state, batch) -> metrics`` jitted for eval.

    Callers pass ``state.ema_params`` explicitly when evaluating the EMA model
    (reference evaluates both, ``training.py:392-407``).
    """

    @jax.jit
    def eval_step(params, model_state, batch):
        return metric_fn(params, model_state, batch)

    return eval_step
