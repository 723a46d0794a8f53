"""Pipeline parallelism (GPipe schedule) over a mesh axis.

The reference has NO pipeline parallelism anywhere (SURVEY.md §2.D: "PP —
No"), so this is a beyond-parity capability, built the TPU way: the stage
stack is a ``shard_map`` over one mesh axis where every device holds ONE
stage's parameters and the schedule is a ``lax.scan`` of compute +
``ppermute`` ticks — activations hop stage-to-stage over ICI as
nearest-neighbor transfers, exactly the collective pattern the hardware's
torus is built for. No per-stage Python processes, no send/recv framework:
the whole pipeline is one jitted SPMD program, so it composes with the
``data`` axis (DP×PP) and with ``jax.grad`` (autodiff transposes the
ppermute ring into the reverse-direction gradient ring automatically).

Schedule: classic GPipe fill-and-drain. For S stages and M microbatches the
scan runs S+M-1 ticks; at tick t, stage s computes microbatch ``t - s`` when
``0 <= t - s < M`` (bubble fraction (S-1)/(S+M-1) — raise M to amortize).
All devices run every tick (SPMD), with out-of-window stages computing on
don't-care data that is masked out of the output accumulator.

Memory: GPipe's weakness is holding all M microbatch activations for the
backward pass — under ``jax.grad`` the scan stashes one stage activation
per tick (S+M-1 of them). ``remat=True`` applies ``jax.checkpoint`` to the
stage body so each tick stores only its INPUT activation and recomputes the
stage forward during the backward scan — the same O(1)-per-tick activation
footprint 1F1B scheduling buys on GPU frameworks, obtained the XLA way
(recompute trades MXU flops, which the bubble has idle anyway, for HBM).
True 1F1B tick reordering would not reduce the bubble further in this SPMD
formulation (every device runs every tick regardless), so remat is the
whole benefit, not a stand-in.

Weight-update semantics are synchronous (like the reference's DDP): the
caller differentiates through ``pipeline_apply`` and every stage's gradient
is exact — there is no staleness, unlike PipeDream-style async schemes.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import MODEL_AXIS

__all__ = ["pipeline_apply", "stack_stage_params"]


def stack_stage_params(per_stage_params: list[Any]) -> Any:
    """Stack S identical-structure per-stage param pytrees along a new
    leading stage axis (the axis ``pipeline_apply`` shards over)."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *per_stage_params
    )


def _pipeline_local(
    params: Any,
    x: jax.Array,
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    axis_name: str,
    varying_axes: tuple[str, ...],
    remat: bool,
):
    """Shard-local GPipe loop. ``params``: this device's stage params with a
    leading length-1 stage axis (squeezed here); ``x``: all M microbatches
    (M, mb, ...) — replicated; only stage 0 reads it."""
    n = jax.lax.axis_size(axis_name)
    s = jax.lax.axis_index(axis_name)
    params = jax.tree_util.tree_map(lambda p: p[0], params)
    m = x.shape[0]
    ticks = n + m - 1
    is_first = s == 0
    is_last = s == n - 1
    # shard_map manual-axes tracking: fresh zeros are unvarying while the
    # scan writes varying values — mark carries varying up front
    def varying(z):
        return jax.lax.pcast(z, varying_axes, to="varying")

    compute = jax.checkpoint(stage_fn) if remat else stage_fn

    def body(carry, t):
        act, out = carry
        mb_idx = t - s  # which microbatch this stage works on at tick t
        feed = jax.lax.dynamic_index_in_dim(
            x, jnp.clip(t, 0, m - 1), axis=0, keepdims=False
        )
        act_in = jnp.where(is_first, feed, act)
        act_out = compute(params, act_in)
        live = is_last & (mb_idx >= 0) & (mb_idx < m)
        written = jax.lax.dynamic_update_index_in_dim(
            out, act_out.astype(out.dtype), jnp.clip(mb_idx, 0, m - 1), axis=0
        )
        out = jnp.where(live, written, out)
        # hand the activation to the next stage (last stage's send wraps to
        # stage 0, where it is overwritten by the next feed — harmless)
        act = jax.lax.ppermute(
            act_out, axis_name, [(j, (j + 1) % n) for j in range(n)]
        )
        return (act, out), None

    probe = jax.eval_shape(stage_fn, params, x[0])
    carry = (
        varying(jnp.zeros(probe.shape, probe.dtype)),
        varying(jnp.zeros((m,) + probe.shape, probe.dtype)),
    )
    (_, out), _ = jax.lax.scan(
        body, carry, jnp.arange(ticks, dtype=jnp.int32)
    )
    # the result lives on the last stage only; broadcast it to every stage
    # so the caller sees a replicated output (one psum over the pipe axis)
    return jax.lax.psum(
        jnp.where(is_last, out, jnp.zeros_like(out)), axis_name
    )


def pipeline_apply(
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    stacked_params: Any,
    microbatches: jax.Array,
    *,
    mesh: Mesh,
    axis_name: str = MODEL_AXIS,
    batch_axis: str | None = None,
    remat: bool = False,
) -> jax.Array:
    """Run ``microbatches`` (M, mb, ...) through S pipeline stages.

    ``stage_fn(stage_params, x) -> y`` must map activations to activations
    of the SAME shape/dtype (the homogeneous-trunk case — e.g. transformer
    layers); ``stacked_params`` has a leading stage axis of size
    ``mesh.shape[axis_name]`` (see :func:`stack_stage_params`).
    ``batch_axis`` additionally shards each microbatch's leading batch dim
    over that mesh axis (DP×PP: every data-slice runs the same pipe on its
    shard; gradient psums over ``data`` stay the caller's business exactly
    as in plain DP). ``remat=True`` checkpoints each stage application so
    the backward pass stores one activation per tick instead of the full
    stage graph — raise M (smaller bubble) without the GPipe memory bill.
    Returns (M, mb, ...) outputs, replicated over the pipe
    axis, identical to applying the stages sequentially
    (``tests/test_pipeline.py`` asserts forward AND gradient equality with
    the sequential oracle).
    """
    n = mesh.shape[axis_name]
    lead = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if lead != n:
        raise ValueError(
            f"stacked_params stage axis {lead} != mesh axis "
            f"{axis_name}={n}"
        )
    x_spec = P(None, batch_axis) if batch_axis else P()
    varying_axes = (axis_name,) + ((batch_axis,) if batch_axis else ())
    return jax.shard_map(
        partial(
            _pipeline_local,
            stage_fn=stage_fn,
            axis_name=axis_name,
            varying_axes=varying_axes,
            remat=remat,
        ),
        mesh=mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: P(axis_name), stacked_params),
            x_spec,
        ),
        out_specs=x_spec,
    )(stacked_params, microbatches)
