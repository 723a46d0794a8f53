"""Flat-parameter training: the production path for fused Pallas LAMB.

TPU-native equivalent of the reference's multi-tensor-apply machinery
(``LanguageModeling/BERT/lamb_amp_opt/csrc/multi_tensor_lamb.cu`` +
``multi_tensor_apply.cuh``): where CUDA chunks a *list* of tensor pointers to
amortize kernel launches, here the parameters are stored as ONE flat fp32
buffer in ``TrainState.params`` for the whole training run. The model's
pytree view is recreated inside the loss function with per-leaf
``dynamic_slice`` + cast (fused by XLA into the same single pass the old
fp32->bf16 param cast already cost), so the gradient arrives as a flat
buffer automatically — no 400-way concat per step (the compile-time/HBM
trap documented in ``ops/fused_lamb.py``).

The optimizer is two Pallas passes over HBM (the same traffic shape as the
CUDA pair multi_tensor_l2norm + multi_tensor_lamb):

  pass 1: m,v Adam-moment update + per-leaf partial sums of ||p||^2,||u||^2
          (u is computed on the fly for its norm and NOT written back)
  tiny XLA: trust ratio per leaf, scale = lr * ratio
  pass 2: recompute u from (m, v, p) and write p' = p - scale[leaf] * u

Traffic: 28 B/elem with bf16 moments (9.4 GB for BERT-Large ≈ 11.5 ms on a
v5e at 819 GB/s) vs ~40 B/elem for the per-tensor XLA formulation.

``flat_lamb`` deliberately breaks the optax "updates are deltas" contract —
its ``update`` returns the NEW parameter buffer (marked by
``returns_new_params``) so the train step skips the extra read-modify-write
of ``optax.apply_updates`` over 1.3 GB.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.fused_lamb import FlatLayout

__all__ = ["flatten_train", "flat_lamb", "unflatten", "default_wd_mask"]

LANES = 1024
# Grid-block size: each Pallas grid step processes (BLOCK_ROWS, 1024)
# elements and every leaf's segment is padded to it. Bigger blocks amortize
# per-grid-step overhead (~1 us each), smaller blocks waste less padding on
# the ~400 small leaves; 64 rows ~ 3.8%% padding on BERT-Large. Tuned on v5e.
BLOCK_ROWS = 64
BLOCK = BLOCK_ROWS * LANES


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _make_layout_blocked(params: Any, block: int = BLOCK) -> FlatLayout:
    """``ops.fused_lamb.make_layout`` with a configurable block."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    shapes = tuple(l.shape for l in leaves)
    sizes = np.asarray([int(np.prod(s)) if s else 1 for s in shapes])
    padded = ((sizes + block - 1) // block) * block
    starts = np.concatenate([[0], np.cumsum(padded)[:-1]])
    total = int(padded.sum())
    seg_ids = np.repeat(np.arange(len(leaves)), padded // block)
    return FlatLayout(treedef, shapes, starts, sizes, total, seg_ids, len(leaves))


def _layout_block(layout: FlatLayout) -> int:
    return layout.total // len(layout.seg_ids)


def unflatten(layout: FlatLayout, flat: jax.Array, dtypes: tuple) -> Any:
    """Flat (rows, 1024) fp32 buffer -> pytree, casting each leaf to its
    compute dtype.

    The buffer is kept 2D end-to-end: a 1D bf16 array of N elements gets the
    degenerate ``(N/2, 2)`` TPU layout whose (8, 128) tile padding
    over-allocates HBM 64x (measured: a 43 GB allocation for BERT-Large), so
    leaves whose size is lane-aligned are cast to bf16 while still (rows,
    1024).

    Backward is a custom VJP: the naive transpose (one dynamic_update_slice
    into a zeros buffer per leaf, summed) costs ~200 ms/step for BERT-Large
    under XLA; instead the leaf cotangents — which tile the buffer exactly,
    in order, because every segment is block-padded — are concatenated in
    one pass.
    """
    return make_unflatten(layout, dtypes)(flat)


def make_unflatten(layout: FlatLayout, dtypes: tuple) -> Callable:
    """Build the (custom-VJP) flat -> pytree view for one layout."""

    def slices(flat):
        out = []
        for start, size, shape, dt in zip(
            layout.starts, layout.sizes, layout.shapes, dtypes
        ):
            start, size = int(start), int(size)
            nrows = -(-size // LANES)
            leaf2d = jax.lax.dynamic_slice(
                flat, (start // LANES, 0), (nrows, LANES)
            )
            if size % LANES == 0:
                leaf = leaf2d.astype(dt).reshape(shape)  # cast while 2D
            else:
                leaf = leaf2d.reshape(-1)[:size].astype(dt).reshape(shape)
            out.append(leaf)
        return jax.tree_util.tree_unflatten(layout.treedef, out)

    @jax.custom_vjp
    def f(flat):
        return slices(flat)

    def fwd(flat):
        return slices(flat), None

    block = _layout_block(layout)

    def bwd(_res, cts):
        parts = []
        for ct, size in zip(jax.tree_util.tree_leaves(cts), layout.sizes):
            size = int(size)
            pad_rows = (block // LANES) * (-(-size // block))  # segment rows
            if size % LANES == 0:
                ct2d = ct.astype(jnp.float32).reshape(size // LANES, LANES)
            else:
                flat_ct = ct.astype(jnp.float32).reshape(-1)
                flat_ct = jnp.pad(flat_ct, (0, -size % LANES))
                ct2d = flat_ct.reshape(-1, LANES)
            if ct2d.shape[0] < pad_rows:
                ct2d = jnp.pad(ct2d, ((0, pad_rows - ct2d.shape[0]), (0, 0)))
            parts.append(ct2d)
        return (jnp.concatenate(parts, axis=0),)

    f.defvjp(fwd, bwd)
    return f


def default_wd_mask(params: Any) -> Any:
    """Reference BERT weight-decay grouping (run_pretraining.py optimizer
    groups): no decay on biases or LayerNorm scales."""

    def use_wd(path, _):
        names = {str(getattr(k, "key", k)) for k in path}
        return not (names & {"bias", "scale", "mlm_bias"})

    return jax.tree_util.tree_map_with_path(use_wd, params)


# ---------------------------------------------------------------------------
# Pass 1: moment update + per-leaf norm partials
# ---------------------------------------------------------------------------


def _moment_kernel(seg_ref, wd_ref, hyp_ref, g_ref, p_ref, m_ref, v_ref,
                   m_out, v_out, wsq_out, usq_out):
    i = pl.program_id(0)
    seg = seg_ref[i]
    b1, b2, eps, c1, c2, cs = (hyp_ref[0], hyp_ref[1], hyp_ref[2],
                               hyp_ref[3], hyp_ref[4], hyp_ref[5])
    g = g_ref[...] * cs  # cs folds in the global-norm clip factor
    p = p_ref[...]
    m = b1 * m_ref[...].astype(jnp.float32) + (1.0 - b1) * g
    v = b2 * v_ref[...].astype(jnp.float32) + (1.0 - b2) * g * g
    u = (m / c1) / (jnp.sqrt(v / c2) + eps) + wd_ref[seg] * p
    m_out[...] = m.astype(m_out.dtype)
    v_out[...] = v.astype(v_out.dtype)

    @pl.when(i == 0)
    def _():
        for r in range(wsq_out.shape[0]):
            wsq_out[r] = 0.0
            usq_out[r] = 0.0

    wsq_out[seg] += jnp.sum(p * p)
    usq_out[seg] += jnp.sum(u * u)


# ---------------------------------------------------------------------------
# Pass 2: recompute u, apply p' = p - scale[leaf] * u
# ---------------------------------------------------------------------------


def _apply_kernel(seg_ref, wd_ref, hyp_ref, scale_ref, p_ref, m_ref, v_ref,
                  p_out):
    i = pl.program_id(0)
    seg = seg_ref[i]
    eps, c1, c2 = hyp_ref[2], hyp_ref[3], hyp_ref[4]
    p = p_ref[...]
    m = m_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    u = (m / c1) / (jnp.sqrt(v / c2) + eps) + wd_ref[seg] * p
    p_out[...] = p - scale_ref[seg] * u


@functools.partial(jax.jit, static_argnames=("n_blocks", "n_leaves"),
                   donate_argnums=(0, 1, 2, 3))
def _flat_lamb_update(g2, p2, m2, v2, wd_leaf, seg_ids, hyp,
                      lr, n_blocks: int, n_leaves: int):
    shape2d = p2.shape  # (rows, LANES)
    mdt = m2.dtype
    block_rows = shape2d[0] // n_blocks

    def spec():
        return pl.BlockSpec((block_rows, LANES), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)

    m_new, v_new, wsq, usq = pl.pallas_call(
        _moment_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # seg_ids, wd_leaf, hyp
            grid=(n_blocks,),
            in_specs=[spec(), spec(), spec(), spec()],
            out_specs=[
                spec(), spec(),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(shape2d, mdt),
            jax.ShapeDtypeStruct(shape2d, mdt),
            jax.ShapeDtypeStruct((n_leaves,), jnp.float32),
            jax.ShapeDtypeStruct((n_leaves,), jnp.float32),
        ],
        interpret=_interpret(),
    )(seg_ids, wd_leaf, hyp, g2, p2, m2, v2)

    w_norm = jnp.sqrt(wsq)
    u_norm = jnp.sqrt(usq)
    # LAMBStage2Functor gating (multi_tensor_lamb.cu:276-283): use_nvlamb is
    # False in the reference recipe, so no-decay leaves take a plain-lr step
    ratio = jnp.where(
        (wd_leaf > 0) & (w_norm > 0) & (u_norm > 0), w_norm / u_norm, 1.0
    )
    scale_leaf = lr * ratio  # (n_leaves,)

    p_new = pl.pallas_call(
        _apply_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,  # seg_ids, wd_leaf, hyp, scale_leaf
            grid=(n_blocks,),
            in_specs=[spec(), spec(), spec()],
            out_specs=spec(),
        ),
        out_shape=jax.ShapeDtypeStruct(shape2d, jnp.float32),
        interpret=_interpret(),
    )(seg_ids, wd_leaf, hyp, scale_leaf, p2, m_new, v_new)

    return p_new, m_new, v_new


class FlatLambState(NamedTuple):
    count: jax.Array
    flat_m: jax.Array
    flat_v: jax.Array


class FlatLambTransform(NamedTuple):
    """optax-shaped transform whose ``update`` returns NEW params (flagged by
    ``returns_new_params`` — ``make_train_step`` checks it)."""

    init: Callable
    update: Callable
    returns_new_params: bool = True


def flat_lamb(
    learning_rate: float | Callable[[int], float],
    layout: FlatLayout,
    wd_leaf: np.ndarray,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    grad_clip_norm: float | None = 1.0,
    moment_dtype: Any = jnp.float32,
) -> FlatLambTransform:
    """NVLAMB on a flat parameter buffer. ``wd_leaf`` is the per-leaf weight
    decay (0.0 where masked)."""
    wd_dev = jnp.asarray(wd_leaf, jnp.float32)
    seg_dev = jnp.asarray(layout.seg_ids, jnp.int32)
    n_blocks = len(layout.seg_ids)

    rows2d = (layout.total // LANES, LANES)

    def init(flat_params):
        assert flat_params.shape == rows2d, (
            f"flat_lamb layout mismatch: {flat_params.shape} vs {rows2d}"
        )
        # two distinct buffers — donating the state would otherwise pass the
        # same underlying buffer twice
        return FlatLambState(
            jnp.zeros((), jnp.int32),
            jnp.zeros(rows2d, moment_dtype),
            jnp.zeros(rows2d, moment_dtype),
        )

    def update(flat_g, state, flat_p):
        count = state.count + 1
        cf = count.astype(jnp.float32)
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        if grad_clip_norm:
            # fused_lamb.py semantics: g /= max(1, gnorm/max_norm) — no eps
            gnorm = jnp.sqrt(jnp.sum(flat_g.astype(jnp.float32) ** 2))
            cs = jnp.where(gnorm > grad_clip_norm, grad_clip_norm / gnorm, 1.0)
        else:
            cs = jnp.float32(1.0)
        hyp = jnp.stack([
            jnp.float32(b1), jnp.float32(b2), jnp.float32(eps),
            1 - b1**cf, 1 - b2**cf, cs,
        ])
        p_new, m, v = _flat_lamb_update(
            flat_g, flat_p, state.flat_m, state.flat_v, wd_dev, seg_dev, hyp,
            jnp.asarray(lr, jnp.float32),
            n_blocks=n_blocks, n_leaves=layout.n_leaves,
        )
        return p_new, FlatLambState(count, m, v)

    return FlatLambTransform(init, update)


def flatten_train(
    loss_fn: Callable,
    params: Any,
    *,
    lr: float | Callable[[int], float],
    weight_decay: float = 0.01,
    grad_clip_norm: float | None = 1.0,
    moment_dtype: Any = jnp.float32,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
) -> tuple[Callable, FlatLambTransform, jax.Array]:
    """Convert a pytree training setup to the flat fused-LAMB path.

    Returns ``(flat_loss_fn, tx, flat_params)``; drop them into
    ``create_train_state`` / ``make_train_step`` as usual. The checkpointed
    state stores the flat buffer; ``unflatten`` reconstructs the pytree view
    for export/eval.
    """
    layout = _make_layout_blocked(params)
    dtypes = tuple(l.dtype for l in jax.tree_util.tree_leaves(params))
    flat_params = pack_blocked(layout, params)
    mask_leaves = jax.tree_util.tree_leaves(default_wd_mask(params))
    wd_leaf = np.asarray(
        [weight_decay if m else 0.0 for m in mask_leaves], np.float32
    )

    view = make_unflatten(layout, dtypes)

    def flat_loss_fn(flat, model_state, batch, rng):
        return loss_fn(view(flat), model_state, batch, rng)

    tx = flat_lamb(
        lr, layout, wd_leaf, b1=b1, b2=b2, eps=eps,
        grad_clip_norm=grad_clip_norm, moment_dtype=moment_dtype,
    )
    flat_loss_fn.layout = layout
    flat_loss_fn.dtypes = dtypes
    return flat_loss_fn, tx, flat_params


def pack_blocked(layout: FlatLayout, tree: Any) -> jax.Array:
    """One-time pytree -> flat (rows, 1024) fp32 buffer (host-side)."""
    leaves = jax.tree_util.tree_leaves(tree)
    buf = np.zeros((layout.total,), np.float32)
    for leaf, start, size in zip(leaves, layout.starts, layout.sizes):
        buf[int(start):int(start) + int(size)] = np.asarray(
            jax.device_get(leaf), np.float32
        ).reshape(-1)
    return jnp.asarray(buf.reshape(layout.total // LANES, LANES))
