"""Ring attention — exact sequence-parallel attention over the mesh
``sequence`` axis.

The reference has no sequence/context parallelism at all (verified repo-wide,
SURVEY.md §2.D: max seq len is BERT phase-2's 512), so this is a
beyond-parity capability: it removes the single-chip S^2 ceiling by sharding
the sequence across devices and rotating K/V shards around the ring with
``jax.lax.ppermute`` — the canonical TPU ICI pattern (each step is a
nearest-neighbor transfer that overlaps with the block compute XLA schedules
between collectives).

Numerics are the flash-attention online softmax applied across ring steps:
each device keeps a running (max, denominator, weighted-sum) triple in fp32
for its query shard and folds in one K/V shard per step, so the result is
bit-for-bit the same math as a single-device streaming softmax — NOT an
approximation. The whole loop is a ``lax.scan`` of jnp block ops, so
``jax.grad`` differentiates it (``ppermute`` transposes to the inverse
permutation) and remat policies apply unchanged.

Causal masking uses global positions: a device's query shard occupies rows
``[i*Sl, (i+1)*Sl)`` and masks each visiting K/V shard by its origin offset.
In the contiguous layout, blocks strictly above the diagonal are fully
masked — their compute is wasted, and worse, the ring is load-IMBALANCED:
device 0 has real work only at step 0 while device n-1 works every step, so
the ring's wall-clock is device n-1's n full blocks.

``zigzag=True`` (causal only) fixes both with the zigzag layout: the global
sequence is split into 2n chunks and device i holds chunks ``[i, 2n-1-i]``
— one early, one late. Per ring step every device then has exactly half a
block of live work (queries×half-keys when the visiting shard is earlier,
half-queries×keys when it is later), which the step body computes on sliced
halves under ``lax.cond`` instead of masking: FLOPs drop from ``n`` full
blocks to ``1 + (n-1)/2`` and every device does identical work every step.
Numerics are unchanged — positions travel with the chunks, so the online
softmax, the causal mask, and the positional-hash dropout are all in global
coordinates and the result equals the contiguous oracle exactly.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..parallel.mesh import SEQ_AXIS
from .flash_attention import _dropout_scale

__all__ = ["ring_attention", "ring_attention_local"]

NEG_INF = -1e30


def ring_attention_local(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: jax.Array | None = None,
    *,
    axis_name: str = SEQ_AXIS,
    causal: bool = False,
    sm_scale: float | None = None,
    dropout_rate: float = 0.0,
    dropout_seed: jax.Array | int = 0,
    zigzag: bool = False,
) -> jax.Array:
    """Shard-local ring attention; call INSIDE ``shard_map``/``pjit`` manual
    regions where the sequence axis is sharded over ``axis_name``.

    q, k, v: (B, H, S_local, D) — this device's sequence shard.
    key_mask: (B, S_local) with 1 = attend, rotated along with K/V.
    Rows whose keys are ALL masked return zeros (a denominator of 0 has no
    softmax limit; the reference's naive path returns uniform garbage there).

    ``dropout_rate`` applies attention-PROBABILITY dropout (numerator only,
    denominator pre-dropout — reference BERT semantics) via the flash
    kernel's stateless positional hash on GLOBAL (q, k) positions with the
    same ``salt = batch*H + head`` scheme, so the keep-mask is independent
    of the ring decomposition and matches ``flash_attention``'s interpret
    path bit-for-bit for the same seed (tested).

    ``zigzag=True`` (requires ``causal``) expects the local shard to hold the
    zigzag chunk pair ``[chunk i, chunk 2n-1-i]`` of a 2n-chunk global split
    (the ``ring_attention`` wrapper lays this out) and computes each visiting
    step on sliced halves — half the FLOPs of the masked contiguous ring and
    perfectly load-balanced across devices.
    """
    n = jax.lax.axis_size(axis_name)
    i = jax.lax.axis_index(axis_name)
    b, h, sl, d = q.shape
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(d)
    qf = q.astype(jnp.float32) * scale
    if zigzag:
        if not causal:
            raise ValueError("zigzag layout only pays off for causal=True")
        if sl % 2:
            raise ValueError(f"zigzag needs an even local length, got {sl}")
        c = sl // 2
        # global positions of this device's [chunk i, chunk 2n-1-i] pair
        qpos = jnp.concatenate(
            [i * c + jnp.arange(c), (2 * n - 1 - i) * c + jnp.arange(c)]
        )
    else:
        qpos = i * sl + jnp.arange(sl)
    seed = salt = None
    if dropout_rate > 0.0:
        seed = jnp.asarray(dropout_seed, jnp.int32)
        salt = (jnp.arange(b, dtype=jnp.int32)[:, None] * h
                + jnp.arange(h, dtype=jnp.int32)[None, :])[..., None, None]

    def fold(o, m, l, s, vt_sel, qp, kp, guard):
        """One online-softmax update of rows (o, m, l) with scores s.

        ``guard``: s may contain NEG_INF entries (mask applied) — zero their
        exp explicitly so untouched rows don't accumulate exp(0)=1.
        """
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        if guard:
            p = jnp.where(s > NEG_INF / 2, p, 0.0)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1)
        if dropout_rate > 0.0:
            # numerator-only (denominator already accumulated above)
            p = p * _dropout_scale(
                qp[None, None, :, None], kp[None, None, None, :],
                seed, salt, dropout_rate,
            )
        o = o * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, vt_sel.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return o, m_new, l

    def scores(q_sel, k_sel, mask_sel):
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q_sel, k_sel.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        if mask_sel is not None:
            s = jnp.where(mask_sel[:, None, None, :].astype(bool), s, NEG_INF)
        return s

    # device j hands its current K/V shard to j-1 each step, so at step t
    # device i is holding the shard that originated on device (i + t) % n;
    # after n steps every shard is back home (scan carries stay balanced).
    perm = [(j, (j - 1) % n) for j in range(n)]

    def body(carry, t):
        o, m, l, kt, vt, maskt = carry
        src = (i + t) % n
        if zigzag:
            c = sl // 2
            kpos = jnp.concatenate(
                [src * c + jnp.arange(c),
                 (2 * n - 1 - src) * c + jnp.arange(c)]
            )

            def diag(o, m, l):
                # home block: full causal mask in global coordinates
                s = scores(qf, kt, maskt)
                s = jnp.where(qpos[:, None] >= kpos[None, :], s, NEG_INF)
                return fold(o, m, l, s, vt, qpos, kpos, True)

            def earlier(o, m, l):
                # src < i: both query chunks see ONLY the visiting early
                # chunk (its late chunk 2n-1-src is after both of ours) —
                # full queries x half keys, no causal mask needed
                mh = None if maskt is None else maskt[:, :c]
                s = scores(qf, kt[:, :, :c], mh)
                return fold(o, m, l, s, vt[:, :, :c], qpos, kpos[:c],
                            maskt is not None)

            def later(o, m, l):
                # src > i: only our late chunk (rows c:) sees the visiting
                # pair, and it sees ALL of it — half queries x full keys
                s = scores(qf[:, :, c:], kt, maskt)
                o2, m2, l2 = fold(
                    o[:, :, c:], m[:, :, c:], l[:, :, c:], s, vt,
                    qpos[c:], kpos, maskt is not None,
                )
                return (
                    jnp.concatenate([o[:, :, :c], o2], axis=2),
                    jnp.concatenate([m[:, :, :c], m2], axis=2),
                    jnp.concatenate([l[:, :, :c], l2], axis=2),
                )

            o, m, l = jax.lax.cond(
                src == i, diag,
                lambda o, m, l: jax.lax.cond(src < i, earlier, later, o, m, l),
                o, m, l,
            )
        else:
            kpos = src * sl + jnp.arange(sl)
            s = scores(qf, kt, maskt)
            if causal:
                s = jnp.where(qpos[:, None] >= kpos[None, :], s, NEG_INF)
            o, m, l = fold(o, m, l, s, vt, qpos, kpos, True)
        kt = jax.lax.ppermute(kt, axis_name, perm)
        vt = jax.lax.ppermute(vt, axis_name, perm)
        if maskt is not None:
            maskt = jax.lax.ppermute(maskt, axis_name, perm)
        return (o, m, l, kt, vt, maskt), None

    # fresh zeros are "unvarying" under shard_map's manual-axes tracking
    # while the loop outputs vary over the ring axis — mark them varying
    # up front so the scan carry types agree
    def _varying(x):
        return jax.lax.pcast(x, (axis_name,), to="varying")

    carry = (
        _varying(jnp.zeros((b, h, sl, d), jnp.float32)),
        _varying(jnp.full((b, h, sl), NEG_INF, jnp.float32)),
        _varying(jnp.zeros((b, h, sl), jnp.float32)),
        k,
        v,
        key_mask,
    )
    (o, _, l, _, _, _), _ = jax.lax.scan(
        body, carry, jnp.arange(n, dtype=jnp.int32)
    )
    out = o / jnp.maximum(l, 1e-30)[..., None]
    return out.astype(q.dtype)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: jax.Array | None = None,
    *,
    mesh: Mesh | None = None,
    causal: bool = False,
    sm_scale: float | None = None,
    axis_name: str = SEQ_AXIS,
    dropout_rate: float = 0.0,
    dropout_seed: jax.Array | int = 0,
    zigzag: bool = False,
) -> jax.Array:
    """Global-view ring attention: q, k, v are (B, H, S, D) with S divisible
    by the mesh's ``axis_name`` size; the wrapper shards S and runs the ring.
    Matches ``mha_reference``/``flash_attention`` numerics (fp32 accumulate).

    ``mesh=None`` uses the ambient mesh (``jax.set_mesh``) so model code —
    e.g. BERT's ``attention_impl="ring"`` — needn't thread a Mesh through
    module attributes.

    ``zigzag=True`` (causal only, S divisible by 2n) reshuffles the sequence
    into the load-balanced zigzag layout, runs the half-FLOPs ring, and
    unshuffles the output — numerically identical to ``zigzag=False``. The
    shuffle is a static gather; a production input pipeline should feed
    zigzag-ordered shards directly and call ``ring_attention_local``.
    """
    if mesh is None:
        mesh = jax.sharding.get_abstract_mesh()
        if mesh is None or axis_name not in getattr(mesh, "shape", {}):
            raise ValueError(
                "ring_attention: no mesh passed and no ambient mesh with a "
                f"'{axis_name}' axis (call under jax.set_mesh(...))"
            )
    n = mesh.shape[axis_name]
    s = q.shape[-2]
    if s % n:
        raise ValueError(
            f"seq len {s} not divisible by {axis_name}={n}"
        )
    inv = None
    if zigzag:
        if not causal:
            raise ValueError("zigzag layout only pays off for causal=True")
        if s % (2 * n):
            raise ValueError(f"zigzag needs seq len divisible by 2n={2 * n}")
        c = s // (2 * n)
        import numpy as _np

        idx = _np.concatenate([
            _np.concatenate([_np.arange(i * c, (i + 1) * c),
                             _np.arange((2 * n - 1 - i) * c, (2 * n - i) * c)])
            for i in range(n)
        ])
        inv = _np.empty_like(idx)
        inv[idx] = _np.arange(s)
        q, k, v = (x[:, :, idx, :] for x in (q, k, v))
        if key_mask is not None:
            key_mask = key_mask[:, idx]
    qkv_spec = P(None, None, axis_name, None)
    in_specs = [qkv_spec, qkv_spec, qkv_spec]
    args = [q, k, v]
    if key_mask is not None:
        in_specs.append(P(None, axis_name))
        args.append(key_mask)

    fn = partial(
        ring_attention_local,
        axis_name=axis_name,
        causal=causal,
        sm_scale=sm_scale,
        dropout_rate=dropout_rate,
        dropout_seed=dropout_seed,
        zigzag=zigzag,
    )

    def local(*xs):
        if key_mask is not None:
            qs, ks, vs, ms = xs
            return fn(qs, ks, vs, ms)
        qs, ks, vs = xs
        return fn(qs, ks, vs, None)

    out = jax.shard_map(
        local, mesh=mesh, in_specs=tuple(in_specs), out_specs=qkv_spec
    )(*args)
    if inv is not None:
        out = out[:, :, inv, :]
    return out
