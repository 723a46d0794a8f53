"""Fused multi-head attention (flash-style) Pallas TPU kernel.

TPU-native replacement for the reference BERT's naive O(L^2) attention
(``PyTorch/LanguageModeling/BERT/modeling.py:340-384``), which materializes
the full ``(bsz, heads, seq, seq)`` score tensor in HBM (SURVEY.md §5.7).
Here scores for one query block live only in VMEM: the kernel tiles queries
over the grid, streams K/V per (batch, head), and fuses scale → mask →
softmax → PV into a single pass. Accumulation is fp32 regardless of input
dtype (MXU ``preferred_element_type``).

Backward is a custom VJP: one Pallas kernel recomputes the probability block
and produces dQ, and accumulates dK/dV across query blocks using the
sequential-grid revisiting pattern (output block constant in the q-block
grid dim).

Supports key-padding masks (BERT) and causal masking (decoder-style).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "mha_reference"]

NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def mha_reference(q, k, v, key_mask=None, causal=False, sm_scale=None):
    """Pure-jnp reference (the role ``dot_based_interact_ops_test.py`` plays
    for the reference's custom kernel — golden source for numeric tests)."""
    *_, sq, d = q.shape
    sk = k.shape[-2]
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(d)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    s = s * scale
    if key_mask is not None:
        s = jnp.where(key_mask[:, None, None, :].astype(bool), s, NEG_INF)
    if causal:
        idx_q = jnp.arange(sq)[:, None]
        idx_k = jnp.arange(sk)[None, :]
        s = jnp.where(idx_q >= idx_k, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, l_ref, *, scale, causal, block_q):
    qi = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32)  # (BQ, D)
    k = k_ref[0, 0].astype(jnp.float32)  # (S, D)
    v = v_ref[0, 0].astype(jnp.float32)  # (S, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale
    if mask_ref is not None:
        key_ok = mask_ref[0] != 0  # (1, S), broadcasts over rows
        s = jnp.where(key_ok, s, NEG_INF)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(row >= col, s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)
    # logsumexp residual for backward; (BQ, 1) lane-1 layout for TPU tiling
    l_ref[0, 0] = m + jnp.log(l)


def _fwd(q, k, v, key_mask, causal, scale, block_q, bshd=False, block_k=None):
    if block_k is not None:
        if bshd:
            # long-context regime is compute-bound; the one-time transpose
            # is negligible next to O(S^2) attention work
            tq, tk, tv = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
            out, lse = _fwd_kblk(tq, tk, tv, key_mask, causal, scale,
                                 block_q, block_k)
            return out.transpose(0, 2, 1, 3), lse
        return _fwd_kblk(q, k, v, key_mask, causal, scale, block_q, block_k)
    if bshd:
        return _fwd_bshd(q, k, v, key_mask, causal, scale, block_q)
    b, h, sq, d = q.shape
    sk = k.shape[2]
    bq = min(block_q, sq)
    grid = (b, h, pl.cdiv(sq, bq))

    qspec = pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, 1, sk, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM)

    in_specs = [qspec, kspec, kspec]
    args = [q, k, v]
    if key_mask is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, sk), lambda bi, hi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(key_mask.astype(jnp.int32)[:, None, :])
        kernel = functools.partial(
            _fwd_kernel, scale=scale, causal=causal, block_q=bq
        )
    else:
        def kernel(q_ref, k_ref, v_ref, o_ref, l_ref):
            _fwd_kernel(q_ref, k_ref, v_ref, None, o_ref, l_ref,
                        scale=scale, causal=causal, block_q=bq)

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            qspec,
            pl.BlockSpec((1, 1, bq, 1), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sq, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(*args)
    return out, lse


# ---------------------------------------------------------------------------
# K-blocked forward: online softmax over key blocks (long-context path)
# ---------------------------------------------------------------------------
#
# The single-block kernels above stream the WHOLE key range into VMEM per
# (batch, head) — ideal at BERT lengths, but it caps sequence length at a
# few K tokens (K/V + the (BQ, S) score block must fit VMEM). With
# ``block_k`` set, the grid gains an innermost key-block dimension and the
# kernel keeps flash attention's running (m, l, acc) statistics in VMEM
# scratch across key blocks — memory per program becomes O(BQ*BK + BQ*D)
# independent of S. This is the canonical TPU flash decomposition: the
# sequential innermost grid dimension makes scratch carry legal.


def _fwd_kernel_kblk(q_ref, k_ref, v_ref, mask_ref, o_ref, l_ref,
                     m_scr, l_scr, acc_scr, *, scale, causal, block_q,
                     block_k):
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0].astype(jnp.float32)  # (BQ, D)
    k = k_ref[0, 0].astype(jnp.float32)  # (BK, D)
    v = v_ref[0, 0].astype(jnp.float32)  # (BK, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if mask_ref is not None:
        s = jnp.where(mask_ref[0] != 0, s, NEG_INF)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        s = jnp.where(row >= col, s, NEG_INF)

    m_prev = m_scr[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m_prev - m_new)
    l_scr[...] = l_scr[...] * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[...] = acc_scr[...] * corr + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_scr[...] = m_new

    @pl.when(ki == nk - 1)
    def _():
        l = l_scr[...]
        o_ref[0, 0] = (acc_scr[...] / l).astype(o_ref.dtype)
        l_ref[0, 0] = m_scr[...] + jnp.log(l)


def _fwd_kblk(q, k, v, key_mask, causal, scale, block_q, block_k):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    bq = min(block_q, sq)
    bk = min(block_k, sk)
    grid = (b, h, pl.cdiv(sq, bq), pl.cdiv(sk, bk))

    qspec = pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, 1, bk, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                         memory_space=pltpu.VMEM)

    in_specs = [qspec, kspec, kspec]
    args = [q, k, v]
    if key_mask is not None:
        in_specs.append(
            pl.BlockSpec((1, bk), lambda bi, hi, qi, ki: (bi, ki),
                         memory_space=pltpu.VMEM)
        )
        args.append(key_mask.astype(jnp.int32))
        kernel = functools.partial(_fwd_kernel_kblk, scale=scale,
                                   causal=causal, block_q=bq, block_k=bk)
    else:
        def kernel(q_ref, k_ref, v_ref, o_ref, l_ref, m_scr, l_scr, acc_scr):
            _fwd_kernel_kblk(q_ref, k_ref, v_ref, None, o_ref, l_ref,
                             m_scr, l_scr, acc_scr, scale=scale,
                             causal=causal, block_q=bq, block_k=bk)

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            qspec,
            pl.BlockSpec((1, 1, bq, 1), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sq, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        interpret=_interpret(),
    )(*args)
    return out, lse


def _bwd_kernel_kblk_dq(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, do_ref,
                        dq_ref, dq_scr, *, scale, causal, block_q, block_k):
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    o = o_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if mask_ref is not None:
        s = jnp.where(mask_ref[0] != 0, s, NEG_INF)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        s = jnp.where(row >= col, s, NEG_INF)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    delta = jnp.sum(do * o, axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale
    dq_scr[...] += jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == nk - 1)
    def _():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _bwd_kernel_kblk_dkv(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
                         do_ref, dk_ref, dv_ref, dk_scr, dv_scr, *,
                         scale, causal, block_q, block_k):
    ki = pl.program_id(2)
    qi = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(qi == 0)
    def _():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    o = o_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if mask_ref is not None:
        s = jnp.where(mask_ref[0] != 0, s, NEG_INF)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        s = jnp.where(row >= col, s, NEG_INF)
    p = jnp.exp(s - lse)  # (BQ, BK)
    dv_scr[...] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    delta = jnp.sum(do * o, axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale
    dk_scr[...] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(qi == nq - 1)
    def _():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_kblk(causal, scale, block_q, block_k, res, g):
    q, k, v, key_mask, out, lse = res
    b, h, sq, d = q.shape
    sk = k.shape[2]
    bq = min(block_q, sq)
    bk = min(block_k, sk)

    qspec4 = pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                          memory_space=pltpu.VMEM)
    kspec4 = pl.BlockSpec((1, 1, bk, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0),
                          memory_space=pltpu.VMEM)
    lspec4 = pl.BlockSpec((1, 1, bq, 1), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                          memory_space=pltpu.VMEM)
    mspec4 = pl.BlockSpec((1, bk), lambda bi, hi, qi, ki: (bi, ki),
                          memory_space=pltpu.VMEM)
    has_mask = key_mask is not None
    mask_arg = [key_mask.astype(jnp.int32)] if has_mask else []

    # dq: grid (b, h, qi, ki) — ki innermost accumulates into scratch
    in_specs = [qspec4, kspec4, kspec4] + ([mspec4] if has_mask else []) \
        + [qspec4, lspec4, qspec4]
    if has_mask:
        dq_kernel = functools.partial(_bwd_kernel_kblk_dq, scale=scale,
                                      causal=causal, block_q=bq, block_k=bk)
    else:
        def dq_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref,
                      dq_ref, dq_scr):
            _bwd_kernel_kblk_dq(q_ref, k_ref, v_ref, None, o_ref, lse_ref,
                                do_ref, dq_ref, dq_scr, scale=scale,
                                causal=causal, block_q=bq, block_k=bk)
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b, h, pl.cdiv(sq, bq), pl.cdiv(sk, bk)),
        in_specs=in_specs,
        out_specs=qspec4,
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        interpret=_interpret(),
    )(q, k, v, *mask_arg, out, lse, g)

    # dk/dv: grid (b, h, ki, qi) — qi innermost accumulates into scratch
    qspec_t = pl.BlockSpec((1, 1, bq, d), lambda bi, hi, ki, qi: (bi, hi, qi, 0),
                           memory_space=pltpu.VMEM)
    kspec_t = pl.BlockSpec((1, 1, bk, d), lambda bi, hi, ki, qi: (bi, hi, ki, 0),
                           memory_space=pltpu.VMEM)
    lspec_t = pl.BlockSpec((1, 1, bq, 1), lambda bi, hi, ki, qi: (bi, hi, qi, 0),
                           memory_space=pltpu.VMEM)
    mspec_t = pl.BlockSpec((1, bk), lambda bi, hi, ki, qi: (bi, ki),
                           memory_space=pltpu.VMEM)
    in_specs2 = [qspec_t, kspec_t, kspec_t] + ([mspec_t] if has_mask else []) \
        + [qspec_t, lspec_t, qspec_t]
    if has_mask:
        dkv_kernel = functools.partial(_bwd_kernel_kblk_dkv, scale=scale,
                                       causal=causal, block_q=bq, block_k=bk)
    else:
        def dkv_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref,
                       dk_ref, dv_ref, dk_scr, dv_scr):
            _bwd_kernel_kblk_dkv(q_ref, k_ref, v_ref, None, o_ref, lse_ref,
                                 do_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                                 scale=scale, causal=causal, block_q=bq,
                                 block_k=bk)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b, h, pl.cdiv(sk, bk), pl.cdiv(sq, bq)),
        in_specs=in_specs2,
        out_specs=[kspec_t, kspec_t],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sk, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, sk, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        interpret=_interpret(),
    )(q, k, v, *mask_arg, out, lse, g)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), None


# ---------------------------------------------------------------------------
# bshd layout: (B, S, H, D) without transposes
# ---------------------------------------------------------------------------
#
# TPU block shapes must have their last two dims divisible by (8, 128) or
# equal to the array dims, so a (1, bq, 1, d) block over (B, S, H, D) cannot
# slice a single 64-wide head. Instead the array is viewed as (B, S, H*D)
# — a free reshape — and each grid program owns ``hpb = 128 // d`` adjacent
# heads (128 lanes), computing attention per head on in-register column
# slices. This keeps QKV/context in the projection-natural layout end to
# end: no (B,H,S,D) relayout ever hits HBM.


def _heads_per_block(d: int) -> int:
    if d % 128 == 0:
        return 1
    if 128 % d == 0:
        return 128 // d
    return 0  # unsupported head_dim for the folded layout


def _fwd_kernel_bshd(q_ref, k_ref, v_ref, mask_ref, o_ref, l_ref, *,
                     scale, causal, block_q, d, hpb):
    qi = pl.program_id(2)
    outs = []
    for j in range(hpb):
        q = q_ref[0, :, j * d:(j + 1) * d].astype(jnp.float32)  # (BQ, D)
        k = k_ref[0, :, j * d:(j + 1) * d].astype(jnp.float32)  # (S, D)
        v = v_ref[0, :, j * d:(j + 1) * d].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if mask_ref is not None:
            s = jnp.where(mask_ref[0] != 0, s, NEG_INF)
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(row >= col, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        outs.append(o / l)
        l_ref[0, j] = m + jnp.log(l)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _fwd_bshd(q, k, v, key_mask, causal, scale, block_q):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    hpb = _heads_per_block(d)
    if hpb == 0 or h % max(hpb, 1):
        # fall back through the transpose path for odd head_dims
        tq, tk, tv = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
        out, lse = _fwd(tq, tk, tv, key_mask, causal, scale, block_q)
        return out.transpose(0, 2, 1, 3), lse
    bq = min(block_q, sq)
    grid = (b, h // hpb, pl.cdiv(sq, bq))
    hd = hpb * d

    q3 = q.reshape(b, sq, h * d)
    k3 = k.reshape(b, sk, h * d)
    v3 = v.reshape(b, sk, h * d)
    qspec = pl.BlockSpec((1, bq, hd), lambda bi, hi, qi: (bi, qi, hi),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, sk, hd), lambda bi, hi, qi: (bi, 0, hi),
                         memory_space=pltpu.VMEM)

    in_specs = [qspec, kspec, kspec]
    args = [q3, k3, v3]
    if key_mask is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, sk), lambda bi, hi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(key_mask.astype(jnp.int32)[:, None, :])
        kernel = functools.partial(
            _fwd_kernel_bshd, scale=scale, causal=causal, block_q=bq,
            d=d, hpb=hpb,
        )
    else:
        def kernel(q_ref, k_ref, v_ref, o_ref, l_ref):
            _fwd_kernel_bshd(q_ref, k_ref, v_ref, None, o_ref, l_ref,
                             scale=scale, causal=causal, block_q=bq,
                             d=d, hpb=hpb)

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            qspec,
            pl.BlockSpec((1, hpb, bq, 1), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq, h * d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sq, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(*args)
    return out.reshape(b, sq, h, d), lse


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(
    q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, do_ref,
    dq_ref, dk_ref, dv_ref, *, scale, causal, block_q,
):
    qi = pl.program_id(2)

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    o = o_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0]  # (BQ, 1)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if mask_ref is not None:
        key_ok = mask_ref[0] != 0
        s = jnp.where(key_ok, s, NEG_INF)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(row >= col, s, NEG_INF)
    p = jnp.exp(s - lse)  # (BQ, S)

    dv = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (S, D)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, S)
    delta = jnp.sum(do * o, axis=-1, keepdims=True)  # (BQ, 1)
    ds = p * (dp - delta) * scale
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (S, D)

    dq_ref[0, 0] = dq.astype(dq_ref.dtype)

    # dk/dv accumulate across q blocks: output block fixed in qi, sequential grid
    @pl.when(qi == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    dk_ref[0, 0] += dk.astype(dk_ref.dtype)
    dv_ref[0, 0] += dv.astype(dv_ref.dtype)


def _bwd_kernel_bshd(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, *, scale, causal, block_q, d, hpb):
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dqs = []
    for j in range(hpb):
        q = q_ref[0, :, j * d:(j + 1) * d].astype(jnp.float32)
        k = k_ref[0, :, j * d:(j + 1) * d].astype(jnp.float32)
        v = v_ref[0, :, j * d:(j + 1) * d].astype(jnp.float32)
        o = o_ref[0, :, j * d:(j + 1) * d].astype(jnp.float32)
        do = do_ref[0, :, j * d:(j + 1) * d].astype(jnp.float32)
        lse = lse_ref[0, j]  # (BQ, 1)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if mask_ref is not None:
            s = jnp.where(mask_ref[0] != 0, s, NEG_INF)
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(row >= col, s, NEG_INF)
        p = jnp.exp(s - lse)  # (BQ, S)

        dv = jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        delta = jnp.sum(do * o, axis=-1, keepdims=True)
        ds = p * (dp - delta) * scale
        dqs.append(jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ))
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk_ref[0, :, j * d:(j + 1) * d] += dk.astype(dk_ref.dtype)
        dv_ref[0, :, j * d:(j + 1) * d] += dv.astype(dv_ref.dtype)
    dq_ref[0] = jnp.concatenate(dqs, axis=-1).astype(dq_ref.dtype)


def _bwd_bshd(causal, scale, block_q, res, g):
    q, k, v, key_mask, out, lse = res
    b, sq, h, d = q.shape
    sk = k.shape[1]
    hpb = _heads_per_block(d)
    if hpb == 0 or h % max(hpb, 1):
        tres = (q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), key_mask,
                out.transpose(0, 2, 1, 3), lse)
        dq, dk, dv, _ = _bwd(causal, scale, block_q, False, None, tres,
                             g.transpose(0, 2, 1, 3))
        return (dq.transpose(0, 2, 1, 3), dk.transpose(0, 2, 1, 3),
                dv.transpose(0, 2, 1, 3), None)
    bq = min(block_q, sq)
    grid = (b, h // hpb, pl.cdiv(sq, bq))
    hd = hpb * d

    qspec = pl.BlockSpec((1, bq, hd), lambda bi, hi, qi: (bi, qi, hi),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, sk, hd), lambda bi, hi, qi: (bi, 0, hi),
                         memory_space=pltpu.VMEM)

    in_specs = [qspec, kspec, kspec]
    args = [q.reshape(b, sq, h * d), k.reshape(b, sk, h * d),
            v.reshape(b, sk, h * d)]
    has_mask = key_mask is not None
    if has_mask:
        in_specs.append(
            pl.BlockSpec((1, 1, sk), lambda bi, hi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(key_mask.astype(jnp.int32)[:, None, :])
    in_specs += [
        qspec,
        pl.BlockSpec((1, hpb, bq, 1), lambda bi, hi, qi: (bi, hi, qi, 0),
                     memory_space=pltpu.VMEM),
        qspec,
    ]
    args += [out.reshape(b, sq, h * d), lse, g.reshape(b, sq, h * d)]

    if has_mask:
        kernel = functools.partial(_bwd_kernel_bshd, scale=scale, causal=causal,
                                   block_q=bq, d=d, hpb=hpb)
    else:
        def kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref,
                   dq_ref, dk_ref, dv_ref):
            _bwd_kernel_bshd(q_ref, k_ref, v_ref, None, o_ref, lse_ref, do_ref,
                             dq_ref, dk_ref, dv_ref, scale=scale, causal=causal,
                             block_q=bq, d=d, hpb=hpb)

    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[qspec, kspec, kspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq, h * d), q.dtype),
            jax.ShapeDtypeStruct((b, sk, h * d), jnp.float32),
            jax.ShapeDtypeStruct((b, sk, h * d), jnp.float32),
        ],
        interpret=_interpret(),
    )(*args)
    return (dq.reshape(b, sq, h, d),
            dk.reshape(b, sk, h, d).astype(k.dtype),
            dv.reshape(b, sk, h, d).astype(v.dtype), None)


def _bwd(causal, scale, block_q, bshd, block_k, res, g):
    if block_k is not None:
        if bshd:
            q, k, v, key_mask, out, lse = res
            tres = (q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                    v.transpose(0, 2, 1, 3), key_mask,
                    out.transpose(0, 2, 1, 3), lse)
            dq, dk, dv, _ = _bwd_kblk(causal, scale, block_q, block_k, tres,
                                      g.transpose(0, 2, 1, 3))
            return (dq.transpose(0, 2, 1, 3), dk.transpose(0, 2, 1, 3),
                    dv.transpose(0, 2, 1, 3), None)
        return _bwd_kblk(causal, scale, block_q, block_k, res, g)
    if bshd:
        return _bwd_bshd(causal, scale, block_q, res, g)
    q, k, v, key_mask, out, lse = res
    b, h, sq, d = q.shape
    sk = k.shape[2]
    bq = min(block_q, sq)
    grid = (b, h, pl.cdiv(sq, bq))

    def qspec():
        return pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                            memory_space=pltpu.VMEM)

    def kspec():
        return pl.BlockSpec((1, 1, sk, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [qspec(), kspec(), kspec()]
    args = [q, k, v]
    has_mask = key_mask is not None
    if has_mask:
        in_specs.append(
            pl.BlockSpec((1, 1, sk), lambda bi, hi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(key_mask.astype(jnp.int32)[:, None, :])
    in_specs += [
        qspec(),
        pl.BlockSpec((1, 1, bq, 1), lambda bi, hi, qi: (bi, hi, qi, 0),
                     memory_space=pltpu.VMEM),
        qspec(),
    ]
    args += [out, lse, g]

    if has_mask:
        kernel = functools.partial(_bwd_kernel, scale=scale, causal=causal,
                                   block_q=bq)
    else:
        def kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref, dq_ref, dk_ref, dv_ref):
            _bwd_kernel(q_ref, k_ref, v_ref, None, o_ref, lse_ref, do_ref,
                        dq_ref, dk_ref, dv_ref, scale=scale, causal=causal,
                        block_q=bq)

    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[qspec(), kspec(), kspec()],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sk, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, sk, d), jnp.float32),
        ],
        interpret=_interpret(),
    )(*args)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), None


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash(q, k, v, key_mask, causal, scale, block_q, bshd, block_k):
    out, _ = _fwd(q, k, v, key_mask, causal, scale, block_q, bshd, block_k)
    return out


def _flash_fwd(q, k, v, key_mask, causal, scale, block_q, bshd, block_k):
    out, lse = _fwd(q, k, v, key_mask, causal, scale, block_q, bshd, block_k)
    return out, (q, k, v, key_mask, out, lse)


def _flash_bwd(causal, scale, block_q, bshd, block_k, res, g):
    return _bwd(causal, scale, block_q, bshd, block_k, res, g)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: jax.Array | None = None,
    *,
    causal: bool = False,
    sm_scale: float | None = None,
    block_q: int = 512,
    block_k: int | None = None,
    layout: str = "bhsd",
) -> jax.Array:
    """Fused MHA. key_mask: (batch, seq) with 1 = attend.

    ``layout="bhsd"``: q,k,v are (batch, heads, seq, head_dim).
    ``layout="bshd"``: q,k,v are (batch, seq, heads, head_dim) — the natural
    output of a QKV projection. The kernel indexes the heads axis in place,
    which removes the two (B,S,H,D)<->(B,H,S,D) HBM relayouts per attention
    call (for BERT-Large bs64 s128 that is ~9 GB/step of pure transpose
    traffic). Output matches the input layout.

    ``block_k=None`` (default) streams the whole key range per program —
    fastest at BERT lengths. Setting ``block_k`` switches to the online-
    softmax K-blocked kernels whose VMEM footprint is independent of S;
    required for long-context (multi-K-token) sequences.
    """
    d = q.shape[-1]
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(d)
    if layout not in ("bhsd", "bshd"):
        raise ValueError(f"unknown layout {layout!r}")
    return _flash(q, k, v, key_mask, causal, scale, block_q,
                  layout == "bshd", block_k)
