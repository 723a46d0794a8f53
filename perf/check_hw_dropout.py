"""On-chip validation of the hardware-PRNG dropout path (TPU only).

The CPU test suite pins the stateless-hash path exactly
(tests/test_flash_attention.py); the compiled TPU path draws from the
per-core PRNG instead (ops/flash_attention.py::_dropout_scale_hw), so its
fwd/bwd mask consistency must be proven on the chip:

1. determinism: same seed -> bit-identical outputs across calls
2. seed sensitivity: different seed -> different mask
3. rate semantics: rate=0 == no dropout; keep fraction ~= 1-rate
4. fwd/bwd stream match: with v=I the kernel output IS the realized
   row-normalized dropped-probability matrix W = (P*drop)/l; dV for
   do=ones must then equal W^T @ ones computed from the forward's W.
   A bwd that reseeded differently would fail this exactly.

Usage: python perf/check_hw_dropout.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from deeplearningexamples_tpu.ops.flash_attention import flash_attention

B, H, S, D = 2, 4, 128, 128  # D == S so v=I recovers the weight matrix
RATE, SEED = 0.3, 1234


def main():
    assert jax.default_backend() != "cpu", "run on the TPU chip"
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    eye = jnp.broadcast_to(jnp.eye(S, dtype=jnp.float32), (B, H, S, D))

    f = jax.jit(lambda q, k, v, sd: flash_attention(
        q, k, v, dropout_rate=RATE, dropout_seed=sd, block_q=64))

    # 1. determinism
    w1 = np.asarray(f(q, k, eye, SEED))
    w2 = np.asarray(f(q, k, eye, SEED))
    assert (w1 == w2).all(), "same seed must be bit-identical"
    print("determinism OK")

    # 2. seed sensitivity
    w3 = np.asarray(f(q, k, eye, SEED + 1))
    assert not np.allclose(w1, w3), "different seed must change the mask"
    print("seed sensitivity OK")

    # 3. rate semantics
    base = np.asarray(jax.jit(lambda q, k, v: flash_attention(
        q, k, v, dropout_rate=0.0, dropout_seed=SEED, block_q=64))(q, k, eye))
    plain = np.asarray(jax.jit(lambda q, k, v: flash_attention(
        q, k, v, block_q=64))(q, k, eye))
    np.testing.assert_array_equal(base, plain)
    # w1 rows: kept entries are p/l/(1-rate); dropped are 0. Keep fraction:
    kept = float((w1 != 0).mean())
    assert abs(kept - (1 - RATE)) < 0.02, f"keep fraction {kept} vs {1-RATE}"
    print(f"rate semantics OK (keep fraction {kept:.3f})")

    # 4. fwd/bwd stream match via dV against the realized weights.
    # 4a. aggregate: dV for do=ones vs W^T @ 1 from the forward's W.
    #     Tolerance is fp32-via-MXU accumulation (~1e-5/entry over 128-sums);
    #     a mask mismatch would shift entries by their full weight instead.
    dv = jax.jit(jax.grad(lambda v: flash_attention(
        q, k, v, dropout_rate=RATE, dropout_seed=SEED, block_q=64
    ).astype(jnp.float32).sum()))(eye)
    dv_ref = np.swapaxes(w1, -1, -2).sum(axis=-1, keepdims=True)
    dv_ref = np.broadcast_to(dv_ref, dv.shape)
    np.testing.assert_allclose(np.asarray(dv), dv_ref, atol=5e-3, rtol=5e-3)
    print("fwd/bwd PRNG stream aggregate OK (dV ~= W^T @ 1)")

    # 4b. exact keep-pattern: one-hot do over q row q0 makes dV[s, :] equal
    #     W[q0, s] — recover the bwd kernel's realized row and require the
    #     EXACT same zero pattern as the forward (a single regenerated-mask
    #     flip anywhere in the row fails this).
    @jax.jit
    def dv_row(v, onehot_q):
        def loss(v):
            o = flash_attention(q, k, v, dropout_rate=RATE,
                                dropout_seed=SEED, block_q=64)
            return (o.astype(jnp.float32)
                    * onehot_q[None, None, :, None]).sum()
        return jax.grad(loss)(v)

    for q0 in (0, 17, 63, 64, 100, 127):  # rows straddling q-block edges
        oh = jnp.zeros((S,), jnp.float32).at[q0].set(1.0)
        row = np.asarray(dv_row(eye, oh))[..., 0]  # (B, H, S): W[q0, s]
        fwd_row = w1[:, :, q0, :]  # (B, H, S)
        assert ((row == 0) == (fwd_row == 0)).all(), \
            f"bwd keep-mask differs from fwd at q row {q0}"
        # values only to TPU default-precision dot tolerance (fp32 inputs
        # run the one-pass-bf16 MXU path, ~0.4% rel); the zero-pattern
        # equality above is the decisive mask check
        np.testing.assert_allclose(row, fwd_row, atol=2e-4, rtol=2e-2)
    print("fwd/bwd PRNG keep-pattern EXACT match OK (6 q rows)")

    # bshd layout path too (hpb folding, d=64)
    d2 = 64
    qb = jnp.asarray(rng.standard_normal((B, S, H, d2)), jnp.float32)
    kb = jnp.asarray(rng.standard_normal((B, S, H, d2)), jnp.float32)
    vb = jnp.asarray(rng.standard_normal((B, S, H, d2)), jnp.float32)
    fb = jax.jit(lambda q, k, v: flash_attention(
        q, k, v, layout="bshd", dropout_rate=RATE, dropout_seed=SEED,
        block_q=64))
    o1, o2 = np.asarray(fb(qb, kb, vb)), np.asarray(fb(qb, kb, vb))
    assert (o1 == o2).all()
    g = jax.jit(jax.grad(lambda q: flash_attention(
        q, kb, vb, layout="bshd", dropout_rate=RATE, dropout_seed=SEED,
        block_q=64).astype(jnp.float32).sum()))(qb)
    assert np.isfinite(np.asarray(g)).all()
    print("bshd hw-dropout OK")
    print("ALL HW DROPOUT CHECKS PASSED")


if __name__ == "__main__":
    main()
