"""Fused (Pallas) LAMB vs the XLA per-tensor LAMB — same math, same result."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deeplearningexamples_tpu.ops.fused_lamb import fused_lamb, make_layout, pack, unpack
from deeplearningexamples_tpu.ops.lamb import lamb


def make_tree(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "dense": {"kernel": jnp.asarray(rng.normal(size=(64, 128)), jnp.float32),
                  "bias": jnp.asarray(rng.normal(size=(128,)), jnp.float32)},
        "emb": jnp.asarray(rng.normal(size=(100, 32)), jnp.float32),
    }


def test_pack_unpack_roundtrip():
    params = make_tree()
    layout = make_layout(params)
    flat = pack(layout, params)
    assert flat.shape[0] % (8 * 1024) == 0
    back = unpack(layout, flat, params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        params, back,
    )


def test_fused_matches_xla_lamb_multi_step():
    params = make_tree()
    grads = make_tree(seed=1)
    for clip in (None, 1.0):
        tx_ref = lamb(0.01, weight_decay=0.01, grad_clip_norm=clip)
        tx_fus = fused_lamb(0.01, weight_decay=0.01, grad_clip_norm=clip)
        s_ref = tx_ref.init(params)
        s_fus = tx_fus.init(params)
        p_ref = p_fus = params
        for step in range(3):
            g = jax.tree.map(lambda x: x * (1.0 + step), grads)
            u_ref, s_ref = tx_ref.update(g, s_ref, p_ref)
            p_ref = optax.apply_updates(p_ref, u_ref)
            u_fus, s_fus = tx_fus.update(g, s_fus, p_fus)
            p_fus = optax.apply_updates(p_fus, u_fus)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
            ),
            p_ref, p_fus,
        )


def test_fused_lamb_with_mask():
    params = make_tree()
    mask = {"dense": {"kernel": True, "bias": False}, "emb": False}
    tx = fused_lamb(0.01, weight_decay=0.5, mask=mask, grad_clip_norm=None)
    tx_ref = lamb(0.01, weight_decay=0.5, mask=None, grad_clip_norm=None)
    # reference path: optax lamb applies wd everywhere; emulate masked wd by
    # comparing against fused with wd=0 on masked leaves via the mask arg —
    # check only that masked leaves differ from unmasked-wd behavior
    s = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    u, _ = tx.update(g, s, params)
    tx_nowd = fused_lamb(0.01, weight_decay=0.0, grad_clip_norm=None)
    u_nowd, _ = tx_nowd.update(g, tx_nowd.init(params), params)
    # bias (masked out) matches the no-wd update; kernel does not
    np.testing.assert_allclose(
        np.asarray(u["dense"]["bias"]), np.asarray(u_nowd["dense"]["bias"]),
        rtol=1e-6,
    )
    assert not np.allclose(
        np.asarray(u["dense"]["kernel"]), np.asarray(u_nowd["dense"]["kernel"])
    )
