"""Mask-regenerating dropout (residual-free backward).

flax's ``nn.Dropout`` leaves its keep mask as an autodiff residual; at
BERT-Large s512 bs16 that is 48 masks x 8.4M elements of pure HBM traffic
per step (~3.5 ms measured on v5e: encoder fwd+bwd 124.8 ms with flax
dropout vs 121.3 with this op). XLA's ``RngBitGenerator`` is a pure
function of (key, shape), so the backward can redraw the identical bits
instead — the only residual is the key itself. Same trick as the flash
kernel's in-VMEM dropout (``ops/flash_attention.py``), applied at the
XLA level for the hidden-state dropouts every transformer recipe uses
(reference ``BERT/modeling.py`` Dropout modules).

Semantics are identical to standard inverted dropout (iid keep prob
``1-rate``, kept values scaled by ``1/(1-rate)``); only the bit stream
differs from flax's bernoulli draw.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["RegenDropout", "regen_dropout"]


def _keep_scale(key_data, shape, rate, impl):
    key = jax.random.wrap_key_data(key_data, impl=impl)
    bits = jax.random.bits(key, shape, jnp.uint32)
    thr = np.uint32(min(rate * 4294967296.0, 4294967295.0))
    return jnp.where(bits >= thr, np.float32(1.0 / (1.0 - rate)),
                     np.float32(0.0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def regen_dropout(x, key_data, rate, impl):
    """``x`` scaled-masked with keep prob ``1-rate``; ``key_data`` is
    ``jax.random.key_data(key)`` and ``impl`` its ``str(key_impl)``."""
    return x * _keep_scale(key_data, x.shape, rate, impl).astype(x.dtype)


def _regen_fwd(x, key_data, rate, impl):
    return regen_dropout(x, key_data, rate, impl), (key_data,)


def _regen_bwd(rate, impl, res, g):
    (key_data,) = res
    dx = g * _keep_scale(key_data, g.shape, rate, impl).astype(g.dtype)
    return dx, np.zeros(key_data.shape, dtype=jax.dtypes.float0)


regen_dropout.defvjp(_regen_fwd, _regen_bwd)


class RegenDropout(nn.Module):
    """Drop-in replacement for ``nn.Dropout`` (rng collection "dropout")
    whose backward regenerates the keep mask from the PRNG key."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if deterministic or self.rate == 0.0:
            return x
        key = self.make_rng("dropout")
        impl = str(jax.random.key_impl(key))
        return regen_dropout(x, jax.random.key_data(key), self.rate, impl)
