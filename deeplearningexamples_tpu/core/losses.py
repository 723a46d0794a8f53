"""Shared losses and regularizers.

Reference: ``LabelSmoothing`` (``image_classification/smoothing.py:18``),
``MixUpWrapper``/``NLLMultiLabelSmooth`` (``mixup.py:31,48``). Mixup here is
a pure function applied inside the jitted step (keyed by the step PRNG)
rather than a loader wrapper — no host-side RNG, fully fused by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

__all__ = ["cross_entropy", "smoothed_cross_entropy", "mixup", "top_k_accuracy"]


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE. Integer labels (B,) or soft labels (B, C)."""
    if labels.ndim == logits.ndim:
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.sum(labels * logp, axis=-1))
    return jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), labels
        )
    )


def smoothed_cross_entropy(
    logits: jax.Array, labels: jax.Array, smoothing: float = 0.1
) -> jax.Array:
    """Label-smoothed CE, exact semantics of reference ``smoothing.py:18-41``
    (confidence on target, uniform ``smoothing/(C-1)`` elsewhere); accepts
    soft labels too (mixup path, ``NLLMultiLabelSmooth`` ``mixup.py:48``)."""
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    if labels.ndim == logits.ndim:
        soft = labels
    else:
        soft = jax.nn.one_hot(labels, num_classes)
    off = smoothing / (num_classes - 1)
    soft = soft * (1.0 - smoothing - off) + off
    return -jnp.mean(jnp.sum(soft * logp, axis=-1))


def mixup(
    rng: jax.Array, alpha: float, images: jax.Array, one_hot_labels: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Batch mixup (reference ``mixup.py:17-44``): one Beta(alpha, alpha) draw
    per batch, mixing against the reversed batch."""
    lam = jax.random.beta(rng, alpha, alpha)
    images = lam * images + (1.0 - lam) * images[::-1]
    labels = lam * one_hot_labels + (1.0 - lam) * one_hot_labels[::-1]
    return images, labels


def top_k_accuracy(logits: jax.Array, labels: jax.Array, ks=(1, 5)) -> dict:
    """top-1/top-5 (reference ``utils.py:101-114``). Integer labels."""
    if labels.ndim == 2:
        labels = jnp.argmax(labels, axis=-1)
    out = {}
    order = jnp.argsort(logits, axis=-1)[:, ::-1]
    for k in ks:
        hit = jnp.any(order[:, :k] == labels[:, None], axis=-1)
        out[f"top{k}"] = jnp.mean(hit.astype(jnp.float32))
    return out
