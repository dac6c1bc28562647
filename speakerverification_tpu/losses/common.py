"""Shared helpers for loss heads."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

__all__ = ["l2_normalize", "cross_entropy", "top1_percent", "flatten_grouped"]


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    return x / jnp.clip(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def top1_percent(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Top-1 accuracy in percent (parity: src/utils.py ``accuracy`` topk=(1,))."""
    pred = jnp.argmax(logits, axis=-1)
    return 100.0 * jnp.mean((pred == labels).astype(jnp.float32))


def flatten_grouped(x: jax.Array, label: jax.Array):
    """``[B, nPerSpeaker, D] -> [B*nPerSpeaker, D]`` with repeated labels.

    Parity with ``label.repeat_interleave(x.shape[1])`` in the reference
    classification losses (e.g. src/losses/AAmSoftmax.py:41-44).
    """
    if x.ndim == 3:
        label = jnp.repeat(label, x.shape[1])
        x = x.reshape(-1, x.shape[-1])
    return x, label
