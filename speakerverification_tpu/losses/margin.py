"""Classification-margin losses: Softmax, AM-softmax, AAM-softmax (ArcFace).

Behavioral parity targets:
* ``Softmax``   — src/losses/Softmax.py:14-30 (linear + CE)
* ``AmSoftmax`` — src/losses/AmSoftmax.py:15-61 (CosFace additive margin)
* ``AAmSoftmax``— src/losses/AAmSoftmax.py:16-69 (ArcFace cos(θ+m), with
  the monotonicity fallback ``cosine - mm`` and optional easy margin)
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from speakerverification_tpu.losses.common import (
    cross_entropy,
    flatten_grouped,
    l2_normalize,
    top1_percent,
)
from speakerverification_tpu.registry import LOSSES

__all__ = ["Softmax", "AmSoftmax", "AAmSoftmax"]


@LOSSES.register("Softmax")
class Softmax(nn.Module):
    nOut: int = 192
    nClasses: int = 5994
    test_normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, label: jax.Array):
        x, label = flatten_grouped(x, label)
        logits = nn.Dense(self.nClasses)(x)
        return cross_entropy(logits, label), top1_percent(logits, label)


@LOSSES.register("AmSoftmax")
class AmSoftmax(nn.Module):
    """CosFace: ``s * (cosθ - m)`` at the target class."""
    nOut: int = 192
    nClasses: int = 5994
    margin: float = 0.1
    scale: float = 30.0
    test_normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, label: jax.Array):
        x, label = flatten_grouped(x, label)
        # Reference stores W as [nOut, nClasses] with column-wise norm
        # (src/losses/AmSoftmax.py:24-47).
        w = self.param("W", nn.initializers.xavier_normal(),
                       (self.nOut, self.nClasses))
        costh = l2_normalize(x, -1) @ l2_normalize(w, 0)
        one_hot = jax.nn.one_hot(label, self.nClasses, dtype=costh.dtype)
        logits = self.scale * (costh - self.margin * one_hot)
        return cross_entropy(logits, label), top1_percent(logits, label)


@LOSSES.register("AAmSoftmax")
class AAmSoftmax(nn.Module):
    """ArcFace: ``s * cos(θ + m)`` at the target class."""
    nOut: int = 192
    nClasses: int = 5994
    margin: float = 0.2
    scale: float = 30.0
    easy_margin: bool = False
    test_normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, label: jax.Array):
        x, label = flatten_grouped(x, label)
        w = self.param("weight", nn.initializers.xavier_normal(),
                       (self.nClasses, self.nOut))
        cosine = l2_normalize(x, -1) @ l2_normalize(w, -1).T

        cos_m = math.cos(self.margin)
        sin_m = math.sin(self.margin)
        th = math.cos(math.pi - self.margin)
        mm = math.sin(math.pi - self.margin) * self.margin

        sine = jnp.sqrt(jnp.clip(1.0 - cosine * cosine, 0.0, 1.0))
        phi = cosine * cos_m - sine * sin_m
        if self.easy_margin:
            phi = jnp.where(cosine > 0, phi, cosine)
        else:
            # keep cos(θ+m) monotonic for θ ∈ [0, π]
            # (src/losses/AAmSoftmax.py:35-37,58-60)
            phi = jnp.where(cosine - th > 0, phi, cosine - mm)

        one_hot = jax.nn.one_hot(label, self.nClasses, dtype=cosine.dtype)
        logits = self.scale * (one_hot * phi + (1.0 - one_hot) * cosine)
        return cross_entropy(logits, label), top1_percent(logits, label)
