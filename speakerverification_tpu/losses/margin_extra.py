"""Additional margin losses: ARmSoftmax, AngularPenaltySMLoss.

Parity targets:
* ``ARmSoftmax`` — src/losses/ARmSoftmax.py:14-61: AM-softmax logits,
  then subtract each row's target logit and clamp negatives to zero
  before cross-entropy (the "relative" margin trick).
* ``AngularPenaltySMLoss`` — src/losses/AngularPenaltySMLoss.py:6-75:
  arcface / sphereface / cosface numerators over a bias-free normalized
  linear layer. (The reference's module has broken defaults —
  ``s``/``m`` referenced before assignment when using non-default
  margins, and a dead ``costh_m`` tail — we implement the intended
  math.)
"""

from __future__ import annotations

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

__all__ = ["ARmSoftmax", "AngularPenaltySMLoss"]


@LOSSES.register("ARmSoftmax")
class ARmSoftmax(nn.Module):
    nOut: int = 192
    nClasses: int = 5994
    margin: float = 0.1
    scale: float = 30.0
    test_normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, label: jax.Array):
        x, label = flatten_grouped(x, label)
        w = self.param("W", nn.initializers.xavier_normal(),
                       (self.nOut, self.nClasses))
        costh = l2_normalize(x, -1) @ l2_normalize(w, 0)
        one_hot = jax.nn.one_hot(label, self.nClasses, dtype=costh.dtype)
        logits = self.scale * (costh - self.margin * one_hot)
        # subtract own-class logit, clamp negatives to zero
        # (src/losses/ARmSoftmax.py:54-57)
        own = jnp.take_along_axis(logits, label[:, None], axis=1)
        reduced = logits - own
        relu_logits = jnp.where(reduced < 0.0, 0.0, logits)
        return (cross_entropy(relu_logits, label),
                top1_percent(relu_logits, label))


@LOSSES.register("AngularPenaltySMLoss")
class AngularPenaltySMLoss(nn.Module):
    nOut: int = 192
    nClasses: int = 5994
    loss_type: str = "arcface"      # 'arcface' | 'sphereface' | 'cosface'
    margin: float | None = None
    scale: float | None = None
    eps: float = 1e-7
    test_normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, label: jax.Array):
        x, label = flatten_grouped(x, label)
        defaults = {"arcface": (64.0, 0.5), "sphereface": (64.0, 1.35),
                    "cosface": (30.0, 0.4)}
        s0, m0 = defaults[self.loss_type]
        s = self.scale if self.scale is not None else s0
        m = self.margin if self.margin is not None else m0

        w = self.param("W", nn.initializers.lecun_normal(),
                       (self.nOut, self.nClasses))
        wf = l2_normalize(x, -1) @ l2_normalize(w, 0)
        own = jnp.take_along_axis(wf, label[:, None], axis=1)[:, 0]
        own = jnp.clip(own, -1.0 + self.eps, 1.0 - self.eps)

        if self.loss_type == "cosface":
            numerator = s * (own - m)
        elif self.loss_type == "arcface":
            numerator = s * jnp.cos(jnp.arccos(own) + m)
        else:                                            # sphereface
            numerator = s * jnp.cos(m * jnp.arccos(own))

        one_hot = jax.nn.one_hot(label, self.nClasses, dtype=wf.dtype)
        excl = jnp.where(one_hot > 0, -jnp.inf, s * wf)
        denom = jnp.exp(numerator) + jnp.sum(
            jnp.where(jnp.isfinite(excl), jnp.exp(excl), 0.0), axis=1)
        loss = -jnp.mean(numerator - jnp.log(denom))
        return loss, top1_percent(wf, label)
