"""Metric-learning losses: angular prototypical, prototypical, GE2E.

Behavioral parity targets:
* ``AngularProto`` — src/losses/AngularProto.py:14-43 (anchor = mean of
  utterances 1:, positive = utterance 0, learnable scale w / bias b on the
  cosine matrix). The reference's ``torch.clamp(self.w, 1e-6)`` discards
  its result (a no-op); we apply the clamp for real — documented divergence.
* ``Prototypical`` — src/losses/Prototypical.py:16-41 (negative squared
  euclidean distance logits).
* ``GE2ELoss``     — src/losses/GE2ELoss.py:14-103 (softmax/contrast
  variants with leave-one-out centroids for the own-speaker column).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from speakerverification_tpu.losses.common import (
    cross_entropy,
    l2_normalize,
    top1_percent,
)
from speakerverification_tpu.registry import LOSSES

__all__ = ["AngularProto", "Prototypical", "GE2ELoss"]


@LOSSES.register("AngularProto")
class AngularProto(nn.Module):
    init_w: float = 10.0
    init_b: float = -5.0
    test_normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, label: jax.Array | None = None):
        assert x.ndim == 3 and x.shape[1] >= 2
        w = self.param("w", nn.initializers.constant(self.init_w), ())
        b = self.param("b", nn.initializers.constant(self.init_b), ())

        anchor = jnp.mean(x[:, 1:, :], axis=1)              # [B, D]
        positive = x[:, 0, :]                               # [B, D]
        cos = l2_normalize(positive) @ l2_normalize(anchor).T
        logits = cos * jnp.clip(w, 1e-6) + b

        labels = jnp.arange(x.shape[0])
        return cross_entropy(logits, labels), top1_percent(logits, labels)


@LOSSES.register("Prototypical")
class Prototypical(nn.Module):
    test_normalize: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, label: jax.Array | None = None):
        assert x.ndim == 3 and x.shape[1] >= 2
        anchor = jnp.mean(x[:, 1:, :], axis=1)
        positive = x[:, 0, :]
        # logits[i, j] = -||positive_i - anchor_j||^2
        d2 = (jnp.sum(positive**2, -1)[:, None]
              + jnp.sum(anchor**2, -1)[None, :]
              - 2.0 * positive @ anchor.T)
        logits = -jnp.maximum(d2, 0.0)
        labels = jnp.arange(x.shape[0])
        return cross_entropy(logits, labels), top1_percent(logits, labels)


@LOSSES.register("GE2ELoss")
class GE2ELoss(nn.Module):
    init_w: float = 10.0
    init_b: float = -5.0
    loss_method: str = "softmax"   # 'softmax' | 'contrast'
    test_normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, label: jax.Array | None = None):
        """``x``: [N speakers, M utterances, D]."""
        assert x.ndim == 3 and x.shape[1] >= 2
        N, M, D = x.shape
        w = self.param("w", nn.initializers.constant(self.init_w), ())
        b = self.param("b", nn.initializers.constant(self.init_b), ())

        centroids = jnp.mean(x, axis=1)                      # [N, D]
        # Leave-one-out centroid for the own-speaker column:
        # (sum - x_ji) / (M - 1)
        loo = (jnp.sum(x, axis=1, keepdims=True) - x) / (M - 1)  # [N, M, D]

        # cos[j, i, k] = cos(x[j, i], centroid_k), with k == j using the
        # leave-one-out centroid (reference eps=1e-6 in cosine_similarity).
        xn = x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-6)
        cn = centroids / jnp.clip(
            jnp.linalg.norm(centroids, axis=-1, keepdims=True), 1e-6)
        ln = loo / jnp.clip(jnp.linalg.norm(loo, axis=-1, keepdims=True), 1e-6)

        cos = jnp.einsum("jid,kd->jik", xn, cn)              # [N, M, N]
        own = jnp.einsum("jid,jid->ji", xn, ln)              # [N, M]
        eye = jnp.eye(N, dtype=bool)[:, None, :]             # [N, 1, N]
        cos = jnp.where(eye, own[:, :, None], cos)

        sim = cos * jnp.clip(w, 1e-6) + b

        if self.loss_method == "softmax":
            logp = jax.nn.log_softmax(sim, axis=2)
            loss = -jnp.sum(logp[jnp.arange(N)[:, None],
                                 jnp.arange(M)[None, :],
                                 jnp.arange(N)[:, None]])
        elif self.loss_method == "contrast":
            sig = jax.nn.sigmoid(sim)
            own_sig = sig[jnp.arange(N)[:, None], jnp.arange(M)[None, :],
                          jnp.arange(N)[:, None]]
            masked = jnp.where(eye, -jnp.inf, sig)
            loss = jnp.sum(1.0 - own_sig + jnp.max(masked, axis=2))
        else:
            raise ValueError(f"unknown loss_method {self.loss_method!r}")

        labels = jnp.tile(jnp.arange(N)[:, None], (1, M)).reshape(-1)
        prec1 = top1_percent(sim.reshape(N * M, N), labels)
        return loss, prec1


@LOSSES.register("GE2ELossV2")
class GE2ELossV2(nn.Module):
    """GE2E with cosine values clamped to ≥1e-6
    (parity: src/losses/GE2ELossV2.py:10-70, cvqluu/GE2E-Loss lineage)."""
    init_w: float = 10.0
    init_b: float = -5.0
    loss_method: str = "softmax"
    test_normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, label: jax.Array | None = None):
        assert x.ndim == 3 and x.shape[1] >= 2
        N, M, D = x.shape
        w = self.param("w", nn.initializers.constant(self.init_w), ())
        b = self.param("b", nn.initializers.constant(self.init_b), ())

        centroids = jnp.mean(x, axis=1)
        loo = (jnp.sum(x, axis=1, keepdims=True) - x) / (M - 1)
        xn = x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        cn = centroids / jnp.clip(
            jnp.linalg.norm(centroids, axis=-1, keepdims=True), 1e-12)
        ln = loo / jnp.clip(jnp.linalg.norm(loo, axis=-1, keepdims=True),
                            1e-12)
        cos = jnp.einsum("jid,kd->jik", xn, cn)
        own = jnp.einsum("jid,jid->ji", xn, ln)
        eye = jnp.eye(N, dtype=bool)[:, None, :]
        cos = jnp.where(eye, own[:, :, None], cos)
        cos = jnp.clip(cos, 1e-6)                 # the V2 clamp

        sim = cos * jnp.clip(w, 1e-6) + b
        if self.loss_method == "softmax":
            logp = jax.nn.log_softmax(sim, axis=2)
            loss = -jnp.sum(logp[jnp.arange(N)[:, None],
                                 jnp.arange(M)[None, :],
                                 jnp.arange(N)[:, None]])
        else:
            sig = jax.nn.sigmoid(sim)
            own_sig = sig[jnp.arange(N)[:, None], jnp.arange(M)[None, :],
                          jnp.arange(N)[:, None]]
            masked = jnp.where(eye, -jnp.inf, sig)
            loss = jnp.sum(1.0 - own_sig + jnp.max(masked, axis=2))
        labels = jnp.tile(jnp.arange(N)[:, None], (1, M)).reshape(-1)
        return loss, top1_percent(sim.reshape(N * M, N), labels)


@LOSSES.register("GE2ELoss_fusion")
class GE2ELossFusion(nn.Module):
    """softmax + contrast GE2E sum (parity: src/losses/GE2ELoss_fusion.py)."""
    init_w: float = 10.0
    init_b: float = -5.0
    test_normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, label: jax.Array | None = None):
        loss_s, prec1 = GE2ELossV2(self.init_w, self.init_b, "softmax")(
            x, label)
        loss_c, _ = GE2ELossV2(self.init_w, self.init_b, "contrast")(x, label)
        return loss_s + loss_c, prec1
