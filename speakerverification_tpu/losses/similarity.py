"""Pair-similarity losses: MultiSimilarity (v1/v2), Circle, combos.

Parity targets:
* ``MultiSimilarity``    — src/losses/MultiSimilarity.py:14-80 (hard-pair
  mining + log-sum-exp weighting; the reference's per-row Python
  masked_select loop becomes fully-masked vectorized math here).
* ``MultiSimilarity_v2`` — src/losses/MultiSimilarity_v2.py (vendored
  pytorch-metric-learning MS miner + MS loss; implemented directly).
* ``MSSoftmax``          — src/losses/MSSoftmax.py:12-30 (softmax CE +
  MS; the reference file's class is misnamed ``MSSofmaxLoss`` and thus
  unreachable via its dynamic import — registered functionally here).
* ``MSAmSoftmax``        — src/losses/MSAmSoftmax.py:11-27
  (0.4·ARmSoftmax + 0.6·MS_v2).
* ``CircleLoss``/``V2``  — src/losses/CircleLoss.py:20-52,
  CircleLossV2.py:6-48.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from speakerverification_tpu.losses.common import (
    flatten_grouped,
    l2_normalize,
)
from speakerverification_tpu.losses.margin import Softmax
from speakerverification_tpu.losses.margin_extra import ARmSoftmax
from speakerverification_tpu.registry import LOSSES

__all__ = ["MultiSimilarity", "MultiSimilarityV2", "MSSoftmax",
           "MSAmSoftmax", "CircleLoss", "CircleLossV2"]


def _masked_lse_exp(values: jax.Array, mask: jax.Array, axis=-1):
    """sum(exp(values) * mask) along axis, safe for all-masked rows."""
    return jnp.sum(jnp.where(mask, jnp.exp(values), 0.0), axis=axis)


@LOSSES.register("MultiSimilarity")
class MultiSimilarity(nn.Module):
    margin: float = 0.1
    scale_pos: float = 2.0
    scale_neg: float = 50.0
    thresh: float = 0.5
    test_normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, label: jax.Array):
        feats, labels = flatten_grouped(x, label)
        B = feats.shape[0]
        sim = feats @ feats.T
        # the reference row-normalizes the similarity matrix
        # (MultiSimilarity.py:37: F.normalize(sim_mat))
        simn = sim / jnp.clip(jnp.linalg.norm(sim, axis=1, keepdims=True),
                              1e-12)

        eps = 1e-5
        same = labels[:, None] == labels[None, :]
        pos_mask = same & (simn < 1 - eps)
        neg_mask = ~same

        min_pos = jnp.min(jnp.where(pos_mask, simn, jnp.inf), axis=1)
        max_neg = jnp.max(jnp.where(neg_mask, simn, -jnp.inf), axis=1)

        sel_neg = neg_mask & (simn > (min_pos - self.margin)[:, None])
        sel_pos = pos_mask & (simn < (max_neg + self.margin)[:, None])

        has_neg = jnp.any(sel_neg, axis=1)
        has_pos = jnp.any(sel_pos, axis=1)
        valid = has_neg & has_pos

        pos_loss = (1.0 / self.scale_pos) * jnp.log1p(_masked_lse_exp(
            -self.scale_pos * (simn - self.thresh), sel_pos))
        neg_loss = (1.0 / self.scale_neg) * jnp.log1p(_masked_lse_exp(
            self.scale_neg * (simn - self.thresh), sel_neg))

        loss = jnp.sum(jnp.where(valid, pos_loss + neg_loss, 0.0)) / B

        # top-1 over raw similarities: nearest other item shares the label
        self_mask = jnp.eye(B, dtype=bool)
        nn_idx = jnp.argmax(jnp.where(self_mask, -jnp.inf, sim), axis=1)
        prec = 100.0 * jnp.mean((labels[nn_idx] == labels).astype(jnp.float32))
        return loss, prec


@LOSSES.register("MultiSimilarity_v2")
class MultiSimilarityV2(nn.Module):
    """MS miner (epsilon=0.1) + MS loss on cosine similarities."""
    epsilon: float = 0.1
    scale_pos: float = 2.0
    scale_neg: float = 50.0
    thresh: float = 0.5
    test_normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, label: jax.Array):
        feats, labels = flatten_grouped(x, label)
        B = feats.shape[0]
        fn = l2_normalize(feats, -1)
        sim = fn @ fn.T

        self_mask = jnp.eye(B, dtype=bool)
        same = (labels[:, None] == labels[None, :]) & ~self_mask
        diff = ~(labels[:, None] == labels[None, :])

        # MS miner: keep negatives harder than (hardest pos - eps) and
        # positives harder than (hardest neg + eps)
        min_pos = jnp.min(jnp.where(same, sim, jnp.inf), axis=1)
        max_neg = jnp.max(jnp.where(diff, sim, -jnp.inf), axis=1)
        sel_neg = diff & (sim + self.epsilon > min_pos[:, None])
        sel_pos = same & (sim - self.epsilon < max_neg[:, None])

        pos_loss = (1.0 / self.scale_pos) * jnp.log1p(_masked_lse_exp(
            -self.scale_pos * (sim - self.thresh), sel_pos))
        neg_loss = (1.0 / self.scale_neg) * jnp.log1p(_masked_lse_exp(
            self.scale_neg * (sim - self.thresh), sel_neg))
        valid = jnp.any(sel_pos, axis=1) | jnp.any(sel_neg, axis=1)
        denom = jnp.maximum(jnp.sum(valid), 1)
        loss = jnp.sum(jnp.where(valid, pos_loss + neg_loss, 0.0)) / denom

        nn_idx = jnp.argmax(jnp.where(self_mask, -jnp.inf, sim), axis=1)
        prec = 100.0 * jnp.mean((labels[nn_idx] == labels).astype(jnp.float32))
        return loss, prec


@LOSSES.register("MSSoftmax")
class MSSoftmax(nn.Module):
    nOut: int = 192
    nClasses: int = 5994
    margin: float = 0.1
    scale_pos: float = 2.0
    scale_neg: float = 50.0
    test_normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, label: jax.Array):
        assert x.ndim == 3
        loss_s, prec1 = Softmax(self.nOut, self.nClasses)(x, label)
        loss_ms, _ = MultiSimilarity(self.margin, self.scale_pos,
                                     self.scale_neg)(x, label)
        return loss_s + loss_ms, prec1


@LOSSES.register("MSAmSoftmax")
class MSAmSoftmax(nn.Module):
    nOut: int = 192
    nClasses: int = 5994
    margin: float = 0.1
    scale: float = 30.0
    weight: float = 0.6
    test_normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, label: jax.Array):
        loss_ce, prec1 = ARmSoftmax(self.nOut, self.nClasses, self.margin,
                                    self.scale)(x, label)
        loss_ms, _ = MultiSimilarityV2()(x, label)
        return (1 - self.weight) * loss_ce + self.weight * loss_ms, prec1


@LOSSES.register("CircleLoss")
class CircleLoss(nn.Module):
    """Parity note: the reference computes similarities on RAW embeddings
    — its forward never normalizes (CircleLoss.py:28-41; only the
    ``__main__`` demo normalizes, and the paper assumes cosine). Matched
    live in test_losses_live_parity.py; normalize upstream (or use
    CircleLossV2, which does normalize) for paper behavior."""
    m: float = 0.25
    gamma: float = 256.0
    test_normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, label: jax.Array):
        feats, labels = flatten_grouped(x, label)
        B = feats.shape[0]
        sim = feats @ feats.T
        same = labels[:, None] == labels[None, :]
        triu = jnp.triu(jnp.ones((B, B), bool), k=1)
        pos_mask = same & triu
        neg_mask = (~same) & triu

        ap = jnp.maximum(-jax.lax.stop_gradient(sim) + 1 + self.m, 0.0)
        an = jnp.maximum(jax.lax.stop_gradient(sim) + self.m, 0.0)
        logit_p = -ap * (sim - (1 - self.m)) * self.gamma
        logit_n = an * (sim - self.m) * self.gamma

        lse_p = jax.scipy.special.logsumexp(
            jnp.where(pos_mask, logit_p, -jnp.inf))
        lse_n = jax.scipy.special.logsumexp(
            jnp.where(neg_mask, logit_n, -jnp.inf))
        loss = jax.nn.softplus(lse_n + lse_p)

        self_mask = jnp.eye(B, dtype=bool)
        nn_idx = jnp.argmax(jnp.where(self_mask, -jnp.inf, sim), axis=1)
        prec = 100.0 * jnp.mean((labels[nn_idx] == labels).astype(jnp.float32))
        return loss, prec


@LOSSES.register("CircleLossV2")
class CircleLossV2(nn.Module):
    scale: float = 32.0
    margin: float = 0.25
    similarity: str = "cos"
    test_normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, label: jax.Array):
        feats, labels = flatten_grouped(x, label)
        B = feats.shape[0]
        if self.similarity == "cos":
            feats = l2_normalize(feats, -1)
        sim = feats @ feats.T
        same = labels[:, None] == labels[None, :]
        triu = jnp.triu(jnp.ones((B, B), bool), k=1)
        pos_mask = same & triu
        neg_mask = (~same) & triu

        alpha_p = jax.nn.relu(-sim + 1 + self.margin)
        alpha_n = jax.nn.relu(sim + self.margin)
        loss_p = jnp.sum(jnp.where(
            pos_mask, jnp.exp(-self.scale * alpha_p * (sim - (1 - self.margin))),
            0.0))
        loss_n = jnp.sum(jnp.where(
            neg_mask, jnp.exp(self.scale * alpha_n * (sim - self.margin)),
            0.0))
        loss = jnp.log1p(loss_p * loss_n)

        self_mask = jnp.eye(B, dtype=bool)
        nn_idx = jnp.argmax(jnp.where(self_mask, -jnp.inf, sim), axis=1)
        prec = 100.0 * jnp.mean((labels[nn_idx] == labels).astype(jnp.float32))
        return loss, prec
