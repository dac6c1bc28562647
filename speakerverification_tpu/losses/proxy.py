"""Proxy-based losses: ProxyAnchor, ProxyNCA, multi-proxy MP/MMP.

Parity targets:
* ``ProxyAnchor`` — src/losses/ProxyAnchor.py:10-42 (kaiming fan-out
  proxies, pos/neg log-sum-exp over cosine similarities).
* ``ProxyNCA``    — src/losses/ProxyNCA.py:26-51 (scaled squared
  euclidean to normalized proxies + label smoothing 0.1).
* ``MP`` / ``MMP`` — src/losses/MP.py:13-75 / MMP.py:8-120: grouped-batch
  query/centroid split (utterance 0 vs mean of the rest — the
  ``pre_process`` grouping of mpa_utils.py:34-43 applied to
  speaker-balanced batches), batch centroids substituted into the proxy
  bank, CE regularizer between anchors and own proxies. Note the
  reference ``MP`` crashes as written (undefined ``n_classes``,
  MP.py:17); we implement the intended math.
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

__all__ = ["ProxyAnchor", "ProxyNCA", "MP", "MMP"]


def _kaiming_fan_out(rng, shape):
    fan_out = shape[1]
    std = (2.0 / fan_out) ** 0.5
    return std * jax.random.normal(rng, shape)


@LOSSES.register("ProxyAnchor")
class ProxyAnchor(nn.Module):
    nOut: int = 192
    nClasses: int = 5994
    margin: float = 0.1
    scale: float = 30.0            # 'alpha' in the paper
    test_normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, label: jax.Array):
        x, label = flatten_grouped(x, label)
        proxies = self.param("proxies", _kaiming_fan_out,
                             (self.nClasses, self.nOut))
        cos = l2_normalize(x, -1) @ l2_normalize(proxies, -1).T
        p_one_hot = jax.nn.one_hot(label, self.nClasses)
        n_one_hot = 1.0 - p_one_hot

        pos_exp = jnp.exp(-self.scale * (cos - self.margin))
        neg_exp = jnp.exp(self.scale * (cos + self.margin))

        with_pos = (p_one_hot.sum(axis=0) > 0)
        num_valid = jnp.maximum(jnp.sum(with_pos), 1)

        p_sim = jnp.sum(pos_exp * p_one_hot, axis=0)
        n_sim = jnp.sum(neg_exp * n_one_hot, axis=0)

        pos_term = jnp.sum(jnp.where(with_pos, jnp.log1p(p_sim), 0.0)) / num_valid
        neg_term = jnp.sum(jnp.log1p(n_sim)) / self.nClasses
        return pos_term + neg_term, top1_percent(cos, label)


@LOSSES.register("ProxyNCA")
class ProxyNCA(nn.Module):
    nOut: int = 192
    nClasses: int = 5994
    smoothing_const: float = 0.1
    scaling_x: float = 1.0
    scaling_p: float = 3.0
    test_normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, label: jax.Array):
        x, label = flatten_grouped(x, label)
        proxies = self.param(
            "proxies", lambda rng, shape: jax.random.normal(rng, shape) / 8.0,
            (self.nClasses, self.nOut))
        P = l2_normalize(proxies, -1) * self.scaling_p
        X = l2_normalize(x, -1) * self.scaling_x
        d2 = (jnp.sum(X**2, -1)[:, None] + jnp.sum(P**2, -1)[None, :]
              - 2.0 * X @ P.T)
        T = jax.nn.one_hot(label, self.nClasses) * (1 - self.smoothing_const)
        T = jnp.where(T == 0, self.smoothing_const / (self.nClasses - 1), T)
        loss = jnp.mean(jnp.sum(-T * jax.nn.log_softmax(-d2, axis=-1), -1))
        return loss, top1_percent(-d2, label)


def _query_anchor(x: jax.Array):
    """Grouped batch [B, nPer, D] → (query=utt0, anchor=mean of rest)."""
    assert x.ndim == 3 and x.shape[1] >= 2, \
        "MP/MMP need nPerSpeaker >= 2 grouped input"
    return x[:, 0, :], jnp.mean(x[:, 1:, :], axis=1)


@LOSSES.register("MP")
class MP(nn.Module):
    nOut: int = 192
    nClasses: int = 5994
    w_init: float = 10.0
    b_init: float = -5.0
    lambda_init: float = 0.5
    test_normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, label: jax.Array):
        query, anchor = _query_anchor(x)
        proxies = self.param("proxies", _kaiming_fan_out,
                             (self.nClasses, self.nOut))
        w = self.param("w", nn.initializers.constant(self.w_init), ())
        b = self.param("b", nn.initializers.constant(self.b_init), ())

        P = l2_normalize(proxies, -1)
        # proxy bank with in-batch classes replaced by batch anchors
        new_center = P.at[label].set(anchor)

        logits = (query @ new_center.T) * w + b            # [B, nClasses]
        loss1 = cross_entropy(logits, label)

        logits2 = (anchor @ P[label].T) * w + b            # [B, B]
        idx = jnp.arange(x.shape[0])
        loss2 = cross_entropy(logits2, idx)
        prec1 = top1_percent(logits2, idx)
        return loss1 + self.lambda_init * loss2, prec1


@LOSSES.register("MMP")
class MMP(nn.Module):
    nOut: int = 192
    nClasses: int = 5994
    w_init: float = 10.0
    b_init: float = -5.0
    lambda_init: float = 0.5
    test_normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, label: jax.Array):
        query, anchor = _query_anchor(x)
        B = x.shape[0]
        proxies = self.param("proxies", _kaiming_fan_out,
                             (self.nClasses, self.nOut))
        w = self.param("w", nn.initializers.constant(self.w_init), ())
        b = self.param("b", nn.initializers.constant(self.b_init), ())

        P = l2_normalize(proxies, -1)
        anchor_n = l2_normalize(anchor, -1)
        new_center = P.at[label].set(anchor_n)

        # l1: positive pairs pulled to own (in-batch) centers
        own = jnp.sum(query * new_center[label], axis=1)
        l1 = jnp.log1p(jnp.sum(jnp.exp(-own * w + b)))
        # l2: repel out-of-batch proxies — mask in-batch columns
        all_logits = (query @ new_center.T) * w - b        # [B, nClasses]
        in_batch = jnp.zeros(self.nClasses, bool).at[label].set(True)
        l2 = jnp.mean(jnp.log1p(jnp.sum(
            jnp.where(in_batch[None, :], 0.0, jnp.exp(all_logits)), axis=1)))
        # l3: repel other in-batch centers
        z = jnp.exp((query @ new_center[label].T) * w - b)  # [B, B]
        l3 = jnp.mean(jnp.log1p(jnp.sum(z, axis=1) - jnp.diag(z)))

        logits2 = (anchor @ P[label].T) * w - b
        idx = jnp.arange(B)
        loss_reg = cross_entropy(logits2, idx)
        prec1 = top1_percent(logits2, idx)
        return l1 + l2 + l3 + self.lambda_init * loss_reg, prec1


# The *_Balance variants take the grouped batch directly (query = utt 0,
# anchor = mean of the rest) instead of the pre_process() regrouping —
# identical under the speaker-balanced sampler, which never repeats a
# speaker in a batch (src/losses/MP_Balance.py:38-79, MMP_Balance.py).
LOSSES.register("MP_Balance")(MP)
LOSSES.register("MMP_Balance")(MMP)


@LOSSES.register("MMP_Balance_MTL")
class MMPBalanceMTL(nn.Module):
    """0.4·AmSoftmax + 0.6·MMP_Balance
    (parity: src/losses/MMP_Balance_MTL.py:22-30)."""
    nOut: int = 192
    nClasses: int = 5994
    margin: float = 0.1
    scale: float = 30.0
    weight: float = 0.6
    test_normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, label: jax.Array):
        from speakerverification_tpu.losses.margin import AmSoftmax
        loss_ce, prec1 = AmSoftmax(self.nOut, self.nClasses, self.margin,
                                   self.scale)(x, label)
        loss_ml, _ = MMP(self.nOut, self.nClasses)(x, label)
        return (1 - self.weight) * loss_ce + self.weight * loss_ml, prec1
