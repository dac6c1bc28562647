"""Triplet loss with hard-negative mining.

Parity target: src/losses/TripletLoss.py:16-95 — anchors = utterance 0,
positives = utterance 1 (both L2-normalized), hinge on squared distances
with margin; negatives mined from the batch's positives either by rank
(take one of the top ``hard_rank`` most-similar wrong speakers with
probability ``hard_prob``, else uniform) or semi-hard (``hard_rank<0``).

Randomized mining uses the module's ``mining`` RNG stream so training
remains reproducible; the reference returns the full threshold-tuning
dict as "prec1" — we return the batch EER%-like quantity (fraction of
triplets violating the margin) which is cheap and monotone with it.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from speakerverification_tpu.losses.common import l2_normalize
from speakerverification_tpu.registry import LOSSES

__all__ = ["TripletLoss"]


@LOSSES.register("TripletLoss")
class TripletLoss(nn.Module):
    hard_rank: int = 0
    hard_prob: float = 0.0
    margin: float = 0.2
    test_normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, label: jax.Array | None = None):
        assert x.ndim == 3 and x.shape[1] == 2
        B = x.shape[0]
        anchor = l2_normalize(x[:, 0, :], -1)
        positive = l2_normalize(x[:, 1, :], -1)

        # similarity logits = -squared distance between anchors & positives
        d2 = (jnp.sum(anchor**2, -1)[:, None] + jnp.sum(positive**2, -1)[None, :]
              - 2.0 * anchor @ positive.T)
        sim = -d2                                          # [B, B]

        rng = self.make_rng("mining") if self.has_rng("mining") else \
            jax.random.PRNGKey(0)
        k_choice, k_prob = jax.random.split(rng)

        self_mask = jnp.eye(B, dtype=bool)
        if self.hard_rank < 0:
            # semi-hard: sim(own) - margin < sim(neg) < sim(own)
            own = jnp.diag(sim)
            semi = (~self_mask) & (sim > (own - self.margin)[:, None]) \
                & (sim < own[:, None])
            # pick a random semi-hard negative (fallback: random negative)
            scores = jnp.where(semi, 0.0, -jnp.inf)
            gumbel = jax.random.gumbel(k_choice, (B, B))
            fallback = jnp.where(self_mask, -jnp.inf, gumbel)
            negidx = jnp.where(jnp.any(semi, axis=1),
                               jnp.argmax(scores + gumbel, axis=1),
                               jnp.argmax(fallback, axis=1))
        else:
            # rank-based: one of the hard_rank most-similar wrong speakers
            order = jnp.argsort(-jnp.where(self_mask, -jnp.inf, sim), axis=1)
            k = jax.random.randint(k_choice, (B,), 0,
                                   max(self.hard_rank, 1))
            hard = jnp.take_along_axis(order, k[:, None], axis=1)[:, 0]
            rand = jax.random.randint(jax.random.fold_in(k_choice, 1), (B,),
                                      0, B - 1)
            rand = jnp.where(rand >= jnp.arange(B), rand + 1, rand)
            use_hard = jax.random.uniform(k_prob, (B,)) < self.hard_prob
            negidx = jnp.where(use_hard, hard, rand)

        negative = positive[negidx]
        pos_d2 = jnp.sum((anchor - positive) ** 2, axis=-1)
        neg_d2 = jnp.sum((anchor - negative) ** 2, axis=-1)
        loss = jnp.mean(jax.nn.relu(pos_d2 - neg_d2 + self.margin))
        prec = 100.0 * jnp.mean((pos_d2 + self.margin < neg_d2
                                 ).astype(jnp.float32))
        return loss, prec
