"""Hierarchical adaptive softmax (large-nClasses efficiency head).

Parity target: src/losses/adasoftmax_v1.py (AdaptiveSoftmax +
AdaptiveLoss) and adasoftmax_v2.py — a two-level softmax: a head over
the ``cutoff[0]`` most frequent classes plus one slot per tail cluster,
and per-cluster tails with rank-reduced projections
(``input // 4^i``), trained with the composed NLL.

JAX formulation: compute full composed log-probabilities (head log-prob
of the cluster slot + tail log-prob within the cluster) and take the
target's NLL — identical loss value, fully vectorized/static-shape (the
reference's index_select scatter logic is a CUDA-era optimization that
XLA doesn't need for these class counts).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from speakerverification_tpu.losses.common import flatten_grouped, top1_percent
from speakerverification_tpu.registry import LOSSES

__all__ = ["AdaptiveSoftmaxLoss"]


def _default_cutoff(n_classes: int) -> Tuple[int, ...]:
    head = max(n_classes // 4, 1)
    return (head, n_classes)


class AdaptiveSoftmaxLoss(nn.Module):
    """``variant`` selects the reference structure being matched:

    * ``"v1"`` — adasoftmax_v1.py:33-57: tail ``i`` projects to
      ``nOut // reduce_factor**i`` (the FIRST tail has no reduction) and
      the tail output Linear carries a bias.
    * ``"v2"`` — adasoftmax_v2.py:8-24: tail ``i`` projects to
      ``nOut // 4**(i+1)`` and both tail Linears are bias-free.

    Both reference AdaptiveLoss variants sum head CE (with tail targets
    remapped to their cluster slot) and within-cluster tail CE, summed
    then divided by batch — algebraically the composed-NLL mean below.
    """
    nOut: int = 192
    nClasses: int = 5994
    cutoff: Sequence[int] = ()
    reduce_factor: int = 4
    variant: str = "v2"
    test_normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, label: jax.Array):
        x, label = flatten_grouped(x, label)
        cutoff = tuple(self.cutoff) or _default_cutoff(self.nClasses)
        assert cutoff[-1] == self.nClasses, \
            f"last cutoff {cutoff[-1]} must equal nClasses {self.nClasses}"
        n_tails = len(cutoff) - 1

        head_logits = nn.Dense(cutoff[0] + n_tails, name="head")(x)
        head_logp = jax.nn.log_softmax(head_logits, axis=-1)

        # composed log-probs: [B, nClasses]
        parts = [head_logp[:, :cutoff[0]]]
        for i in range(n_tails):
            if self.variant == "v1":
                proj_dim = max(self.nOut // (self.reduce_factor ** i), 1)
                out_bias = True
            else:
                proj_dim = max(self.nOut // (self.reduce_factor ** (i + 1)), 1)
                out_bias = False
            h = nn.Dense(proj_dim, use_bias=False, name=f"tail{i}_proj")(x)
            tail_logits = nn.Dense(cutoff[i + 1] - cutoff[i],
                                   use_bias=out_bias,
                                   name=f"tail{i}_out")(h)
            tail_logp = jax.nn.log_softmax(tail_logits, axis=-1)
            parts.append(head_logp[:, cutoff[0] + i:cutoff[0] + i + 1]
                         + tail_logp)
        logp = jnp.concatenate(parts, axis=-1)

        loss = -jnp.mean(jnp.take_along_axis(logp, label[:, None], axis=1))
        return loss, top1_percent(logp, label)


class AdaptiveSoftmaxLossV1(AdaptiveSoftmaxLoss):
    variant: str = "v1"


LOSSES.register("adasoftmax_v1")(AdaptiveSoftmaxLossV1)
LOSSES.register("adasoftmax_v2")(AdaptiveSoftmaxLoss)
