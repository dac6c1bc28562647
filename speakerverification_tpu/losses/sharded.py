"""Class-sharded (tensor-parallel) margin-softmax head.

The reference's classifier losses hold the full ``[nClasses, nOut]``
weight on every GPU (e.g. src/losses/AAmSoftmax.py:20-24); at VoxCeleb2
scale that is fine, but production speaker-ID deployments train against
10^5-10^6 speakers, where the classifier dominates memory and compute.
This head shards the class dimension over a ``model`` mesh axis —
Megatron-style vocab-parallel softmax, built TPU-natively on XLA
collectives:

* each shard holds ``nClasses / n_model`` weight rows and computes its
  local cosine block ``[B, C_local]``;
* the ArcFace margin is applied by the shard that owns the target class;
* the softmax normalizer is assembled with one ``pmax`` (global max for
  stability) and one ``psum`` of partial exponential sums over the
  ``model`` axis; the target logit with one more ``psum``;
* JAX autodiff through the collectives emits the matching backward
  collectives, so embedding gradients arrive complete on every shard and
  weight gradients stay local to their class block.

Run inside ``shard_map`` via ``parallel.tp.make_dp_tp_train_step``; the
module is also valid OUTSIDE shard_map (init, or single-device use)
where it degrades to the plain full-class computation.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from speakerverification_tpu.losses.common import (
    flatten_grouped,
    l2_normalize,
)
from speakerverification_tpu.registry import LOSSES

__all__ = ["ShardedAAmSoftmax"]


def _copy_to_model_shards(axis: str):
    """Identity forward / ``psum`` backward over the model axis.

    The embedding enters every shard replicated; each shard's backward
    produces only its own class block's contribution to ∂L/∂e, so the
    cotangents must be summed across shards (Megatron's
    copy-to-tensor-parallel-region op)."""

    @jax.custom_vjp
    def f(x):
        return x

    f.defvjp(lambda x: (x, None),
             lambda _, g: (jax.lax.psum(g, axis),))
    return f


@LOSSES.register("ShardedAAmSoftmax")
class ShardedAAmSoftmax(nn.Module):
    """ArcFace ``s·cos(θ+m)`` with the class dimension sharded over a
    mesh axis (math parity: losses/margin.py::AAmSoftmax, reference
    src/losses/AAmSoftmax.py)."""
    nOut: int = 192
    nClasses: int = 5994
    margin: float = 0.2
    scale: float = 30.0
    easy_margin: bool = False
    model_axis: str = "model"
    test_normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, label: jax.Array):
        x, label = flatten_grouped(x, label)
        if self.is_initializing():
            w = self.param("weight", nn.initializers.xavier_normal(),
                           (self.nClasses, self.nOut))
        else:
            # read without flax's init-shape check: inside shard_map this
            # leaf arrives as the shard's local row block
            w = self.get_variable("params", "weight")
        c_local = w.shape[0]
        sharded = (not self.is_initializing()) and c_local != self.nClasses
        if sharded:
            x = _copy_to_model_shards(self.model_axis)(x)

        cosine = l2_normalize(x, -1) @ l2_normalize(w, -1).T   # [B, C_local]

        cos_m = math.cos(self.margin)
        sin_m = math.sin(self.margin)
        th = math.cos(math.pi - self.margin)
        mm = math.sin(math.pi - self.margin) * self.margin
        sine = jnp.sqrt(jnp.clip(1.0 - cosine * cosine, 0.0, 1.0))
        phi = cosine * cos_m - sine * sin_m
        if self.easy_margin:
            phi = jnp.where(cosine > 0, phi, cosine)
        else:
            phi = jnp.where(cosine - th > 0, phi, cosine - mm)

        if sharded:
            offset = jax.lax.axis_index(self.model_axis) * c_local
        else:
            offset = 0
        tgt_local = label - offset
        valid = (tgt_local >= 0) & (tgt_local < c_local)
        one_hot = (jax.nn.one_hot(jnp.clip(tgt_local, 0, c_local - 1),
                                  c_local, dtype=cosine.dtype)
                   * valid[:, None].astype(cosine.dtype))
        logits = self.scale * (one_hot * phi + (1.0 - one_hot) * cosine)

        local_max = jnp.max(logits, axis=-1)
        local_expsum_at = lambda m: jnp.sum(jnp.exp(logits - m[:, None]), -1)
        local_tgt = jnp.sum(one_hot * logits, axis=-1)
        if sharded:
            # the logsumexp max-shift carries no gradient (it cancels);
            # pmax has no VJP rule, so detach it explicitly
            gmax = jax.lax.pmax(jax.lax.stop_gradient(local_max),
                                self.model_axis)
            z = jax.lax.psum(local_expsum_at(gmax), self.model_axis)
            tgt_logit = jax.lax.psum(local_tgt, self.model_axis)
        else:
            gmax = local_max
            z = local_expsum_at(gmax)
            tgt_logit = local_tgt

        loss = jnp.mean(-(tgt_logit - gmax - jnp.log(z)))
        # top-1 with the SAME tie-breaking as the unsharded heads'
        # top1_percent (argmax → lowest class index wins): each shard's
        # local argmax already breaks ties low; across shards, the
        # lowest global index among those achieving the global max wins
        # via pmin over a sentinel-masked candidate
        local_arg = jnp.argmax(logits, axis=-1) + offset
        if sharded:
            cand = jnp.where(jax.lax.stop_gradient(local_max) == gmax,
                             local_arg, self.nClasses)
            g_arg = jax.lax.pmin(cand, self.model_axis)
        else:
            g_arg = local_arg
        prec1 = 100.0 * jnp.mean((g_arg == label).astype(jnp.float32))
        return loss, prec1
