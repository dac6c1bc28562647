"""Pooling zoo extras: MHA pooling, pyramid pooling, graph attention.

Parity targets:
* src/models/layers/pooling.py:21-464 — Attention (SAP), HeadAttention /
  MultiHeadAttention / DoubleMHA, TemporalPyramidPooling,
  StatisticsPooling, GlobalAveragePooling (ASP lives in models/layers.py).
* src/models/pooling_layer.py:19-217 — SimpleSelfAttention,
  GraphAttentionLayer, GraphPool (top-k graph pooling).

All modules take ``[B, T, C]`` and return utterance-level vectors (or
reduced sequences for the graph layers).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["AttentionPooling", "MultiHeadAttentionPooling", "DoubleMHA",
           "TemporalPyramidPooling", "GlobalAveragePooling",
           "SimpleSelfAttention", "GraphAttentionLayer", "GraphPool"]


class AttentionPooling(nn.Module):
    """SAP: softmax(v·tanh(Wx)) weights (layers/pooling.py:21-36)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = jnp.tanh(nn.Dense(x.shape[-1])(x))
        v = self.param("v", nn.initializers.xavier_normal(),
                       (x.shape[-1], 1))
        w = jax.nn.softmax((h @ v)[..., 0], axis=1)
        return jnp.sum(x * w[..., None], axis=1)


class MultiHeadAttentionPooling(nn.Module):
    """Per-head attention over channel splits (layers/pooling.py:97-126)."""
    heads: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, T, C = x.shape
        assert C % self.heads == 0
        hs = C // self.heads
        xh = x.reshape(B, T, self.heads, hs)
        v = self.param("v", nn.initializers.xavier_normal(),
                       (self.heads, hs))
        scores = jnp.einsum("bthc,hc->bth", jnp.tanh(xh), v)
        w = jax.nn.softmax(scores, axis=1)
        pooled = jnp.einsum("bthc,bth->bhc", xh, w)
        return pooled.reshape(B, C)


class DoubleMHA(nn.Module):
    """Two-level MHA: heads pooled, then head-level attention
    (layers/pooling.py:128-150)."""
    heads: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, T, C = x.shape
        hs = C // self.heads
        xh = x.reshape(B, T, self.heads, hs)
        v = self.param("v", nn.initializers.xavier_normal(),
                       (self.heads, hs))
        w = jax.nn.softmax(jnp.einsum("bthc,hc->bth", jnp.tanh(xh), v),
                           axis=1)
        head_out = jnp.einsum("bthc,bth->bhc", xh, w)        # [B, H, hs]
        u = self.param("u", nn.initializers.xavier_normal(), (hs, 1))
        hw = jax.nn.softmax((jnp.tanh(head_out) @ u)[..., 0], axis=1)
        return jnp.einsum("bhc,bh->bc", head_out, hw)        # [B, hs]


class TemporalPyramidPooling(nn.Module):
    """Mean-pool at multiple temporal scales, concatenated
    (layers/pooling.py:309-343)."""
    levels: Sequence[int] = (1, 2, 4)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, T, C = x.shape
        outs = []
        for lvl in self.levels:
            seg = T // lvl
            trimmed = x[:, :seg * lvl].reshape(B, lvl, seg, C)
            outs.append(trimmed.mean(axis=2).reshape(B, lvl * C))
        return jnp.concatenate(outs, axis=-1)


class GlobalAveragePooling(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return x.mean(axis=1)


class SimpleSelfAttention(nn.Module):
    """Dot-product self-attention weighting (pooling_layer.py:19-54)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        q = nn.Dense(x.shape[-1])(x)
        scores = jnp.einsum("btc,bsc->bts", q, x) / jnp.sqrt(x.shape[-1])
        w = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bts,bsc->btc", w, x)
        return ctx.mean(axis=1)


class GraphAttentionLayer(nn.Module):
    """GAT layer over the frame graph (pooling_layer.py:94-179;
    Veličković et al. 2018). Fully-connected frame adjacency."""
    out_features: int
    alpha: float = 0.2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(self.out_features, use_bias=False)(x)    # [B, T, F]
        a_src = self.param("a_src", nn.initializers.xavier_normal(),
                           (self.out_features, 1))
        a_dst = self.param("a_dst", nn.initializers.xavier_normal(),
                           (self.out_features, 1))
        e = (jax.nn.leaky_relu((h @ a_src), self.alpha)
             + jax.nn.leaky_relu((h @ a_dst), self.alpha).transpose(0, 2, 1))
        att = jax.nn.softmax(e, axis=-1)                      # [B, T, T]
        return jax.nn.elu(jnp.einsum("bts,bsf->btf", att, h))


class GraphPool(nn.Module):
    """Top-k score-based graph pooling (pooling_layer.py:181-217;
    Gao & Ji 2019). Keeps ``ceil(k·T)`` highest-scoring frames."""
    k: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, T, C = x.shape
        keep = max(int(T * self.k), 1)
        scores = nn.Dense(1, use_bias=False)(x)[..., 0]       # [B, T]
        top_vals, top_idx = jax.lax.top_k(scores, keep)
        gate = jax.nn.sigmoid(top_vals)[..., None]
        gathered = jnp.take_along_axis(x, top_idx[..., None], axis=1)
        return gathered * gate
