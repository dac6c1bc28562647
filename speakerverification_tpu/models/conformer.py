"""Conformer speaker encoders (Flax).

Parity targets:
* vendored conformer package — src/models/conformer/conformer/*
  (sooftware/conformer): Conv2d subsampling (×4 time reduction), blocks
  of half-step feed-forward → MHSA → conv module (pointwise-GLU →
  depthwise → BN → swish → pointwise) → feed-forward → LayerNorm.
* ``Conformer`` speaker model — src/models/Conformer.py:13-129
  (instance-normed mel → 6-layer encoder dim 256 → conv attentive stats
  pooling → BN → linear).
* ``ECAPA_Conformer`` — src/models/ECAPA_Conformer.py:13-196 (ECAPA
  TDNN/SE-Res2 trunk + MFA → 16-layer conformer dim 144 kernel 31 →
  ASP → BN → linear).

Attention parity: blocks use Transformer-XL relative multi-head
attention exactly as the vendored package does
(src/models/conformer/conformer/attention.py:26-113: shared (q+u)·kᵀ
content score + (q+v)·posᵀ with the XL shift trick, scaled by
√d_model, interleaved sin/cos positional encoding fed through a
bias-free projection) — forward-parity tested against the vendored
torch module with ported weights, so conformer checkpoints port.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from speakerverification_tpu.models.layers import (
    AttentiveStatisticsPooling,
    BatchNorm1d,
    Conv1d,
    SERes2NetBlock,
    TDNNBlock,
    gelu_exact,
)
from speakerverification_tpu.registry import MODELS

__all__ = ["ConformerEncoder", "ConformerSpeaker", "ECAPAConformer"]


def _sinusoidal_pe(T: int, d: int) -> jnp.ndarray:
    """Interleaved sin/cos positional encoding
    (parity: conformer/embedding.py:32-42 — pe[:, 0::2]=sin, 1::2=cos)."""
    pos = jnp.arange(T)[:, None].astype(jnp.float32)
    div = jnp.exp(jnp.arange(0, d, 2).astype(jnp.float32)
                  * -(math.log(10000.0) / d))
    angle = pos * div[None, :]                                 # [T, d/2]
    return jnp.stack([jnp.sin(angle), jnp.cos(angle)],
                     axis=-1).reshape(T, d)


def _relative_shift(pos_score: jax.Array) -> jax.Array:
    """Transformer-XL shift trick (parity: attention.py:105-113)."""
    B, H, T, S = pos_score.shape
    padded = jnp.pad(pos_score, ((0, 0), (0, 0), (0, 0), (1, 0)))
    return padded.reshape(B, H, S + 1, T)[:, :, 1:].reshape(B, H, T, S)


class RelativeMultiHeadAttention(nn.Module):
    """Transformer-XL relative MHSA (parity: attention.py:26-113).

    Note the reference quirks reproduced exactly: scores scale by
    √d_model (not √d_head), and the positional term uses pe[0..T−1]
    (not reversed distances) before the shift.
    """
    dim: int
    num_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, pos: jax.Array,
                 train: bool = False) -> jax.Array:
        B, T, _ = x.shape
        H = self.num_heads
        Dh = self.dim // H

        q = nn.Dense(self.dim)(x).reshape(B, T, H, Dh)
        k = nn.Dense(self.dim)(x).reshape(B, T, H, Dh)
        v = nn.Dense(self.dim)(x).reshape(B, T, H, Dh)
        p = nn.Dense(self.dim, use_bias=False)(pos).reshape(1, T, H, Dh)

        u_bias = self.param("u_bias", nn.initializers.xavier_uniform(),
                            (H, Dh))
        v_bias = self.param("v_bias", nn.initializers.xavier_uniform(),
                            (H, Dh))

        content = jnp.einsum("bthd,bshd->bhts", q + u_bias, k)
        pos_score = jnp.einsum("bthd,bshd->bhts",
                               q + v_bias, jnp.broadcast_to(p, q.shape))
        pos_score = _relative_shift(pos_score)
        score = (content + pos_score) / math.sqrt(self.dim)

        attn = jax.nn.softmax(score, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        ctx = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, self.dim)
        return nn.Dense(self.dim)(ctx)


class MHSAModule(nn.Module):
    """Pre-LN relative MHSA with post-dropout
    (parity: attention.py:116-152)."""
    dim: int
    num_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        pos = _sinusoidal_pe(x.shape[1], self.dim)[None]
        h = nn.LayerNorm()(x)
        h = RelativeMultiHeadAttention(self.dim, self.num_heads,
                                       self.dropout)(h, pos, train=train)
        return nn.Dropout(self.dropout, deterministic=not train)(h)


class _FeedForward(nn.Module):
    dim: int
    expansion: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train=False):
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.dim * self.expansion)(h)
        h = jax.nn.swish(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.dim)(h)
        return nn.Dropout(self.dropout, deterministic=not train)(h)


class _ConvModule(nn.Module):
    dim: int
    kernel_size: int = 31
    expansion: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train=False):
        # expansion_factor=2 IS the GLU doubling (convolution.py:136-145):
        # pointwise to dim·2, GLU gates back to dim, depthwise stays at dim
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.dim * self.expansion)(h)       # pointwise
        a, b = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(b)                        # GLU → dim
        # the vendored DepthwiseConv1d is bias-free (convolution.py:50)
        h = nn.Conv(self.dim, (self.kernel_size,),
                    padding="SAME", use_bias=False,
                    feature_group_count=self.dim)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = jax.nn.swish(h)
        h = nn.Dense(self.dim)(h)
        return nn.Dropout(self.dropout, deterministic=not train)(h)


class ConformerBlock(nn.Module):
    dim: int
    num_heads: int = 4
    ff_expansion: int = 4
    conv_expansion: int = 2
    conv_kernel: int = 31
    dropout: float = 0.1
    half_step_residual: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        step = 0.5 if self.half_step_residual else 1.0
        x = x + step * _FeedForward(self.dim, self.ff_expansion,
                                    self.dropout)(x, train=train)
        x = x + MHSAModule(self.dim, self.num_heads,
                           self.dropout)(x, train=train)
        x = x + _ConvModule(self.dim, self.conv_kernel, self.conv_expansion,
                            self.dropout)(x, train=train)
        x = x + step * _FeedForward(self.dim, self.ff_expansion,
                                    self.dropout)(x, train=train)
        return nn.LayerNorm()(x)


class ConformerEncoder(nn.Module):
    """Conv2d-subsampled conformer stack over [B, T, F] features."""
    encoder_dim: int = 256
    num_layers: int = 6
    num_heads: int = 4
    ff_expansion: int = 4
    conv_expansion: int = 2
    conv_kernel: int = 31
    dropout: float = 0.1
    subsample: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        if self.subsample:
            # Conv2dSubsampling: two 3×3 stride-2 convs over [B, T, F, 1]
            h = x[..., None]
            h = jax.nn.relu(nn.Conv(self.encoder_dim, (3, 3), (2, 2),
                                    padding="VALID")(h))
            h = jax.nn.relu(nn.Conv(self.encoder_dim, (3, 3), (2, 2),
                                    padding="VALID")(h))
            B, T, F, C = h.shape
            h = h.reshape(B, T, F * C)
            h = nn.Dense(self.encoder_dim)(h)
        else:
            h = nn.Dense(self.encoder_dim)(x)
        # positions enter through each block's relative attention (the
        # vendored encoder adds no PE at input, conformer/encoder.py)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        for _ in range(self.num_layers):
            h = ConformerBlock(self.encoder_dim, self.num_heads,
                               self.ff_expansion, self.conv_expansion,
                               self.conv_kernel, self.dropout)(h, train=train)
        return h


class ConformerSpeaker(nn.Module):
    """Parity: src/models/Conformer.py Conformer_ (encoder dim 256, 6L)."""
    nOut: int = 512
    encoder_dim: int = 256
    num_layers: int = 6
    attention_dim: int = 128
    feature_type: str = "melspectrogram"

    @nn.compact
    def __call__(self, x, lengths=None, train=False):
        if self.feature_type == "melspectrogram":
            x = jnp.log(jnp.maximum(x, 0.0) + 1e-6)  # clamp: the reference NaNs here when SpecAugment's bicubic warp overshoots negative
            x = x - jnp.mean(x, axis=1, keepdims=True)
        # affine instance norm over time (Conformer.py:35-37)
        w = self.param("inorm_scale", nn.initializers.ones, (x.shape[-1],))
        b = self.param("inorm_bias", nn.initializers.zeros, (x.shape[-1],))
        x = (x - x.mean(axis=1, keepdims=True)) / jnp.sqrt(
            x.var(axis=1, keepdims=True) + 1e-5) * w + b

        h = ConformerEncoder(self.encoder_dim, self.num_layers,
                             conv_kernel=15)(x, train=train)

        attn = nn.Conv(self.attention_dim, (1,))(h)
        attn = jax.nn.relu(attn)
        attn = nn.BatchNorm(use_running_average=not train, momentum=0.9)(attn)
        attn = nn.Conv(self.encoder_dim, (1,))(attn)
        wgt = jax.nn.softmax(attn, axis=1)
        mu = jnp.sum(h * wgt, axis=1)
        sg = jnp.sqrt(jnp.clip(jnp.sum((h ** 2) * wgt, axis=1) - mu ** 2,
                               1e-4, 1e4))
        pooled = jnp.concatenate([mu, sg], axis=-1)
        pooled = nn.BatchNorm(use_running_average=not train,
                              momentum=0.9)(pooled)
        return nn.Dense(self.nOut)(pooled)


class ECAPAConformer(nn.Module):
    """Parity: src/models/ECAPA_Conformer.py (ECAPA trunk → conformer)."""
    nOut: int = 192
    channels: Sequence[int] = (512, 512, 512, 512, 1536)
    kernel_sizes: Sequence[int] = (5, 3, 3, 3, 1)
    dilations: Sequence[int] = (1, 2, 3, 4, 1)
    res2net_scale: int = 8
    se_channels: int = 128
    attention_channels: int = 128
    encoder_dim: int = 144
    num_layers: int = 16
    activation: Callable = gelu_exact
    feature_type: str = "melspectrogram"

    @nn.compact
    def __call__(self, x, lengths=None, train=False):
        if self.feature_type == "melspectrogram":
            x = jnp.log(jnp.maximum(x, 0.0) + 1e-6)  # clamp: the reference NaNs here when SpecAugment's bicubic warp overshoots negative
            x = x - jnp.mean(x, axis=1, keepdims=True)
        w = self.param("inorm_scale", nn.initializers.ones, (x.shape[-1],))
        b = self.param("inorm_bias", nn.initializers.zeros, (x.shape[-1],))
        x = (x - x.mean(axis=1, keepdims=True)) / jnp.sqrt(
            x.var(axis=1, keepdims=True) + 1e-5) * w + b

        x = TDNNBlock(self.channels[0], self.kernel_sizes[0],
                      self.dilations[0], activation=self.activation)(
            x, train=train)
        outs = []
        for i in range(1, len(self.channels) - 1):
            x = SERes2NetBlock(self.channels[i],
                               res2net_scale=self.res2net_scale,
                               se_channels=self.se_channels,
                               kernel_size=self.kernel_sizes[i],
                               dilation=self.dilations[i],
                               activation=self.activation)(x, lengths,
                                                           train=train)
            outs.append(x)
        x = jnp.concatenate(outs, axis=-1)
        x = TDNNBlock(self.channels[-1], self.kernel_sizes[-1],
                      self.dilations[-1], activation=self.activation)(
            x, train=train)

        x = ConformerEncoder(self.encoder_dim, self.num_layers,
                             conv_kernel=31)(x, train=train)

        x = AttentiveStatisticsPooling(self.attention_channels)(
            x, lengths, train=train)
        x = BatchNorm1d()(x, train=train)
        return nn.Dense(self.nOut)(x)


@MODELS.register("Conformer")
def build_conformer(nOut: int = 512, **kwargs) -> ConformerSpeaker:
    """MainModel parity (src/models/Conformer.py:127-129)."""
    feature_type = kwargs.get("feature_type",
                              kwargs.get("features", "melspectrogram"))
    return ConformerSpeaker(nOut=nOut, feature_type=feature_type,
                            encoder_dim=int(kwargs.get("encoder_dim", 256)),
                            num_layers=int(kwargs.get("num_layers", 6)))


@MODELS.register("ECAPA_Conformer")
def build_ecapa_conformer(nOut: int = 192, **kwargs) -> ECAPAConformer:
    """MainModel parity (src/models/ECAPA_Conformer.py:195-196)."""
    feature_type = kwargs.get("feature_type",
                              kwargs.get("features", "melspectrogram"))
    known = {k: tuple(kwargs[k]) for k in ("channels", "kernel_sizes",
                                           "dilations") if k in kwargs}
    return ECAPAConformer(nOut=nOut, feature_type=feature_type,
                          encoder_dim=int(kwargs.get("encoder_dim", 144)),
                          num_layers=int(kwargs.get("num_layers", 16)),
                          **known)
