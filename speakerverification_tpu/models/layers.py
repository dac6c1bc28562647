"""Shared NN building blocks (channels-last / NLC layout).

TPU-first equivalents of the reference's SpeechBrain-style layer library
(reference: src/models/layers/cnn.py, normalization.py, pooling.py,
utils.py). Everything here operates on ``[batch, time, channels]`` arrays —
the layout XLA prefers on TPU — instead of the reference's ``[B, C, L]``.

All convolutions use 'SAME' padding with dilation, matching SpeechBrain's
auto-padding for stride-1 odd kernels (reference: src/models/layers/cnn.py:787
``get_padding_elem``).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "gelu_exact",
    "length_to_mask",
    "Conv1d",
    "BatchNorm1d",
    "TDNNBlock",
    "Res2NetBlock",
    "SEBlock",
    "AttentiveStatisticsPooling",
    "SERes2NetBlock",
    "StatisticsPooling",
    "SelfAttentionPooling",
]


def gelu_exact(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU — torch.nn.GELU's default, unlike jax.nn.gelu."""
    return jax.nn.gelu(x, approximate=False)


def length_to_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """``[B] -> [B, max_len]`` boolean mask (parity: src/models/layers/utils.py:13)."""
    pos = jnp.arange(max_len)[None, :]
    return (pos < lengths[:, None]).astype(jnp.float32)


class Conv1d(nn.Module):
    """1-D conv over NLC input, 'same' length with REFLECT padding.

    The reference's SpeechBrain convs reflect-pad by default
    (src/models/layers/cnn.py:62,157 ``padding_mode="reflect"``) — a
    real numeric difference from zero-padded SAME at the crop edges
    (verified by the torch-parity test).
    """
    features: int
    kernel_size: int = 1
    dilation: int = 1
    stride: int = 1
    groups: int = 1
    use_bias: bool = True
    padding_mode: str = "reflect"      # 'reflect' | 'zeros'

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        total = self.dilation * (self.kernel_size - 1)
        reflect = self.padding_mode == "reflect" and total > 0
        if reflect:
            lo = total // 2
            x = jnp.pad(x, ((0, 0), (lo, total - lo), (0, 0)), mode="reflect")
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            feature_group_count=self.groups,
            padding="VALID" if reflect or total == 0 else "SAME",
            use_bias=self.use_bias,
        )(x)


class BatchNorm1d(nn.Module):
    """BatchNorm over the channel axis, torch-compatible momentum/eps.

    torch's ``momentum=0.1`` update ``running = 0.9*running + 0.1*batch``
    corresponds to flax ``momentum=0.9`` (reference:
    src/models/layers/normalization.py:13-84).
    """
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis=-1,
        )(x)


class TDNNBlock(nn.Module):
    """Conv → activation → BatchNorm (parity: src/models/ECAPA_TDNN.py:27-69).

    setup-style with pinned child names (identical param tree to the
    earlier compact form) so callers can reach ``.conv`` / ``.norm``
    separately — AttentiveStatisticsPooling splits the k=1 conv weights
    to avoid materializing its global-context concat.
    """
    features: int
    kernel_size: int
    dilation: int = 1
    groups: int = 1
    activation: Callable = gelu_exact

    def setup(self):
        self.conv = Conv1d(self.features, self.kernel_size, self.dilation,
                           groups=self.groups, name="Conv1d_0")
        self.norm = BatchNorm1d(name="BatchNorm1d_0")

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return self.norm(self.activation(self.conv(x)), train=train)


class Res2NetBlock(nn.Module):
    """Multi-scale residual block (parity: src/models/ECAPA_TDNN.py:72-127).

    Channels are split into ``scale`` groups; group 0 passes through, each
    subsequent group is TDNN-processed with the previous output added in.
    NOTE: the inner TDNNBlocks use ReLU regardless of the outer model's
    activation — the reference never forwards ``activation`` into
    Res2NetBlock (ECAPA_TDNN.py:103-113 vs :55 default).
    """
    features: int
    scale: int = 8
    kernel_size: int = 3
    dilation: int = 1
    activation: Callable = jax.nn.relu
    # 'xla' | 'pallas' | 'auto': eval-mode forward may run the whole
    # cascade as ONE fused Pallas kernel (ops/pallas_res2net.py) — the
    # seven sequential 128-ch convs are XLA's weakest op in this model
    # (~6-8 TF/s measured vs ~87 TF/s for the wide 1×1s). 'auto' picks
    # the kernel on TPU. Training always uses the XLA path (autodiff +
    # batch-stat updates).
    backend: str = "xla"

    def _use_fused(self, x: jax.Array, train: bool) -> bool:
        backend = self.backend
        if backend == "auto":
            backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        hidden = self.features // self.scale
        return (backend == "pallas" and not train
                and not self.is_initializing()
                and self.kernel_size == 3
                and self.activation is jax.nn.relu
                and x.shape[-1] == self.features
                and (hidden % 128 == 0 or jax.default_backend() != "tpu")
                and x.shape[1] > 2 * self.dilation)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        assert x.shape[-1] % self.scale == 0
        assert self.features % self.scale == 0
        hidden = self.features // self.scale
        blocks = [TDNNBlock(hidden, self.kernel_size, self.dilation,
                            activation=self.activation)
                  for _ in range(self.scale - 1)]

        if self._use_fused(x, train):
            from speakerverification_tpu.ops.pallas_res2net import (
                fused_res2net_cascade,
            )
            # bind each TDNNBlock with a tiny dummy call so its params
            # become readable (the dummy compute is dead code under jit),
            # then fold eval BatchNorm into a per-channel affine.
            dummy = x[:1, :2 * self.dilation + 1, :hidden]
            ws, cbs, ss, bs = [], [], [], []
            for blk in blocks:
                blk(dummy, train=False)
                v = blk.variables
                conv = v["params"]["Conv1d_0"]["Conv_0"]
                bn_p = v["params"]["BatchNorm1d_0"]["BatchNorm_0"]
                bn_s = v["batch_stats"]["BatchNorm1d_0"]["BatchNorm_0"]
                inv = jax.lax.rsqrt(bn_s["var"].astype(jnp.float32) + 1e-5)
                s = bn_p["scale"].astype(jnp.float32) * inv
                ws.append(conv["kernel"])
                # a bias-free Conv1d config has no 'bias' leaf
                cb = conv.get("bias", jnp.zeros((hidden,)))
                cbs.append(cb.astype(jnp.float32))
                ss.append(s)
                bs.append(bn_p["bias"].astype(jnp.float32)
                          - bn_s["mean"].astype(jnp.float32) * s)
            return fused_res2net_cascade(
                x, jnp.stack(ws), jnp.stack(cbs), jnp.stack(ss),
                jnp.stack(bs), dilation=self.dilation,
                interpret=jax.default_backend() != "tpu")

        chunks = jnp.split(x, self.scale, axis=-1)
        outputs = [chunks[0]]
        y = None
        for i in range(1, self.scale):
            inp = chunks[i] if i == 1 else chunks[i] + y
            y = blocks[i - 1](inp, train=train)
            outputs.append(y)
        return jnp.concatenate(outputs, axis=-1)


class SEBlock(nn.Module):
    """Squeeze-and-excitation (parity: src/models/ECAPA_TDNN.py:132-178)."""
    se_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x: jax.Array, lengths: Optional[jax.Array] = None,
                 ) -> jax.Array:
        if lengths is not None:
            mask = length_to_mask(lengths * x.shape[1], x.shape[1])[..., None]
            total = mask.sum(axis=1, keepdims=True)
            s = (x * mask).sum(axis=1, keepdims=True) / total
        else:
            s = x.mean(axis=1, keepdims=True)               # [B, 1, C]
        s = jax.nn.relu(Conv1d(self.se_channels, 1)(s))
        s = jax.nn.sigmoid(Conv1d(self.out_channels, 1)(s))
        return s * x


class AttentiveStatisticsPooling(nn.Module):
    """Channel-wise attentive mean∥std pooling with global context.

    Parity: src/models/ECAPA_TDNN.py:180-260. Input ``[B, L, C]`` →
    output ``[B, 2C]``.
    """
    attention_channels: int = 128
    global_context: bool = True
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x: jax.Array, lengths: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        B, L, C = x.shape
        if lengths is None:
            lengths = jnp.ones((B,), dtype=x.dtype)
        mask = length_to_mask(lengths * L, L)[..., None]     # [B, L, 1]

        def statistics(x, m):
            mean = (m * x).sum(axis=1)
            var = (m * (x - mean[:, None, :]) ** 2).sum(axis=1)
            std = jnp.sqrt(jnp.clip(var, self.eps))
            return mean, std

        # ASP's TDNN uses the default ReLU (ECAPA_TDNN.py:245: no activation arg)
        blk = TDNNBlock(self.attention_channels, 1, activation=jax.nn.relu)
        if self.global_context:
            total = mask.sum(axis=1, keepdims=True)
            mean, std = statistics(x, mask / total)
            # The reference concatenates [x ∥ mean ∥ std] broadcast over L
            # ([B, L, 3C]) and runs a k=1 conv (ECAPA_TDNN.py:236-256) —
            # on TPU that materializes a 3× HBM-traffic tensor for a
            # linear op. Split the conv weights instead: the mean/std
            # contributions are L-independent rank-1 terms, so
            #   conv([x∥m∥s]) = x·Wx + (m·Wm + s·Ws + b)  (exact algebra).
            _ = blk.conv(jnp.zeros((1, 1, 3 * C), x.dtype))   # bind (DCE'd)
            w = blk.conv.variables["params"]["Conv_0"]["kernel"]   # [1,3C,A]
            bias = blk.conv.variables["params"]["Conv_0"]["bias"]
            ctx = (mean @ w[0, C:2 * C] + std @ w[0, 2 * C:]
                   + bias)[:, None, :]                       # [B, 1, A]
            attn = blk.norm(jax.nn.relu(x @ w[0, :C] + ctx), train=train)
        else:
            attn = blk(x, train=train)
        attn = Conv1d(C, 1)(jnp.tanh(attn))
        attn = jnp.where(mask == 0, -jnp.inf, attn)
        attn = jax.nn.softmax(attn, axis=1)

        mean, std = statistics(x, attn)
        return jnp.concatenate([mean, std], axis=-1)         # [B, 2C]


class SERes2NetBlock(nn.Module):
    """TDNN → Res2Net → TDNN → SE with residual shortcut.

    Parity: src/models/ECAPA_TDNN.py:263-337.
    """
    features: int
    res2net_scale: int = 8
    se_channels: int = 128
    kernel_size: int = 1
    dilation: int = 1
    activation: Callable = gelu_exact
    conv_backend: str = "xla"          # forwarded to Res2NetBlock

    @nn.compact
    def __call__(self, x: jax.Array, lengths: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        residual = x
        if x.shape[-1] != self.features:
            residual = Conv1d(self.features, 1)(x)
        x = TDNNBlock(self.features, 1, 1, activation=self.activation)(x, train=train)
        # reference does NOT forward the activation into Res2NetBlock
        x = Res2NetBlock(self.features, self.res2net_scale, self.kernel_size,
                         self.dilation, backend=self.conv_backend)(x, train=train)
        x = TDNNBlock(self.features, 1, 1, activation=self.activation)(x, train=train)
        x = SEBlock(self.se_channels, self.features)(x, lengths)
        return x + residual


class StatisticsPooling(nn.Module):
    """Plain mean∥std pooling (parity: src/models/layers/pooling.py Statistics)."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        mean = x.mean(axis=1)
        std = jnp.sqrt(jnp.clip(x.var(axis=1), self.eps))
        return jnp.concatenate([mean, std], axis=-1)


class SelfAttentionPooling(nn.Module):
    """SAP head (parity: src/models/ResNetBaseline.py:196 SAP branch)."""
    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: [B, L, C]
        h = jnp.tanh(nn.Dense(self.features)(x))
        w = self.param("attention", nn.initializers.xavier_normal(),
                       (self.features, 1))
        attn = jax.nn.softmax(h @ w, axis=1)                 # [B, L, 1]
        return (x * attn).sum(axis=1)
