"""Thin-ResNet SE speaker encoders over mel 'images' (NHWC).

Parity targets:
* ``ResNetSE`` trunk + SAP/ASP heads — src/models/ResNetBaseline.py:141-301
  (conv3x3 stem, four SE layer groups with (2,2) strides from group 2,
  freq-flattened attentive pooling over time, linear to embedding; log +
  CMN + non-affine instance norm on mel input, :246-251).
* SE blocks — src/models/blocks/ResNetBlocks.py:178-301 (SEBasicBlock,
  pre-activation SEBasicBlockV2, SEBottleneck ×4 expansion, SELayer with
  reduction 16 and bias-free excitation MLP).
* Config wrappers — src/models/ResNetSE{34,34V2,50,50V2,100m2,101,152}.py.

Layout: input features ``[B, frames, n_mels]`` → image ``[B, n_mels,
frames, 1]`` (NHWC); the attention/pooling path flattens frequency into
channels exactly like the reference's ``reshape(B, C·mels/8, T/8)``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from speakerverification_tpu.registry import MODELS

__all__ = ["ResNetSE", "SEBasicBlock", "SEBasicBlockV2", "SEBottleneck"]


class SELayer(nn.Module):
    """Squeeze-excitation. The reference has TWO variants: the basic-block
    family uses bias-free ``c/reduction`` excitation
    (src/models/blocks/ResNetBlocks.py:301-313), while the bottleneck
    family (ResNetSE50/101/152 import the ROOT src/models/ResNetBlocks.py)
    uses Linear layers WITH bias and a FIXED ``internal`` width — the
    ``reduction`` argument is passed as the neuron count
    (ResNetBlocks.py:292-307, SEBottleneck :264)."""
    reduction: int = 16
    internal: int = 0                  # >0: fixed width (root-file variant)
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        width = self.internal if self.internal > 0 else max(
            c // self.reduction, 1)
        y = x.mean(axis=(1, 2))                       # squeeze over H, W
        y = jax.nn.relu(nn.Dense(width, use_bias=self.use_bias)(y))
        y = jax.nn.sigmoid(nn.Dense(c, use_bias=self.use_bias)(y))
        return x * y[:, None, None, :]


def _bn(train):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9)


class SEBasicBlock(nn.Module):
    expansion = 1
    planes: int
    stride: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x, train=False):
        residual = x
        out = nn.Conv(self.planes, (3, 3), self.stride,
                      padding=((1, 1), (1, 1)),
                      use_bias=False)(x)
        out = _bn(train)(out)
        out = jax.nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False)(out)
        out = _bn(train)(out)
        out = SELayer()(out)
        if self.stride != (1, 1) or x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1, 1), self.stride,
                               use_bias=False)(x)
            residual = _bn(train)(residual)
        return jax.nn.relu(out + residual)


class SEBasicBlockV2(nn.Module):
    """Pre-activation variant (Interspeech'21 DF-ResNet lineage).

    Defined in the ROOT ResNetBlocks.py (:211-246), so its SE is that
    file's SELayer — biased Linears with a FIXED 16-neuron squeeze
    (``SELayer(planes, reduction)`` binds 16 to ``internal_neurons``,
    :292-307) — unlike SEBasicBlock's bias-free c/16 excitation from
    blocks/ResNetBlocks.py."""
    expansion = 1
    planes: int
    stride: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x, train=False):
        residual = x
        out = jax.nn.relu(x)
        out = nn.Conv(self.planes, (3, 3), self.stride,
                      padding=((1, 1), (1, 1)),
                      use_bias=False)(out)
        out = _bn(train)(out)
        out = jax.nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False)(out)
        out = _bn(train)(out)
        out = SELayer(internal=16, use_bias=True)(out)
        if self.stride != (1, 1) or x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1, 1), self.stride,
                               use_bias=False)(x)
            residual = _bn(train)(residual)
        return jax.nn.relu(out + residual)


class SEBottleneck(nn.Module):
    expansion = 4
    planes: int
    stride: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x, train=False):
        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False)(x)
        out = jax.nn.relu(_bn(train)(out))
        out = nn.Conv(self.planes, (3, 3), self.stride,
                      padding=((1, 1), (1, 1)),
                      use_bias=False)(out)
        out = jax.nn.relu(_bn(train)(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False)(out)
        out = _bn(train)(out)
        # root-file SE variant: biased, fixed 16-neuron excitation
        out = SELayer(internal=16, use_bias=True)(out)
        out_ch = self.planes * 4
        if self.stride != (1, 1) or x.shape[-1] != out_ch:
            residual = nn.Conv(out_ch, (1, 1), self.stride,
                               use_bias=False)(x)
            residual = _bn(train)(residual)
        return jax.nn.relu(out + residual)


_BLOCKS = {"basic": SEBasicBlock, "basicv2": SEBasicBlockV2,
           "bottleneck": SEBottleneck}


class ResNetSE(nn.Module):
    nOut: int = 256
    block: str = "basic"
    layers: Sequence[int] = (3, 4, 6, 3)
    num_filters: Sequence[int] = (32, 64, 128, 256)
    encoder_type: str = "ASP"        # 'ASP' | 'SAP'
    att_dim: int = 128
    n_mels: int = 80
    log_input: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """``x``: features [B, frames, n_mels] → embeddings [B, nOut]."""
        block_cls = _BLOCKS[self.block]

        if self.log_input:
            x = jnp.log(jnp.maximum(x, 0.0) + 1e-6)  # clamp: the reference NaNs here when SpecAugment's bicubic warp overshoots negative
            x = x - jnp.mean(x, axis=1, keepdims=True)
        # non-affine instance norm per mel channel over time
        # (parity: ResNetBaseline.py:185,251 InstanceNorm1d(n_mels))
        x = (x - jnp.mean(x, axis=1, keepdims=True)) / jnp.sqrt(
            jnp.var(x, axis=1, keepdims=True) + 1e-5)

        img = jnp.transpose(x, (0, 2, 1))[..., None]   # [B, mels, T, 1]

        h = nn.Conv(self.num_filters[0], (3, 3),
                    padding=((1, 1), (1, 1)))(img)
        h = jax.nn.relu(h)
        h = _bn(train)(h)

        for gi, (planes, n_blocks) in enumerate(
                zip(self.num_filters, self.layers)):
            for bi in range(n_blocks):
                stride = (2, 2) if gi > 0 and bi == 0 else (1, 1)
                h = block_cls(planes, stride)(h, train=train)

        # flatten frequency into channels: [B, T', C * mels']
        B, F, T, C = h.shape
        h = jnp.transpose(h, (0, 2, 3, 1)).reshape(B, T, C * F)

        attn = nn.Conv(self.att_dim, (1,))(h)
        attn = jax.nn.relu(attn)
        attn = _bn(train)(attn)
        attn = nn.Conv(h.shape[-1], (1,))(attn)
        w = jax.nn.softmax(attn, axis=1)

        if self.encoder_type == "SAP":
            pooled = jnp.sum(h * w, axis=1)
        elif self.encoder_type == "ASP":
            mu = jnp.sum(h * w, axis=1)
            sg = jnp.sqrt(jnp.clip(jnp.sum((h ** 2) * w, axis=1) - mu ** 2,
                                   1e-5))
            pooled = jnp.concatenate([mu, sg], axis=-1)
        else:
            raise ValueError(f"unknown encoder_type {self.encoder_type!r}")

        return nn.Dense(self.nOut)(pooled)


def _register(name: str, block: str, layers, filters, default_nout: int):
    @MODELS.register(name)
    def build(nOut: int = default_nout, **kwargs) -> ResNetSE:
        feature_type = kwargs.get("feature_type",
                                  kwargs.get("features", "melspectrogram"))
        return ResNetSE(nOut=nOut, block=block, layers=tuple(layers),
                        num_filters=tuple(filters),
                        encoder_type=kwargs.get("encoder_type", "ASP"),
                        n_mels=int(kwargs.get("n_mels", 80)),
                        log_input=(feature_type == "melspectrogram"))
    build.__name__ = f"build_{name.lower()}"
    build.__doc__ = f"MainModel parity: src/models/{name}.py"
    return build


# Config wrappers (parity: src/models/ResNetSE*.py MainModel defaults)
_register("ResNetSE34", "basic", (3, 4, 6, 3), (32, 64, 128, 256), 256)
_register("ResNetSE34V2", "basicv2", (3, 4, 6, 3), (32, 64, 128, 256), 256)
_register("ResNetSE50", "bottleneck", (3, 4, 6, 3), (32, 64, 128, 256), 512)
_register("ResNetSE50V2", "bottleneck", (3, 4, 6, 3), (32, 64, 128, 256), 512)
_register("ResNetSE100m2", "bottleneck", (6, 16, 24, 3),
          (128, 128, 256, 256), 256)
_register("ResNetSE101", "bottleneck", (3, 4, 23, 3), (64, 128, 256, 512), 512)
_register("ResNetSE152", "bottleneck", (3, 8, 36, 3), (64, 128, 256, 512), 512)
