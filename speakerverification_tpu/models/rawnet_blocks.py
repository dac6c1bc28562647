"""Building blocks of the RawNet family (channels-last).

Parity targets in src/models/RawNet_baseline.py:
* ``AFMS``                (:48-68)  — alpha feature-map scaling
* ``FRM``                 (:162-180) — filter-wise rescale (mul+add)
* ``Bottle2neck``         (:71-160) — Res2-style block w/ AFMS + maxpool
* ``Residual_block_wFRM`` (:364-421) — RawNet2 residual block with FRM
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["AFMS", "FRM", "Bottle2neckRaw", "RawNetBasicBlock",
           "ResidualBlockFRM", "max_pool1d", "leaky_relu_03"]


def max_pool1d(x: jax.Array, pool: int) -> jax.Array:
    """Non-overlapping temporal max pooling on [B, L, C] (torch MaxPool1d)."""
    return nn.max_pool(x, window_shape=(pool,), strides=(pool,))


def leaky_relu_03(x):
    return jax.nn.leaky_relu(x, negative_slope=0.3)


class AFMS(nn.Module):
    """x = (x + alpha) * sigmoid(fc(avgpool(x)))."""
    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = jax.nn.sigmoid(nn.Dense(self.features)(x.mean(axis=1)))
        alpha = self.param("alpha", nn.initializers.ones, (self.features,))
        return (x + alpha) * y[:, None, :]


class FRM(nn.Module):
    """Filter-wise rescaling: y = sigmoid(fc(avgpool)); x*y (+y)."""
    features: int
    do_add: bool = True
    do_mul: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = jax.nn.sigmoid(nn.Dense(self.features)(x.mean(axis=1)))[:, None, :]
        if self.do_mul:
            x = x * y
        if self.do_add:
            x = x + y
        return x


class Bottle2neckRaw(nn.Module):
    """Res2-style bottleneck with relu→BN ordering, AFMS and optional
    maxpool (parity: RawNet_baseline.py:71-160; used by RawNet3)."""
    planes: int
    kernel_size: int = 3
    dilation: int = 1
    scale: int = 4
    pool: Optional[int] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        width = self.planes // self.scale
        inplanes = x.shape[-1]

        residual = x
        if inplanes != self.planes:
            residual = nn.Conv(self.planes, (1,), use_bias=False)(x)

        out = nn.Conv(width * self.scale, (1,))(x)
        out = jax.nn.relu(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9)(out)

        chunks = jnp.split(out, self.scale, axis=-1)
        outs = []
        sp = None
        for i in range(self.scale - 1):
            sp = chunks[i] if i == 0 else sp + chunks[i]
            sp = nn.Conv(width, (self.kernel_size,),
                         kernel_dilation=(self.dilation,), padding="SAME")(sp)
            sp = jax.nn.relu(sp)
            sp = nn.BatchNorm(use_running_average=not train, momentum=0.9)(sp)
            outs.append(sp)
        outs.append(chunks[-1])                    # last group passes through
        out = jnp.concatenate(outs, axis=-1)

        out = nn.Conv(self.planes, (1,))(out)
        out = jax.nn.relu(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9)(out)

        out = out + residual
        if self.pool:
            out = max_pool1d(out, self.pool)
        return AFMS(self.planes)(out)


class RawNetBasicBlock(nn.Module):
    """Pre-activation residual block with AFMS and optional maxpool(3)
    downsample (parity: RawNet_baseline.py:182-233)."""
    planes: int
    downsample: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        out = leaky_relu_03(out)
        shortcut = x
        if x.shape[-1] != self.planes:
            shortcut = nn.Conv(self.planes, (1,), use_bias=False)(out)
        out = nn.Conv(self.planes, (3,), padding="SAME", use_bias=False)(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9)(out)
        out = nn.Conv(self.planes, (3,), padding="SAME",
                      use_bias=False)(leaky_relu_03(out))
        out = out + shortcut
        if self.downsample:
            out = max_pool1d(out, 3)
        return AFMS(self.planes)(out)


class ResidualBlockFRM(nn.Module):
    """RawNet2 residual block: (BN→lrelu)? → conv → BN → lrelu → conv →
    +shortcut → maxpool(3) → FRM (parity: RawNet_baseline.py:364-421)."""
    in_filters: int
    out_filters: int
    first: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        out = x
        if not self.first:
            out = nn.BatchNorm(use_running_average=not train, momentum=0.9)(out)
            out = leaky_relu_03(out)
        identity = x
        out = nn.Conv(self.out_filters, (3,), padding="SAME")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9)(out)
        out = leaky_relu_03(out)
        out = nn.Conv(self.out_filters, (3,), padding="SAME")(out)
        if self.in_filters != self.out_filters:
            identity = nn.Conv(self.out_filters, (1,))(identity)
        out = out + identity
        out = max_pool1d(out, 3)
        return FRM(self.out_filters)(out)
