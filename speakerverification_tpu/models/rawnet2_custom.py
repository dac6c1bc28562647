"""RawNet2 with pluggable frontend and aggregation (Flax).

Parity target: src/models/RawNet2_custom.py:18-253 — front_proc
'sinc' (LayerNorm + SincConv + |·| + maxpool3 + BN + lrelu) or 'conv'
(strided conv), six pre-activation RawNetBasicBlock layer groups
(layers=[1,1,1,2,1,2], filters=[128,128,256,256,512,512], last block of
each group downsampled by maxpool 3), and aggregation 'gru' (last hidden
state), 'asp' (attentive stats pooling) or 'sap'.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from speakerverification_tpu.models.rawnet2 import SampleLayerNorm
from speakerverification_tpu.models.rawnet_blocks import (
    RawNetBasicBlock,
    leaky_relu_03,
    max_pool1d,
)
from speakerverification_tpu.ops.sinc import SincConv
from speakerverification_tpu.registry import MODELS

__all__ = ["RawNet2Custom"]


class RawNet2Custom(nn.Module):
    nOut: int = 512
    layers: Tuple[int, ...] = (1, 1, 1, 2, 1, 2)
    filters: Tuple[int, ...] = (128, 128, 256, 256, 512, 512)
    front_proc: str = "sinc"        # 'sinc' | 'conv'
    aggregate: str = "asp"          # 'asp' | 'gru' | 'sap'
    att_dim: int = 128
    gru_node: int = 1024
    nb_gru_layers: int = 1
    first_conv_size: int = 251
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """``x``: raw waveform [B, T] → embeddings [B, nOut]."""
        if self.front_proc == "conv":
            x = nn.Conv(self.filters[0], (3,), strides=(3,),
                        padding="VALID")(x[:, :, None])
        elif self.front_proc == "sinc":
            # the reference's custom sample LayerNorm + SincConv_fast
            # (RawNet2_custom.py:53-69: same classes as RawNet_baseline)
            x = SampleLayerNorm()(x)
            x = SincConv(self.filters[0], self.first_conv_size,
                         sample_rate=self.sample_rate, init_low_hz=10.0,
                         window_grid="linspace")(x)
            x = max_pool1d(jnp.abs(x), 3)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            x = leaky_relu_03(x)                # self.lrelu = LeakyReLU(0.3)
        else:
            raise ValueError(f"unknown front_proc {self.front_proc!r}")

        # six layer groups; last block of each group downsamples (maxpool 3)
        for planes, n_blocks in zip(self.filters, self.layers):
            for b in range(n_blocks):
                x = RawNetBasicBlock(planes,
                                     downsample=(b == n_blocks - 1))(
                    x, train=train)

        if self.aggregate == "gru":
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            x = leaky_relu_03(x)
            for _ in range(self.nb_gru_layers):
                x = nn.RNN(nn.GRUCell(features=self.gru_node))(x)
            x = x[:, -1, :]
            return nn.Dense(self.nOut)(x)

        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = leaky_relu_03(x)

        if self.aggregate == "sap":
            # Classic_Attention (RawNet_baseline.py:423-436): weights =
            # softmax(tanh((x @ W) · v)) over time; the pooled stats are
            # the reference's quirky mean/sum asymmetry — mean uses
            # torch.mean (divide by T) while variance uses torch.sum
            # (RawNet2_custom.py:147-159) — kept verbatim for parity
            h = nn.Dense(x.shape[-1])(x)
            v = self.param("sap_v", nn.initializers.normal(1.0),
                           (x.shape[-1],))
            w = jax.nn.softmax(jnp.tanh(jnp.einsum("blc,c->bl", h, v)),
                               axis=1)[..., None]
            mean = jnp.mean(x * w, axis=1)
            var = jnp.sum(x * (x * w), axis=1) - mean * mean
            x = jnp.concatenate([mean, var], axis=-1)
            return nn.Dense(self.nOut)(x)

        assert self.aggregate == "asp", f"unknown aggregate {self.aggregate!r}"
        attn = nn.Conv(self.att_dim, (1,))(x)
        attn = jax.nn.leaky_relu(attn, 0.01)
        attn = nn.BatchNorm(use_running_average=not train, momentum=0.9)(attn)
        attn = nn.Conv(x.shape[-1], (1,))(attn)
        w = jax.nn.softmax(attn, axis=1)
        m = jnp.sum(x * w, axis=1)
        s = jnp.sqrt(jnp.clip(jnp.sum((x ** 2) * w, axis=1) - m ** 2, 1e-5))
        x = jnp.concatenate([m, s], axis=-1)
        return nn.Dense(self.nOut)(x)


@MODELS.register("RawNet2_custom")
def build_rawnet2_custom(nOut: int = 512, front_proc: str = "sinc",
                         aggregate: str = "gru", att_dim: int = 128,
                         **kwargs) -> RawNet2Custom:
    """MainModel parity (src/models/RawNet2_custom.py:230-253)."""
    sr = int(kwargs.get("sample_rate",
                        (kwargs.get("audio_spec") or {}).get("sample_rate",
                                                             16000)))
    return RawNet2Custom(nOut=nOut, front_proc=front_proc,
                         aggregate=aggregate, att_dim=att_dim,
                         sample_rate=sr)
