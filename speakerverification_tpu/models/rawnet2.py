"""RawNet2 raw-waveform speaker encoder (Flax, channels-last).

Parity target: src/models/RawNet_baseline.py:485-571 — sample-axis
LayerNorm, SincConv(128, 251) frontend (|·| + maxpool 3 + BN + lrelu0.3),
six FRM residual blocks ([128,128]×2 then [128,256],[256,256]×3), BN +
lrelu, GRU(1024), last hidden state → linear embedding.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from speakerverification_tpu.models.rawnet_blocks import (
    ResidualBlockFRM,
    leaky_relu_03,
    max_pool1d,
)
from speakerverification_tpu.ops.sinc import SincConv
from speakerverification_tpu.registry import MODELS

__all__ = ["RawNet2"]


class SampleLayerNorm(nn.Module):
    """The reference's custom LayerNorm (RawNet_baseline.py:13-24):
    per-sample-position affine, UNBIASED std (torch ``Tensor.std``), and
    eps added to the std (not the variance)."""
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:          # [B, T]
        gamma = self.param("gamma", nn.initializers.ones, (x.shape[-1],))
        beta = self.param("beta", nn.initializers.zeros, (x.shape[-1],))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        std = jnp.sqrt(jnp.var(x, axis=-1, keepdims=True, ddof=1))
        return gamma * (x - mean) / (std + self.eps) + beta


class RawNet2(nn.Module):
    """Embedding = ``fc1_gru`` output; the reference's fc2_gru/sig are
    dead code in forward (RawNet_baseline.py:528-534,562-563) and its
    fc1 width is the hard-coded nb_fc_node=512, so nOut here plays the
    nb_fc_node role."""
    nOut: int = 512
    first_filters: int = 128
    block_filters: Tuple[Tuple[int, int], ...] = (
        (128, 128), (128, 128), (128, 256), (256, 256), (256, 256), (256, 256))
    first_conv_size: int = 251
    gru_node: int = 1024
    nb_gru_layer: int = 1
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """``x``: raw waveform [B, T] → embeddings [B, nOut]."""
        x = SampleLayerNorm()(x)

        # SincNet frontend: mel init from 10 Hz and the linspace window
        # grid (SincConv_fast, RawNet_baseline.py:297,313-314)
        x = SincConv(self.first_filters, self.first_conv_size,
                     sample_rate=self.sample_rate, init_low_hz=10.0,
                     window_grid="linspace")(x)              # [B, F, 128]
        x = max_pool1d(jnp.abs(x), 3)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = leaky_relu_03(x)

        for i, (fin, fout) in enumerate(self.block_filters):
            x = ResidualBlockFRM(fin, fout, first=(i == 0))(x, train=train)

        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = leaky_relu_03(x)

        for _ in range(self.nb_gru_layer):
            x = nn.RNN(nn.GRUCell(features=self.gru_node))(x)  # [B, L, H]
        x = x[:, -1, :]                                        # last timestep
        return nn.Dense(self.nOut)(x)


@MODELS.register("RawNet2", aliases=("RawNet_baseline",))
def build_rawnet2(nOut: int = 512, **kwargs) -> RawNet2:
    """MainModel parity (src/models/RawNet_baseline.py:566-571)."""
    sr = int(kwargs.get("sample_rate",
                        (kwargs.get("audio_spec") or {}).get("sample_rate",
                                                             16000)))
    return RawNet2(nOut=nOut, sample_rate=sr)
