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


class RawNet2(nn.Module):
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
        # sample-axis LayerNorm (torch LayerNorm(nb_samp),
        # RawNet_baseline.py:500,541) — normalizes each utterance over time
        # with learnable per-position affine.
        x = nn.LayerNorm(reduction_axes=-1, feature_axes=-1)(x)

        x = SincConv(self.first_filters, self.first_conv_size,
                     sample_rate=self.sample_rate)(x)        # [B, F, 128]
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
