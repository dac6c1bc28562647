"""ECAPA-TDNN speaker embedding encoder (Flax, channels-last).

TPU-native rebuild of the reference's SpeechBrain-lineage ECAPA-TDNN
(reference: src/models/ECAPA_TDNN.py:339-513; paper arXiv:2005.07143).
Structure: initial TDNN → 3 SE-Res2Net blocks (dilations 2/3/4) →
multi-layer feature aggregation (concat of block outputs) → TDNN →
attentive statistics pooling → BatchNorm → linear projection to the
embedding dimension.

Differences from the reference by design:
* operates on ``[B, frames, n_mels]`` (channels-last) features;
* log-mel normalization (``log(x + 1e-6)`` then per-utterance CMN,
  reference: src/models/ECAPA_TDNN.py:469-478) is applied here when the
  configured feature type is ``melspectrogram``;
* SpecAugment is applied by the training step (ops/specaugment.py), not
  buried inside the model forward.
"""

from __future__ import annotations

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

__all__ = ["ECAPA_TDNN"]


class ECAPA_TDNN(nn.Module):
    lin_neurons: int = 192
    channels: Sequence[int] = (1024, 1024, 1024, 1024, 3072)
    kernel_sizes: Sequence[int] = (5, 3, 3, 3, 1)
    dilations: Sequence[int] = (1, 2, 3, 4, 1)
    attention_channels: int = 128
    res2net_scale: int = 8
    se_channels: int = 128
    global_context: bool = True
    activation: Callable = gelu_exact
    feature_type: str = "melspectrogram"
    log_input: bool = True
    input_norm: bool = False
    # Res2Net cascade backend: 'pallas' runs the eval-mode cascade as one
    # fused Pallas kernel (ops/pallas_res2net.py); measured AT PAR with
    # XLA's conv lowering on the bench chip (the cascade is bound by
    # per-matmul-instruction overhead, not HBM traffic — see the kernel
    # docstring), so the simpler XLA path stays the default.
    conv_backend: str = "xla"
    # remat: rematerialize each SE-Res2Net block in the backward pass
    # (jax.checkpoint via nn.remat) — activations of the three widest
    # blocks are recomputed instead of stored, trading ~1 extra forward
    # of block FLOPs for the dominant share of activation HBM; combine
    # with accumulate_steps for very large effective batches.
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, lengths: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        """``x``: features ``[B, frames, n_mels]`` → embeddings ``[B, lin_neurons]``."""
        assert len(self.channels) == len(self.kernel_sizes) == len(self.dilations)

        if self.feature_type == "melspectrogram" and self.log_input:
            # log-compression + cepstral mean subtraction over time
            # (parity: src/models/ECAPA_TDNN.py:473-476, stop-gradient there
            # via no_grad; the frontend carries no gradient anyway).
            x = jnp.log(jnp.maximum(x, 0.0) + 1e-6)  # clamp: the reference NaNs here when SpecAugment's bicubic warp overshoots negative
            x = x - jnp.mean(x, axis=1, keepdims=True)
        if self.input_norm:
            # per-utterance instance norm over time with per-mel affine
            # (parity: src/models/ECAPA_TDNN.py:416-419,477-478)
            mean = jnp.mean(x, axis=1, keepdims=True)
            var = jnp.var(x, axis=1, keepdims=True)
            w = self.param("input_norm_scale", nn.initializers.ones,
                           (x.shape[-1],))
            b = self.param("input_norm_bias", nn.initializers.zeros,
                           (x.shape[-1],))
            x = (x - mean) / jnp.sqrt(var + 1e-5) * w + b

        x = TDNNBlock(self.channels[0], self.kernel_sizes[0], self.dilations[0],
                      activation=self.activation)(x, train=train)

        # train is a Python bool — static under jax.checkpoint (flax
        # counts the module itself as argnum 0, so train is argnum 3)
        block_cls = (nn.remat(SERes2NetBlock, static_argnums=(3,))
                     if self.remat else SERes2NetBlock)
        block_outputs = []
        for i in range(1, len(self.channels) - 1):
            x = block_cls(
                self.channels[i],
                res2net_scale=self.res2net_scale,
                se_channels=self.se_channels,
                kernel_size=self.kernel_sizes[i],
                dilation=self.dilations[i],
                activation=self.activation,
                conv_backend=self.conv_backend,
                # pin the unwrapped auto-name: nn.remat's subclass would
                # otherwise rename the scope (Checkpoint...), making
                # remat checkpoints incompatible with remat-off ones
                name=f"SERes2NetBlock_{i - 1}",
            )(x, lengths, train)
            block_outputs.append(x)

        # Multi-layer feature aggregation over the SE-Res2Net outputs
        # (parity: src/models/ECAPA_TDNN.py:488-492 cats xl[1:]).
        x = jnp.concatenate(block_outputs, axis=-1)
        x = TDNNBlock(self.channels[-1], self.kernel_sizes[-1],
                      self.dilations[-1], activation=self.activation)(x, train=train)

        x = AttentiveStatisticsPooling(
            self.attention_channels, self.global_context)(x, lengths, train=train)
        x = BatchNorm1d()(x, train=train)                     # [B, 2*C]
        x = nn.Dense(self.lin_neurons)(x)                     # fc conv1d k=1 ≡ Dense
        return x


@MODELS.register("ECAPA_TDNN")
def build_ecapa_tdnn(nOut: int = 192, **kwargs) -> ECAPA_TDNN:
    """``MainModel`` factory parity (reference: src/models/ECAPA_TDNN.py:505)."""
    known = {k: kwargs[k] for k in (
        "channels", "kernel_sizes", "dilations", "attention_channels",
        "res2net_scale", "se_channels", "global_context", "input_norm",
        "log_input", "activation", "conv_backend", "remat") if k in kwargs}
    if "channels" in known:
        known["channels"] = tuple(known["channels"])
    for k in ("kernel_sizes", "dilations"):
        if k in known:
            known[k] = tuple(known[k])
    feature_type = kwargs.get("feature_type", kwargs.get("features", "melspectrogram"))
    return ECAPA_TDNN(lin_neurons=nOut, feature_type=feature_type, **known)
