"""TDFbanks: learnable time-domain filterbank frontend (Flax).

Parity target: src/models/FeatureExtraction/TDFbanks/tdfbanks.py:20-120
(Zeghidour et al., "Learning filterbanks from raw speech"): optional
fixed pre-emphasis conv → complex Gabor conv (2·nfilters channels,
learnable in 'learnfbanks' mode) → squared-modulus (L2 pooling of
real/imag pairs) → per-filter lowpass conv with stride (fixed window) →
log compression → optional instance norm (mvn).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from speakerverification_tpu.ops.frontend import hz_to_mel, mel_to_hz

__all__ = ["TDFbanks"]


def _gabor_init(nfilters: int, sample_rate: int, window_size: int,
                min_freq: float = 0.0, max_freq: float | None = None,
                ) -> np.ndarray:
    """Mel-spaced complex Gabor kernels → real conv weights [k, 1, 2*n]."""
    max_freq = max_freq or sample_rate / 2
    mels = np.linspace(hz_to_mel(min_freq, "htk"), hz_to_mel(max_freq, "htk"),
                       nfilters + 2)
    hz = mel_to_hz(mels, "htk")
    centers = hz[1:-1]
    fwhms = (hz[2:] - hz[:-2]) / 2.0

    t = np.arange(-(window_size // 2), window_size // 2 + 1)
    kernels = np.zeros((window_size, 1, 2 * nfilters), np.float32)
    for i, (c, bw) in enumerate(zip(centers, fwhms)):
        sigma_t = sample_rate / (2.0 * math.pi * max(bw, 1.0))
        gauss = np.exp(-0.5 * (t / sigma_t) ** 2)
        gauss /= np.sqrt(2 * math.pi) * sigma_t
        phase = 2 * math.pi * c / sample_rate * t
        kernels[:, 0, 2 * i] = (gauss * np.cos(phase)).astype(np.float32)
        kernels[:, 0, 2 * i + 1] = (gauss * np.sin(phase)).astype(np.float32)
    return kernels


class TDFbanks(nn.Module):
    nfilters: int = 40
    sample_rate: int = 16000
    wlen_ms: int = 25
    wstride_ms: int = 10
    compression: str = "log"
    preemp: bool = False
    mvn: bool = False
    mode: str = "learnfbanks"       # 'Fixed' | 'learnfbanks'

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """``x``: raw waveform [B, T] → features [B, frames, nfilters]."""
        window_size = self.sample_rate * self.wlen_ms // 1000 + 1
        window_stride = self.sample_rate * self.wstride_ms // 1000

        if self.preemp:
            x = jnp.concatenate([x[:, :1], x[:, 1:] - 0.97 * x[:, :-1]],
                                axis=-1)

        init = _gabor_init(self.nfilters, self.sample_rate, window_size)
        if self.mode == "Fixed":
            kernel = jnp.asarray(init)
        else:
            kernel = self.param("gabor_kernel", lambda rng: jnp.asarray(init))
        h = jax.lax.conv_general_dilated(
            x[:, :, None], kernel, (1,), "SAME",
            dimension_numbers=("NWC", "WIO", "NWC"))          # [B, T, 2n]

        # squared modulus: L2 pool over (real, imag) channel pairs
        h = h.reshape(h.shape[0], h.shape[1], self.nfilters, 2)
        h = jnp.sqrt(jnp.sum(h ** 2, axis=-1) + 1e-12)        # [B, T, n]

        # fixed per-filter lowpass with stride (hanning window)
        k = np.arange(window_size)
        win = (0.5 - 0.5 * np.cos(2 * np.pi * k / (window_size - 1))
               ).astype(np.float32)
        lp = jnp.asarray(np.tile(win[:, None, None], (1, 1, self.nfilters)))
        h = jax.lax.conv_general_dilated(
            h, lp, (window_stride,), "VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.nfilters)                # [B, F, n]

        if self.compression == "log":
            h = jnp.log(jnp.abs(h) + 1.0)
        if self.mvn:
            h = (h - h.mean(axis=1, keepdims=True)) / jnp.sqrt(
                h.var(axis=1, keepdims=True) + 1e-5)
        return h
