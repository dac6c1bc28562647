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


def _mel_triangle_prototypes(nfilters: int, min_freq: float, max_freq: float,
                             fs: int, nfft: int) -> np.ndarray:
    """Triangular mel prototypes on the DFT grid, reproducing the
    reference's rounded-edge construction (TDFbanks/melfilters.py
    ``_build_mels``): edges in Hz on an equal-mel grid, snapped with
    ``round`` to DFT bins, unit height at the (snapped) center."""
    dfreq = fs / nfft
    mel_lo, mel_hi = hz_to_mel(min_freq, "htk"), hz_to_mel(max_freq, "htk")
    edges_hz = mel_to_hz(
        mel_lo + (mel_hi - mel_lo) / (nfilters + 1)
        * np.arange(nfilters + 2, dtype=np.float64), "htk")
    n_bins = nfft // 2 + 1
    filters = np.zeros((nfilters, n_bins))
    k = np.arange(n_bins, dtype=np.float64)
    for i in range(nfilters):
        lo = min(round(edges_hz[i] / dfreq), nfft // 2)
        ctr = min(round(edges_hz[i + 1] / dfreq), nfft // 2)
        hi = min(round(edges_hz[i + 2] / dfreq), nfft // 2)
        if ctr > lo:
            rise = (k > lo) & (k < ctr)
            filters[i, rise] = (k[rise] - lo) / (ctr - lo)
            filters[i, ctr] = 1.0
        if hi > ctr:
            fall = (k > ctr) & (k < hi)
            filters[i, fall] = (k[fall] - hi) / (ctr - hi)
    return filters


def _gabor_init(nfilters: int, sample_rate: int, window_size: int,
                min_freq: float = 0.0, max_freq: float | None = None,
                nfft: int = 512) -> np.ndarray:
    """Complex Gabor kernels → conv weights ``[k, 1, 2*n]``, reproducing
    the reference's ``initialize()`` exactly (TDFbanks/melfilters.py
    ``Gabor``): each mel triangle's sqrt is summarized by its argmax
    center and half-magnitude width, mapped to a Gabor wavelet of
    center frequency ``argmax·2π/nfft`` rad/sample and
    ``σ = √(2ln2)·nfft/(π·width)``, then renormalized by
    ``√(filter_energy · 2√π · σ)``."""
    max_freq = max_freq if max_freq is not None else sample_rate / 2
    mels = _mel_triangle_prototypes(nfilters, min_freq, max_freq,
                                    sample_rate, nfft)
    half_t = (window_size - 1) // 2
    t = np.arange(-half_t, half_t + 1, dtype=np.float64)
    kernels = np.zeros((window_size, 1, 2 * nfilters), np.float32)
    for i in range(nfilters):
        mag = np.sqrt(mels[i])
        center = int(np.argmax(mag))
        spread = np.flatnonzero(mag >= mag[center] / 2.0)
        width = max(spread[-1] - spread[0], 1)
        eta = center * 2.0 * math.pi / nfft               # rad / sample
        sigma = math.sqrt(2.0 * math.log(2.0)) * nfft / (math.pi * width)
        # energy = area under the triangle's magnitude spectrum
        energy = (0.5 * mels[i].max()
                  * (np.count_nonzero(mels[i] > 0) + 2) * 2 * math.pi / nfft)
        gauss = np.exp(-t ** 2 / (2.0 * sigma ** 2)) / (
            math.sqrt(2.0 * math.pi) * sigma)
        scale = math.sqrt(energy * 2.0 * math.sqrt(math.pi) * sigma)
        kernels[:, 0, 2 * i] = (scale * gauss * np.cos(eta * t)
                                ).astype(np.float32)
        kernels[:, 0, 2 * i + 1] = (scale * gauss * np.sin(eta * t)
                                    ).astype(np.float32)
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
        """``x``: raw waveform [B, T] → features [B, frames, nfilters].

        The whole learnable filterbank is a FEATURIZER and runs pinned
        fp32 (repo policy — the reference excludes feature extraction
        from autocast); under a bf16 step the wave and the cast-down
        gabor params are upcast here and the features drop back to the
        incoming dtype at the end, so the downstream encoder still runs
        on the MXU in bf16."""
        in_dtype = x.dtype
        x = x.astype(jnp.float32)
        window_size = self.sample_rate * self.wlen_ms // 1000 + 1
        window_stride = self.sample_rate * self.wstride_ms // 1000

        if self.preemp:
            # conv [-a, 1] with padding 1 (reference tdfbanks.py:36,99):
            # y[0] = x[0], y[t] = x[t] - a*x[t-1], trailing y[T] = -a*x[T-1]
            x = jnp.concatenate([x[:, :1], x[:, 1:] - 0.97 * x[:, :-1],
                                 -0.97 * x[:, -1:]], axis=-1)

        init = _gabor_init(self.nfilters, self.sample_rate, window_size)
        if self.mode == "Fixed":
            kernel = jnp.asarray(init)
        else:
            kernel = self.param("gabor_kernel", lambda rng: jnp.asarray(init))
        kernel = kernel.astype(jnp.float32)
        h = jax.lax.conv_general_dilated(
            x[:, :, None], kernel, (1,), "SAME",
            dimension_numbers=("NWC", "WIO", "NWC"))          # [B, T, 2n]

        # SQUARED modulus over (real, imag) channel pairs — the
        # reference's avg_pool1d(x², 2)·2 (tdfbanks.py:102-104), no sqrt
        h = h.reshape(h.shape[0], h.shape[1], self.nfilters, 2)
        h = jnp.sum(h ** 2, axis=-1)                          # [B, T, n]

        # fixed per-filter lowpass with stride; the reference's hanning
        # rides a (n-1)-shifted grid (TDFbanks/utils.py:25-26)
        k = np.arange(window_size)
        win = (0.5 - 0.5 * np.cos(2 * np.pi * (k - 1) / (window_size - 1))
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
        return h.astype(in_dtype)
