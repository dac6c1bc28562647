"""Parameterized sinc band-pass filterbank (SincNet-style) in Flax.

TPU-native equivalent of the reference's two sinc frontends:
``SincConv_fast`` (src/models/RawNet_baseline.py:235-363, SincNet) and
asteroid's ``ParamSincFB`` used by RawNet3 (src/models/RawNet3.py:37-43).
Filters are band-passes parameterized by learnable (low, band) pairs,
mel-initialized, materialized each forward as a dense ``[k, 1, C]``
kernel so the filter build fuses with the conv in one XLA program.

The convolution is VALID with stride (matching SincConv_fast defaults:
padding=0), input ``[B, T]`` → output ``[B, frames, C]`` (channels-last).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SincConv", "sinc_init_frequencies"]


def _hz_to_mel_htk(hz):
    return 2595.0 * np.log10(1.0 + hz / 700.0)


def _mel_to_hz_htk(mel):
    return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)


def sinc_init_frequencies(out_channels: int, sample_rate: int,
                          min_low_hz: float = 50.0, min_band_hz: float = 50.0,
                          low_hz: float = 30.0):
    """Mel-spaced initial (low_hz, band_hz) pairs (SincNet init).

    ``low_hz=30`` for the asteroid-style RawNet3 frontend; the
    SincConv_fast frontend starts at 10 Hz
    (src/models/RawNet_baseline.py:297)."""
    high_hz = sample_rate / 2.0 - (min_low_hz + min_band_hz)
    mel = np.linspace(_hz_to_mel_htk(low_hz), _hz_to_mel_htk(high_hz),
                      out_channels + 1)
    hz = _mel_to_hz_htk(mel)
    return hz[:-1].astype(np.float32), np.diff(hz).astype(np.float32)


class SincConv(nn.Module):
    out_channels: int
    kernel_size: int = 251
    stride: int = 1
    sample_rate: int = 16000
    min_low_hz: float = 50.0
    min_band_hz: float = 50.0
    padding: str = "VALID"
    init_low_hz: float = 30.0
    # "arange": integer window grid (asteroid-style, RawNet3);
    # "linspace": SincConv_fast's half-window linspace(0, k/2-1, k//2)
    # grid with non-integer step (RawNet_baseline.py:313-314)
    window_grid: str = "arange"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """``x``: [B, T] → [B, frames, out_channels]."""
        assert self.kernel_size % 2 == 1, "kernel_size must be odd"
        low_init, band_init = sinc_init_frequencies(
            self.out_channels, self.sample_rate,
            self.min_low_hz, self.min_band_hz, low_hz=self.init_low_hz)
        low_hz = self.param("low_hz", lambda rng: jnp.asarray(low_init))
        band_hz = self.param("band_hz", lambda rng: jnp.asarray(band_init))
        # filter CONSTRUCTION always runs fp32 — under a bf16 step the
        # params arrive cast down, and Hz-scale frequencies lose real
        # precision in bf16; the conv itself then runs in the wave's
        # dtype (under mixedprec the reference's torch AMP also runs
        # this conv1d in half precision, src/models/Raw3_ECAPA.py:50)
        low_hz = low_hz.astype(jnp.float32)
        band_hz = band_hz.astype(jnp.float32)

        low = self.min_low_hz + jnp.abs(low_hz)                       # [C]
        high = jnp.clip(low + self.min_band_hz + jnp.abs(band_hz),
                        self.min_low_hz, self.sample_rate / 2.0)
        band = (high - low)[:, None]                                  # [C, 1]

        half = (self.kernel_size - 1) // 2
        n_left = 2.0 * math.pi * jnp.arange(-half, 0.0) / self.sample_rate
        # half hamming window over the left lobe
        if self.window_grid == "linspace":
            grid = jnp.linspace(0.0, self.kernel_size / 2.0 - 1.0,
                                self.kernel_size // 2)
        else:
            grid = jnp.arange(half, dtype=jnp.float32)
        window = 0.54 - 0.46 * jnp.cos(
            2.0 * math.pi * grid / self.kernel_size)

        f_low = low[:, None] * n_left[None, :]                         # [C, half]
        f_high = high[:, None] * n_left[None, :]
        left = (jnp.sin(f_high) - jnp.sin(f_low)) / (n_left[None, :] / 2.0)
        left = left * window[None, :]
        center = 2.0 * band
        filters = jnp.concatenate(
            [left, center, jnp.flip(left, axis=1)], axis=1)           # [C, k]
        filters = filters / (2.0 * band)

        kernel = filters.T[:, None, :].astype(x.dtype)                # [k, 1, C]
        return jax.lax.conv_general_dilated(
            x[:, :, None], kernel, window_strides=(self.stride,),
            padding=self.padding,
            dimension_numbers=("NWC", "WIO", "NWC"))
