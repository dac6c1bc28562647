"""STFT phase vocoder: time stretch and exact pitch shift (on-device).

Replaces the round-1 resample-and-restore pitch approximation with
``librosa.effects.pitch_shift`` semantics (the reference augments pitch
through librosa, src/processing/augment.py:66-94 and
src/processing/augmentation/pitch_shift.py):

* ``time_stretch(y, rate)`` — phase vocoder over a centered hann STFT
  (librosa.phase_vocoder: per-bin expected phase advance, wrapped phase
  deviation, accumulated synthesis phase, linear magnitude
  interpolation between the two straddling analysis frames);
* ``pitch_shift(y, sr, n_steps)`` — stretch by ``2**(-n/bins)`` then
  Fourier-resample back to the original duration, scaling f0 by
  ``2**(n/bins)`` while preserving length.

Everything is jnp (jit-able with static rate/length), so augmentation
can run on device; the host augment pipeline (data/augment.py) calls it
through numpy transparently.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["stft", "istft", "phase_vocoder", "time_stretch", "pitch_shift",
           "fourier_resample"]


def _hann(n: int) -> jnp.ndarray:
    # periodic hann (librosa/scipy sym=False)
    return 0.5 * (1.0 - jnp.cos(2.0 * math.pi * jnp.arange(n) / n))


def stft(y: jnp.ndarray, n_fft: int = 2048, hop: int = 512) -> jnp.ndarray:
    """Centered hann STFT of ``y [T]`` → complex ``[1+n_fft//2, frames]``."""
    pad = n_fft // 2
    y = jnp.pad(y, (pad, pad), mode="reflect")
    n_frames = 1 + (y.shape[0] - n_fft) // hop
    idx = (np.arange(n_fft)[None, :]
           + hop * np.arange(n_frames)[:, None])          # static gather
    frames = y[idx] * _hann(n_fft)[None, :]
    return jnp.fft.rfft(frames, axis=-1).T                # [bins, frames]


def istft(D: jnp.ndarray, n_fft: int = 2048, hop: int = 512,
          length: int | None = None) -> jnp.ndarray:
    """Inverse of :func:`stft` with window-square OLA normalization."""
    frames = jnp.fft.irfft(D.T, n=n_fft, axis=-1)         # [frames, n_fft]
    win = _hann(n_fft)
    frames = frames * win[None, :]
    n_frames = frames.shape[0]
    out_len = n_fft + hop * (n_frames - 1)

    def ola(x):                                           # [frames, n_fft]
        def body(i, acc):
            return jax.lax.dynamic_update_slice(
                acc, jax.lax.dynamic_slice(acc, (i * hop,), (n_fft,)) + x[i],
                (i * hop,))
        return jax.lax.fori_loop(0, n_frames, body,
                                 jnp.zeros(out_len, x.dtype))

    y = ola(frames)
    wss = ola(jnp.broadcast_to(win ** 2, frames.shape))
    y = y / jnp.maximum(wss, 1e-10)
    pad = n_fft // 2
    y = y[pad:]
    if length is not None:
        y = y[:length]
        y = jnp.pad(y, (0, max(0, length - y.shape[0])))
    return y


def phase_vocoder(D: jnp.ndarray, rate: float,
                  hop: int = 512) -> jnp.ndarray:
    """librosa.phase_vocoder: stretch STFT ``D [bins, frames]`` by ``rate``
    (rate > 1 speeds up). Static ``rate`` → static output frame count."""
    n_bins, n_frames = D.shape
    n_fft = 2 * (n_bins - 1)
    time_steps = np.arange(0, n_frames, rate)             # static
    phi_advance = jnp.linspace(0, math.pi * hop, n_bins)

    idx0 = np.minimum(time_steps.astype(int), n_frames - 1)
    idx1 = np.minimum(idx0 + 1, n_frames - 1)
    alpha = jnp.asarray(time_steps - np.floor(time_steps),
                        dtype=D.real.dtype)

    c0 = D[:, idx0]                                       # [bins, steps]
    c1 = D[:, idx1]
    mag = (1.0 - alpha)[None, :] * jnp.abs(c0) + alpha[None, :] * jnp.abs(c1)

    # wrapped per-step phase deviation → accumulated synthesis phase
    dphase = jnp.angle(c1) - jnp.angle(c0) - phi_advance[:, None]
    dphase = dphase - 2.0 * math.pi * jnp.round(dphase / (2.0 * math.pi))
    inc = phi_advance[:, None] + dphase
    phase0 = jnp.angle(D[:, :1])
    phase = phase0 + jnp.concatenate(
        [jnp.zeros_like(inc[:, :1]), jnp.cumsum(inc, axis=1)[:, :-1]], axis=1)
    return mag * jnp.exp(1j * phase)


def fourier_resample(y: jnp.ndarray, num: int) -> jnp.ndarray:
    """scipy.signal.resample-style FFT resampling of ``y [T]`` to ``num``."""
    n = y.shape[0]
    Y = jnp.fft.rfft(y)
    n_out_bins = num // 2 + 1
    if n_out_bins <= Y.shape[0]:
        Y = Y[:n_out_bins]
    else:
        Y = jnp.pad(Y, (0, n_out_bins - Y.shape[0]))
    return jnp.fft.irfft(Y, n=num) * (num / n)


@partial(jax.jit, static_argnames=("rate", "n_fft", "hop"))
def time_stretch(y: jnp.ndarray, rate: float, n_fft: int = 2048,
                 hop: int = 512) -> jnp.ndarray:
    """Stretch ``y`` to duration ``len(y)/rate`` at constant pitch."""
    D = stft(y, n_fft, hop)
    D2 = phase_vocoder(D, rate, hop)
    return istft(D2, n_fft, hop, length=int(round(y.shape[0] / rate)))


@partial(jax.jit, static_argnames=("sr", "n_steps", "bins_per_octave",
                                   "n_fft", "hop", "length"))
def _pitch_shift_fixed(y, sr, n_steps, bins_per_octave, n_fft, hop, length):
    rate = 2.0 ** (-float(n_steps) / bins_per_octave)
    stretched = time_stretch(y, rate, n_fft, hop)
    out = fourier_resample(stretched, length)
    return out


def pitch_shift(y, sr: int, n_steps: float,
                bins_per_octave: int = 12, n_fft: int = 2048,
                hop: int = 512):
    """``librosa.effects.pitch_shift`` semantics: f0 × 2^(n_steps/bins),
    duration preserved. Accepts numpy or jnp ``y [T]``."""
    y = jnp.asarray(y, jnp.float32)
    return _pitch_shift_fixed(y, sr, float(n_steps), bins_per_octave,
                              n_fft, hop, int(y.shape[0]))
