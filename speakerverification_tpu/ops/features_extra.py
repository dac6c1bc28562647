"""Extra feature-stack ops: deltas, context window, ISTFT, SB filterbank.

Parity target: the SpeechBrain feature copy
(src/models/FeatureExtraction/features_speechbrain.py:44-920): ``Deltas``
(moving-regression derivative over time), ``ContextWindow`` (frame
splicing of ±context frames), ``ISTFT`` (inverse STFT via overlap-add
with squared-window normalization), and ``Filterbank`` (HTK-mel
triangular/rectangular/gaussian filters + per-sequence dB clamp — a
DIFFERENT mel construction from the torchaudio-slaney one in
``ops/frontend.py``). All are live-parity tested against the reference's
own torch module (tests/test_speechbrain_live_parity.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from speakerverification_tpu.ops.frontend import FrontendConfig, dft_matrices
from speakerverification_tpu.ops.signal import overlap_and_add

__all__ = ["deltas", "context_window", "istft",
           "speechbrain_fbank_matrix", "speechbrain_log_fbank"]


def deltas(x: jax.Array, window_length: int = 5) -> jax.Array:
    """Time derivative via linear regression over ±n frames
    (features_speechbrain ``Deltas``). ``x``: [B, T, F]."""
    n = (window_length - 1) // 2
    denom = n * (n + 1) * (2 * n + 1) / 3.0
    kernel = jnp.arange(-n, n + 1, dtype=x.dtype) / denom     # [-n..n]/denom
    xt = jnp.moveaxis(x, 1, -1)                               # [B, F, T]
    pad = jnp.pad(xt, ((0, 0), (0, 0), (n, n)), mode="edge")

    def conv_row(row):
        return jnp.convolve(row, kernel[::-1], mode="valid")

    out = jax.vmap(jax.vmap(conv_row))(pad)
    return jnp.moveaxis(out, -1, 1)


def context_window(x: jax.Array, left_frames: int = 5,
                   right_frames: int = 5) -> jax.Array:
    """Frame splicing: gather ±context frames per step
    (features_speechbrain ``ContextWindow``, exact semantics:
    zero-padded borders — the reference's grouped conv1d zero-pads —
    and channel-major layout ``out[..., c*(l+r+1) + i]`` = channel ``c``
    at offset ``i - left``). [B, T, F] → [B, T, F*(l+r+1)]."""
    B, T, F = x.shape
    cols = []
    for offset in range(-left_frames, right_frames + 1):
        idx = jnp.arange(T) + offset
        valid = (idx >= 0) & (idx < T)
        g = jnp.take(x, jnp.clip(idx, 0, T - 1), axis=1)
        cols.append(jnp.where(valid[None, :, None], g, 0.0))
    stacked = jnp.stack(cols, axis=-1)            # [B, T, F, ctx]
    return stacked.reshape(B, T, F * (left_frames + right_frames + 1))


def istft(real: jax.Array, imag: jax.Array,
          cfg: FrontendConfig = FrontendConfig(),
          length: int | None = None) -> jax.Array:
    """Inverse STFT by synthesis-window overlap-add
    (features_speechbrain ``ISTFT``). Inputs ``[B, frames, bins]``."""
    n_fft, hop = cfg.n_fft, cfg.hop_length
    K = n_fft // 2 + 1
    # inverse real DFT basis (unwindowed)
    n = np.arange(n_fft)[:, None]
    k = np.arange(K)[None, :]
    angle = 2.0 * np.pi * n * k / n_fft
    weight = np.ones(K)
    weight[1:-1 if n_fft % 2 == 0 else None] = 2.0
    inv_cos = jnp.asarray((np.cos(angle) * weight / n_fft).astype(np.float32))
    inv_sin = jnp.asarray((np.sin(angle) * weight / n_fft).astype(np.float32))

    # NOTE: the frontend's "imag" is frames @ sin-basis = −Im(rFFT), so the
    # synthesis combines with a plus sign.
    frames = (jnp.einsum("bfk,nk->bfn", real, inv_cos)
              + jnp.einsum("bfk,nk->bfn", imag, inv_sin))    # [B, F, n_fft]

    # synthesis window = analysis window; normalize by sum of squares
    cos_b, _ = dft_matrices(n_fft, cfg.win_length, cfg.window)
    window = jnp.asarray((cos_b[:, 0]).astype(np.float32))   # w * cos(0) = w
    sig = overlap_and_add(frames * window[None, None, :], hop)
    wsq = overlap_and_add(
        jnp.broadcast_to((window ** 2)[None, None, :],
                         frames.shape), hop)
    sig = sig / jnp.clip(wsq, 1e-8)
    pad = n_fft // 2
    sig = sig[..., pad:]
    if length is not None:
        sig = sig[..., :length]
    return sig


def _htk_mel(hz: float) -> float:
    return 2595.0 * math.log10(1.0 + hz / 700.0)


def _htk_hz(mel: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)


def speechbrain_fbank_matrix(n_mels: int = 40, f_min: float = 0.0,
                             f_max: float = 8000.0, n_fft: int = 400,
                             sample_rate: int = 16000,
                             filter_shape: str = "triangular") -> np.ndarray:
    """Mel filter matrix ``[n_fft//2+1, n_mels]`` with the SpeechBrain
    construction (features_speechbrain.py:353-683): HTK mel points,
    filters parameterized by central frequency + band over a frequency
    axis ``linspace(0, sample_rate // 2, n_stft)`` (note the reference's
    INTEGER halving of odd sample rates), and triangular / rectangular /
    gaussian shapes (gaussian smooth factor 2). This differs from the
    torchaudio-slaney matrix in ``ops/frontend.py::mel_filterbank``
    (slaney mel scale, slaney area normalization).
    """
    n_stft = n_fft // 2 + 1
    # float32 throughout — the reference builds these tensors in torch's
    # default dtype, and fp64 here drifts past test tolerance
    mel = np.linspace(_htk_mel(f_min), _htk_mel(f_max), n_mels + 2,
                      dtype=np.float32)
    hz = _htk_hz(mel).astype(np.float32)
    band = (hz[1:] - hz[:-1])[:-1][:, None]               # [n_mels, 1]
    f_central = hz[1:-1][:, None]                         # [n_mels, 1]
    all_freqs = np.linspace(0, sample_rate // 2, n_stft,
                            dtype=np.float32)[None, :]

    if filter_shape == "triangular":
        slope = (all_freqs - f_central) / band
        fb = np.maximum(0.0, np.minimum(slope + 1.0, 1.0 - slope))
    elif filter_shape == "rectangular":
        fb = ((all_freqs >= f_central - band)
              & (all_freqs <= f_central + band)).astype(np.float64)
    elif filter_shape == "gaussian":
        fb = np.exp(-0.5 * ((all_freqs - f_central) / (band / 2.0)) ** 2)
    else:
        raise ValueError(f"unknown filter_shape {filter_shape!r}")
    return fb.T.astype(np.float32)                        # [n_stft, n_mels]


def speechbrain_log_fbank(fbanks: jax.Array, power_spectrogram: float = 2,
                          amin: float = 1e-10, ref_value: float = 1.0,
                          top_db: float = 80.0) -> jax.Array:
    """Linear FBANKs → log FBANKs with the SpeechBrain dB clamp
    (features_speechbrain.py:683-707): multiplier 10 (power spectra) or
    20, and the dynamic-range floor taken per SEQUENCE over the last two
    axes (time × mel), not per batch."""
    multiplier = 10.0 if power_spectrogram == 2 else 20.0
    db = multiplier * jnp.log10(jnp.clip(fbanks, amin))
    db = db - multiplier * math.log10(max(amin, ref_value))
    floor = jnp.max(db, axis=(-2, -1), keepdims=True) - top_db
    return jnp.maximum(db, floor)
