"""DSP primitives (JAX): amplitude, convolution, reverb, filters, OLA.

Parity target: the reference's twin SpeechBrain DSP copies
(src/processing/signal_processing.py:16-565 and audio_signal.py:17-486):
compute_amplitude, normalize/rescale, dB↔amplitude, convolve1d,
reverberate (RIR convolution with direct-path alignment and level
restoration), notch_filter, overlap_and_add, and the Gabor impulse
response used by learnable filterbanks. All functions are jit-able and
operate on ``[..., time]`` arrays.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["compute_amplitude", "normalize_amplitude", "rescale",
           "db_to_amplitude", "amplitude_to_db", "convolve1d", "reverberate",
           "notch_filter", "overlap_and_add", "gabor_impulse_response"]


def compute_amplitude(waveform: jax.Array, lengths: Optional[jax.Array] = None,
                      amp_type: str = "avg", scale: str = "linear") -> jax.Array:
    """Average or peak amplitude per waveform (signal_processing.py:16-70)."""
    if amp_type == "avg":
        if lengths is None:
            out = jnp.mean(jnp.abs(waveform), axis=-1, keepdims=True)
        else:
            out = (jnp.sum(jnp.abs(waveform), axis=-1, keepdims=True)
                   / lengths[..., None])
    elif amp_type == "peak":
        out = jnp.max(jnp.abs(waveform), axis=-1, keepdims=True)
    else:
        raise ValueError(f"unknown amp_type {amp_type!r}")
    if scale == "linear":
        return out
    if scale == "dB":
        return jnp.clip(20 * jnp.log10(jnp.clip(out, 1e-14)), -80.0)
    raise ValueError(f"unknown scale {scale!r}")


def normalize_amplitude(waveform: jax.Array, amp_type: str = "avg",
                        eps: float = 1e-14) -> jax.Array:
    """Divide by amplitude (signal_processing.py normalize)."""
    den = compute_amplitude(waveform, amp_type=amp_type) + eps
    return waveform / den


def rescale(waveform: jax.Array, target_lvl: float, amp_type: str = "avg",
            scale: str = "linear") -> jax.Array:
    """Normalize then scale to a target level (signal_processing.py rescale)."""
    out = normalize_amplitude(waveform, amp_type)
    if scale == "linear":
        return target_lvl * out
    if scale == "dB":
        return db_to_amplitude(jnp.asarray(target_lvl)) * out
    raise ValueError(f"unknown scale {scale!r}")


def db_to_amplitude(db: jax.Array, ref: float = 1.0, power: float = 0.5,
                    ) -> jax.Array:
    return ref * jnp.power(10.0, db / 10.0) ** power


def amplitude_to_db(amp: jax.Array, eps: float = 1e-14) -> jax.Array:
    return 20.0 * jnp.log10(jnp.clip(jnp.abs(amp), eps))


def convolve1d(waveform: jax.Array, kernel: jax.Array,
               padding: int | tuple = 0, use_fft: bool = True,
               rotation_index: int | jax.Array = 0) -> jax.Array:
    """1-D convolution of ``[B, T]`` with ``[K]`` / per-batch ``[B, K]``
    kernels (signal_processing.py:157-277).

    Both branches reproduce the reference EXACTLY (they are mutually
    inconsistent there, and we mirror each):

    * ``use_fft=True``: kernel zero-padded to the (padded) signal
      length and rotated left by ``rotation_index``; the product is
      CIRCULAR true convolution at that length (the reference's own
      docstring warns about the wrap-around; reverberation relies on it
      for direct-path alignment). ``rotation_index`` may be a scalar or
      a per-row ``[B]`` array (generalizing the reference, whose tensor
      slicing only supports one shared kernel).
    * ``use_fft=False``: torch ``conv1d`` semantics — CROSS-correlation
      (no kernel flip), valid-size output ``T_padded - K + 1``.

    For symmetric odd kernels (the notch-filter use) the two agree on
    the overlapping region; the divergence for asymmetric kernels is
    asserted live in tests/test_signal_live_parity.py.
    """
    if isinstance(padding, int):
        padding = (padding, padding)
    x = jnp.pad(waveform, ((0, 0), padding))
    if kernel.ndim == 1:
        kernel = jnp.broadcast_to(kernel, (x.shape[0],) + kernel.shape)

    if use_fft:
        T = x.shape[-1]
        if kernel.shape[-1] > T:        # reference: kernel[..., :T - K] keeps T
            kernel = kernel[..., :T]
        ker = jnp.zeros(kernel.shape[:-1] + (T,), kernel.dtype)
        ker = ker.at[..., :kernel.shape[-1]].set(kernel)
        y = jnp.fft.irfft(jnp.fft.rfft(x, T) * jnp.fft.rfft(ker, T), T)
        rot = jnp.asarray(rotation_index)
        if rot.ndim == 0 and isinstance(rotation_index, int):
            if rotation_index:
                y = jnp.roll(y, -rotation_index, axis=-1)
            return y
        # traced / per-row rotation: gather-based circular shift
        idx = (jnp.arange(T)[None, :]
               + jnp.reshape(rot, (-1, 1))) % T
        return jnp.take_along_axis(y, jnp.broadcast_to(idx, y.shape), axis=-1)
    # direct: torch-conv1d semantics (cross-correlation, valid output),
    # one kernel per batch row
    return jax.vmap(lambda xi, ki: jnp.correlate(xi, ki, mode="valid")
                    )(x, kernel)


def reverberate(waveform: jax.Array, rir: jax.Array,
                rescale_amp: str = "avg") -> jax.Array:
    """RIR convolution with direct-path alignment + level restoration —
    exact signal_processing.py:280-352 semantics (circular FFT
    convolution rotated to the direct-path index, then rescaled to the
    dry signal's amplitude)."""
    orig_amp = compute_amplitude(waveform, amp_type=rescale_amp)
    direct = jnp.argmax(jnp.abs(rir), axis=-1)
    wet = convolve1d(waveform, rir, padding=0, use_fft=True,
                     rotation_index=jnp.atleast_1d(direct))
    new_amp = compute_amplitude(wet, amp_type=rescale_amp)
    return wet * orig_amp / jnp.clip(new_amp, 1e-14)


def notch_filter(notch_freq: float, filter_width: int = 101,
                 notch_width: float = 0.05) -> jax.Array:
    """FIR band-rejection kernel (signal_processing.py notch_filter)."""
    pad = filter_width // 2
    inputs = jnp.arange(filter_width) - pad
    notch_freq = notch_freq + notch_width

    def sinc(x):
        return jnp.where(x == 0, 1.0, jnp.sin(x) / jnp.where(x == 0, 1.0, x))

    # torch.blackman_window defaults to PERIODIC (denominator = N, not
    # N-1 as numpy's symmetric window uses) — match the reference
    k = jnp.arange(filter_width)
    blackman = (0.42 - 0.5 * jnp.cos(2 * math.pi * k / filter_width)
                + 0.08 * jnp.cos(4 * math.pi * k / filter_width))

    hlpf = sinc(3.0 * (notch_freq - notch_width) * inputs)
    hlpf = hlpf * blackman
    hlpf = hlpf / jnp.sum(hlpf)

    hhpf = sinc(3.0 * (notch_freq + notch_width) * inputs)
    hhpf = hhpf * blackman
    hhpf = -hhpf / jnp.sum(hhpf)
    hhpf = hhpf.at[pad].add(1.0)

    return hlpf + hhpf


def overlap_and_add(frames: jax.Array, frame_step: int) -> jax.Array:
    """``[..., n_frames, frame_len] → [..., T]`` OLA
    (signal_processing.py overlap_and_add)."""
    *batch, n_frames, frame_len = frames.shape
    total = frame_step * (n_frames - 1) + frame_len
    frames2 = frames.reshape((-1, n_frames, frame_len))

    def ola(fr):
        out = jnp.zeros((total,), fr.dtype)
        def body(i, acc):
            return jax.lax.dynamic_update_slice(
                acc, jax.lax.dynamic_slice(acc, (i * frame_step,),
                                           (frame_len,)) + fr[i],
                (i * frame_step,))
        return jax.lax.fori_loop(0, n_frames, body, out)

    out = jax.vmap(ola)(frames2)
    return out.reshape(tuple(batch) + (total,))


def gabor_impulse_response(t: jax.Array, center: jax.Array,
                           fwhm: jax.Array) -> jax.Array:
    """Complex Gabor filters (audio_signal.py gabor impulse response)."""
    denominator = 1.0 / (jnp.sqrt(2.0 * math.pi) * fwhm)
    gaussian = jnp.exp(jnp.tensordot(1.0 / (2.0 * fwhm**2), -t**2, axes=0))
    sinusoid = jnp.exp(1j * jnp.tensordot(center, t, axes=0))
    return denominator[:, None] * sinusoid * gaussian
