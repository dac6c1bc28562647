"""Waveform format conversion utilities.

Parity target: src/processing/wav_conversion.py:9-90 — pydub↔numpy
converters, amplitude normalization, and the ffmpeg shell converter
(sample rate / channels / codec). pydub is not in this image; the
numpy-side conversions operate on int16 PCM buffers directly.
"""

from __future__ import annotations

import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

from speakerverification_tpu.data.audio import normalize_amplitude  # noqa: F401
from speakerverification_tpu.data.wavio import read_wav, write_wav

__all__ = ["np_to_pcm16", "pcm16_to_np", "normalize_audio_amp",
           "convert_audio_shell", "resample_file"]


def np_to_pcm16(audio: np.ndarray) -> np.ndarray:
    """float [-1, 1] → int16 PCM (parity: np_to_segment's sample_width=2)."""
    return (np.clip(audio, -1.0, 1.0) * 32767.0).astype(np.int16)


def pcm16_to_np(pcm: np.ndarray, normalize: bool = True) -> np.ndarray:
    """int16 PCM → float32; ``normalize`` matches soundfile conventions
    (parity: segment_to_np)."""
    x = pcm.astype(np.float32)
    return x / 32768.0 if normalize else x


def normalize_audio_amp(audio: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    """Peak normalization (parity: wav_conversion.normalize_audio_amp)."""
    return normalize_amplitude(audio, eps)


def convert_audio_shell(src: str | Path, dst: str | Path,
                        sample_rate: int = 8000, channels: int = 1,
                        codec: str = "pcm_s16le") -> bool:
    """ffmpeg conversion (parity: wav_conversion.convert_audio_shell:44).
    Returns False when ffmpeg is unavailable or fails."""
    cmd = ["ffmpeg", "-y", "-i", str(src), "-ar", str(sample_rate),
           "-ac", str(channels), "-acodec", codec, str(dst)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=600)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def resample_file(src: str | Path, dst: str | Path, sample_rate: int,
                  ) -> Path:
    """Pure-Python resample fallback (polyphase) for WAV→WAV conversion."""
    from fractions import Fraction

    from scipy.signal import resample_poly

    audio, sr = read_wav(src)
    if sr != sample_rate:
        frac = Fraction(sample_rate, sr).limit_denominator(1000)
        audio = resample_poly(audio, frac.numerator, frac.denominator)
    write_wav(dst, audio.astype(np.float32), sample_rate)
    return Path(dst)
