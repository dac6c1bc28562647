"""Audio crop loading: pad-wrap + train/eval cropping.

Behavioral parity with the reference's ``loadWAV``
(src/processing/audio_loader.py:53-152):

* short audio is pad-wrapped to ``sentence_len * sr + 1`` samples;
* train mode: one random-offset crop (or offset 0 when
  ``random_chunk=False``);
* eval mode: ``num_eval`` crops at ``linspace(0, size - max_audio)``
  offsets stacked ``[num_eval, T]``; ``num_eval == 0`` → whole file.

Randomness is explicit (``numpy.random.Generator``) instead of the
reference's global ``random`` module, so the pipeline is reproducible
and shardable.
"""

from __future__ import annotations

from typing import Mapping, Optional, Union

import numpy as np

from speakerverification_tpu.data.wavio import read_wav

__all__ = ["AudioSpec", "load_wav", "normalize_amplitude"]

DEFAULT_SPEC = {"sample_rate": 8000, "channels": 1, "sentence_len": 2.0,
                "win_len": 0.025, "hop_len": 0.01}


class AudioSpec(dict):
    """Reference ``audio_spec`` mapping (yaml/configuration.yaml:62-68)."""

    def __init__(self, mapping: Optional[Mapping] = None, **kw):
        super().__init__(DEFAULT_SPEC)
        if mapping:
            self.update(mapping)
        self.update(kw)

    @property
    def sample_rate(self) -> int:
        return int(self["sample_rate"])

    @property
    def max_audio(self) -> int:
        return int(self["sentence_len"] * self["sample_rate"])


def normalize_amplitude(audio: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    """Peak-normalize (parity: src/processing/wav_conversion.py
    ``normalize_audio_amp``)."""
    peak = np.max(np.abs(audio))
    return (audio / max(peak, eps)).astype(np.float32)


def load_wav(source: Union[str, np.ndarray],
             spec: Optional[Mapping] = None,
             evalmode: bool = True,
             num_eval: int = 10,
             random_chunk: bool = True,
             load_all: bool = False,
             rng: Optional[np.random.Generator] = None,
             expected_sr: bool = True,
             normalize: bool = True) -> np.ndarray:
    """Load + crop audio; returns ``[n_crops, T]`` float32 (or [1, full]).

    ``normalize=False`` skips amplitude normalization for ndarray
    sources — the loader's post-augment re-crop must NOT peak-normalize
    or the volume augmentation it just applied is exactly cancelled
    (the reference's pipeline normalizes by the int16 RANGE, which
    preserves relative gain — audio_loader.py:99 + wav_conversion.py:35)."""
    spec = AudioSpec(spec)

    if isinstance(source, str):
        audio, sr = read_wav(source)
        if expected_sr and sr != spec.sample_rate:
            raise ValueError(
                f"{source}: sample rate {sr} != configured {spec.sample_rate}")
    elif isinstance(source, np.ndarray):
        audio = normalize_amplitude(source) if normalize else \
            np.asarray(source, np.float32)
    else:
        raise TypeError(f"invalid audio source type {type(source)}")

    if load_all:
        return np.expand_dims(audio.astype(np.float32), 0)

    max_audio = spec.max_audio
    if audio.shape[0] <= max_audio:
        shortage = max_audio - audio.shape[0] + 1
        audio = np.pad(audio, (0, shortage), "wrap")
    audiosize = audio.shape[0]

    if evalmode:
        if num_eval == 0:
            return np.expand_dims(audio.astype(np.float32), 0)
        starts = np.linspace(0, audiosize - max_audio, num=num_eval)
    elif random_chunk:
        rng = rng or np.random.default_rng()
        starts = np.array([int(rng.random() * (audiosize - max_audio))])
    else:
        starts = np.array([0])

    crops = [audio[int(s):int(s) + max_audio] for s in starts]
    return np.stack(crops, axis=0).astype(np.float32)
