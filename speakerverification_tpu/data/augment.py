"""Host-side waveform augmentation: MUSAN/RIR env-corrupt + time-domain.

Behavioral parity with the reference's ``AugmentWAV``
(src/processing/audio_loader.py:158-244) and the env-corrupt chain in the
train dataset (src/dataloader.py:113-144):

* ``additive_noise``: sample 1..k noise files from a category, mix at a
  random SNR drawn per file from the category's range, where gain is
  ``sqrt(10^((clean_db − noise_db − snr)/10))`` with dB computed as
  ``10·log10(mean(x²) + 1e-4)``.
* ``reverberate``: energy-normalized RIR, full convolution truncated to
  the crop length (FFT convolution here — same math, ~10× faster than
  direct for 16k-tap RIRs).
* ``env_corrupt``: rev / noise / both / none with p = .2/.4/.2/.2 and a
  random order for 'both'.
* time-domain speed/volume/pitch (src/processing/augment.py:16-97):
  speed/volume via polyphase resampling and gain; pitch shift is the
  exact librosa semantics — STFT phase vocoder time-stretch then
  polyphase resample back to length (``augment_pitch`` below,
  ops/phase_vocoder.py), matching ``librosa.effects.pitch_shift``.

File-list layout conventions (musan_split/*/*/*/*.wav etc.) match the
reference so existing augment folders drop in unchanged.
"""

from __future__ import annotations

import glob
import os
from fractions import Fraction
from typing import Mapping, Optional

import numpy as np
from scipy import signal as sps

from speakerverification_tpu.data.audio import AudioSpec, load_wav

__all__ = ["AugmentWav", "random_time_domain_augment"]

ENV_CORRUPT_TYPES = ["rev", "noise", "both", "none"]
ENV_CORRUPT_PROBS = [0.2, 0.4, 0.2, 0.2]
NOISE_CATEGORIES = ["noise", "speech", "music", "noise_vad", "noise_rirs"]


class AugmentWav:
    def __init__(self, augment_options: Mapping, audio_spec: Mapping,
                 rng: Optional[np.random.Generator] = None):
        self.options = augment_options
        self.spec = AudioSpec(audio_spec)
        self.max_audio = self.spec.max_audio
        self.rng = rng or np.random.default_rng()

        paths = augment_options["augment_paths"]
        self.noise_snr = dict(augment_options["noise_snr"])
        self.num_noise = dict(augment_options["noise_samples"])
        self.noise_proportion = list(augment_options.get(
            "noise_proportion", [0.2, 0.1, 0.2, 0.25, 0.25]))

        self.noiselist: dict[str, list[str]] = {}
        musan = glob.glob(os.path.join(paths.get("musan", ""), "*/*/*/*.wav"))
        for f in musan:
            cat = f.split("/")[-4]
            if cat in ("noise", "speech", "music"):
                self.noiselist.setdefault(cat, []).append(f)
        for f in glob.glob(os.path.join(paths.get("noise_vad", ""), "*/*.wav")):
            self.noiselist.setdefault("noise_vad", []).append(f)
        rirs = paths.get("rirs", "")
        for f in (glob.glob(os.path.join(rirs, "pointsource_noises", "*.wav"))
                  + glob.glob(os.path.join(rirs, "real_rirs_isotropic_noises",
                                           "*.wav"))):
            self.noiselist.setdefault("noise_rirs", []).append(f)
        self.reverberation_files = glob.glob(
            os.path.join(rirs, "simulated_rirs", "*/*/*.wav"))

    @property
    def has_noise(self) -> bool:
        return any(self.noiselist.values())

    @property
    def has_reverb(self) -> bool:
        return bool(self.reverberation_files)

    def additive_noise(self, category: str, audio: np.ndarray) -> np.ndarray:
        """SNR-scaled additive mixing (parity: audio_loader.py:216-235)."""
        clean_db = 10 * np.log10(np.mean(audio ** 2) + 1e-4)
        lo, hi = self.num_noise[category]
        files = list(self.noiselist[category])
        k = min(int(self.rng.integers(lo, hi + 1)), len(files))
        chosen = self.rng.choice(len(files), size=k, replace=False)

        noises = []
        for i in chosen:
            noise = load_wav(files[int(i)], self.spec, evalmode=False,
                             rng=self.rng)
            snr = self.rng.uniform(*self.noise_snr[category])
            noise_db = 10 * np.log10(np.mean(noise[0] ** 2) + 1e-4)
            gain = np.sqrt(10 ** ((clean_db - noise_db - snr) / 10))
            noises.append(gain * noise)
        if not noises:
            return audio
        return np.sum(np.concatenate(noises, axis=0), axis=0,
                      keepdims=True) + audio

    def reverberate(self, audio: np.ndarray) -> np.ndarray:
        """Energy-normalized full convolution with a random simulated RIR
        (parity: audio_loader.py:237-244; fftconvolve for speed)."""
        rir_file = self.reverberation_files[
            int(self.rng.integers(len(self.reverberation_files)))]
        rir = load_wav(rir_file, self.spec, load_all=True)
        rir = rir / np.sqrt(np.sum(rir ** 2))
        out = sps.fftconvolve(audio, rir, mode="full")[:, :self.max_audio]
        return out.astype(np.float32)

    def env_corrupt(self, audio: np.ndarray) -> np.ndarray:
        """rev/noise/both/none chain (parity: src/dataloader.py:113-144)."""
        augtype = self.rng.choice(ENV_CORRUPT_TYPES, p=ENV_CORRUPT_PROBS)
        if augtype == "none":
            return audio
        if augtype == "rev" and self.has_reverb:
            return self.reverberate(audio)
        cats = [c for c in NOISE_CATEGORIES if self.noiselist.get(c)]
        if not cats:
            return self.reverberate(audio) if self.has_reverb else audio
        probs = np.array([self.noise_proportion[NOISE_CATEGORIES.index(c)]
                          for c in cats])
        probs = probs / probs.sum()
        if augtype == "noise" or not self.has_reverb:
            cat = self.rng.choice(cats, p=probs)
            return self.additive_noise(cat, audio)
        # both: random order
        cat = self.rng.choice(cats, p=probs)
        if self.rng.random() < 0.5:
            return self.additive_noise(cat, self.reverberate(audio))
        return self.reverberate(self.additive_noise(cat, audio))


# ---------------------------------------------------------------------------
# Time-domain augmentation (speed / volume / pitch)
# ---------------------------------------------------------------------------

def _resample_ratio(audio: np.ndarray, ratio: float) -> np.ndarray:
    frac = Fraction(ratio).limit_denominator(100)
    return sps.resample_poly(audio, frac.denominator, frac.numerator,
                             axis=-1).astype(np.float32)


def augment_speed(audio: np.ndarray, low: float = 0.95, high: float = 1.05,
                  rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Playback-speed change by resampling (parity intent:
    src/processing/augment.py speed_change via pydub frame-rate trick)."""
    rng = rng or np.random.default_rng()
    speed = float(rng.uniform(low, high))
    return _resample_ratio(audio, speed)


def augment_volume(audio: np.ndarray, volume_db: float = 4.0,
                   rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Random gain in ±volume_db dB (parity: augment.py random volume)."""
    rng = rng or np.random.default_rng()
    gain_db = float(rng.uniform(-volume_db, volume_db))
    return (audio * (10.0 ** (gain_db / 20.0))).astype(np.float32)


def augment_pitch(audio: np.ndarray, low: float = -0.5, high: float = 0.5,
                  rng: Optional[np.random.Generator] = None,
                  sample_rate: int = 16000) -> np.ndarray:
    """Pitch shift in semitones via the STFT phase vocoder — exact
    ``librosa.effects.pitch_shift`` semantics (f0 scaled, duration
    preserved; parity: src/processing/augment.py:66-94 /
    augmentation/pitch_shift.py). Runs through ops/phase_vocoder.py.
    """
    rng = rng or np.random.default_rng()
    # quantize to 0.05-semitone steps: n_steps is a static jit argument
    # (it fixes the vocoder's frame grid), so a continuous draw would
    # compile a fresh program per batch — the grid bounds the cache at
    # ~(high-low)/0.05 programs per audio length, inaudibly coarse
    semitones = round(float(rng.uniform(low, high)) / 0.05) * 0.05
    if abs(semitones) < 1e-6:
        return audio.astype(np.float32)
    from speakerverification_tpu.ops.phase_vocoder import pitch_shift
    flat = audio.reshape(-1, audio.shape[-1])
    out = np.stack([np.asarray(pitch_shift(row, sample_rate, semitones))
                    for row in flat])
    return out.reshape(audio.shape).astype(np.float32)


def random_time_domain_augment(audio: np.ndarray, setting: Mapping,
                               rng: Optional[np.random.Generator] = None,
                               ) -> np.ndarray:
    """Pick speed/pitch/volume/none (parity: audio_loader.py:17-48)."""
    rng = rng or np.random.default_rng()
    p = list(setting.get("proportion", [0.25, 0.25, 0.25]))
    if len(p) < 4:
        p = p + [1.0 - sum(p)]
    choice = rng.choice(["speed", "pitch", "volume", "none"], p=p)
    if choice == "speed":
        return augment_speed(audio, *setting.get("speed", (0.95, 1.05)), rng=rng)
    if choice == "pitch":
        return augment_pitch(audio, *setting.get("pitch", (-0.5, 0.5)), rng=rng)
    if choice == "volume":
        return augment_volume(audio, setting.get("volume", 4.0), rng=rng)
    return audio
