"""GEMM-native audio frontend: pre-emphasis + STFT + mel + MFCC.

TPU-first redesign of the reference's torchaudio/nnAudio feature stack
(reference: src/models/FeatureExtraction/feature.py:10-94, src/utils.py:53-71
``PreEmphasis``). Instead of an FFT library call per frame, the whole
frontend is expressed as dense matrix products that map directly onto the
TPU MXU (the MelT "GEMM-native NDFT" formulation):

    frames  = gather(pad_reflect(pre_emphasis(x)))      # [B, F, n_fft]
    power   = (frames @ C)**2 + (frames @ S)**2         # windowed real DFT
    mel     = power @ M                                 # mel projection
    (mfcc   = log(mel variant) @ DCT)                   # optional

``C``/``S`` fold the analysis window into the DFT basis, so window, FFT
and mel projection all fuse into two back-to-back GEMMs that XLA keeps in
VMEM. An optional fused Pallas kernel lives in ``ops/pallas_frontend.py``.

Numerics follow the torchaudio-slaney convention (center=True reflect
padding, periodic window padded to n_fft, power spectrum, slaney mel scale
and slaney filterbank area-normalization) — the golden target chosen in
SURVEY.md §7 hard-part (a). Defaults match the reference YAML
(yaml/configuration.yaml:62-73: sr=8000, n_fft=512, win=200, hop=80,
hamming, 80 mels). fmin/fmax defaults are FEATURE-TYPE-DEPENDENT in the
reference (feature.py mfcc factory: 10/4000 at :37; melspectrogram
factory: 0/None at :71-72); ``FrontendConfig.from_hparams`` and the
builder key them on the feature type, and the bare dataclass defaults
follow the mel factory (the kind every bare-default consumer — the
hybrids' in-model branch, MixedModel — actually computes).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "FrontendConfig",
    "pre_emphasis",
    "hz_to_mel",
    "mel_to_hz",
    "mel_filterbank",
    "dft_matrices",
    "dct_matrix",
    "frame_indices",
    "make_frontend",
    "power_to_db",
]


# ---------------------------------------------------------------------------
# NumPy-side constant construction (runs once at trace/build time).
# ---------------------------------------------------------------------------

def hz_to_mel(freq, mel_scale: str = "slaney"):
    """Hz → mel. ``slaney`` (librosa/torchaudio default here) or ``htk``."""
    freq = np.asarray(freq, dtype=np.float64)
    if mel_scale == "htk":
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    f_sp = 200.0 / 3
    mels = freq / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(freq >= min_log_hz,
                    min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep,
                    mels)


def mel_to_hz(mels, mel_scale: str = "slaney"):
    mels = np.asarray(mels, dtype=np.float64)
    if mel_scale == "htk":
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_sp = 200.0 / 3
    freqs = f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(mels >= min_log_mel,
                    min_log_hz * np.exp(logstep * (mels - min_log_mel)),
                    freqs)


def mel_filterbank(n_freqs: int, n_mels: int, sample_rate: int,
                   fmin: float = 0.0, fmax: Optional[float] = None,
                   mel_scale: str = "slaney", norm: Optional[str] = "slaney",
                   ) -> np.ndarray:
    """Triangular mel filterbank ``[n_freqs, n_mels]`` (torchaudio layout)."""
    fmax = fmax if fmax is not None else sample_rate / 2.0
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)

    m_pts = np.linspace(hz_to_mel(fmin, mel_scale), hz_to_mel(fmax, mel_scale),
                        n_mels + 2)
    f_pts = mel_to_hz(m_pts, mel_scale)

    f_diff = np.diff(f_pts)                               # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]          # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2:n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    return fb.astype(np.float32)


def _window(name: str, win_length: int, periodic: bool = True) -> np.ndarray:
    """Analysis window; periodic (fftbins) to match torch.*_window defaults."""
    n = win_length + 1 if periodic else win_length
    k = np.arange(n, dtype=np.float64)
    if name == "hamming":
        w = 0.54 - 0.46 * np.cos(2 * np.pi * k / (n - 1))
    elif name in ("hann", "hanning"):
        w = 0.5 - 0.5 * np.cos(2 * np.pi * k / (n - 1))
    elif name in ("rect", "rectangular", "ones", "boxcar"):
        w = np.ones(n)
    elif name == "blackman":
        w = (0.42 - 0.5 * np.cos(2 * np.pi * k / (n - 1))
             + 0.08 * np.cos(4 * np.pi * k / (n - 1)))
    else:
        raise ValueError(f"unknown window {name!r}")
    return w[:win_length].astype(np.float64) if periodic else w.astype(np.float64)


def dft_matrices(n_fft: int, win_length: int, window: str = "hamming",
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT bases ``C, S`` of shape ``[n_fft, n_fft//2 + 1]``.

    The ``win_length``-sample window is centered inside the ``n_fft`` frame
    (as torch.stft does when ``win_length < n_fft``), then folded into the
    cosine/sine bases so that ``frames @ C`` / ``frames @ S`` are the real
    and (negated) imaginary parts of the windowed rFFT.
    """
    w = np.zeros(n_fft, dtype=np.float64)
    left = (n_fft - win_length) // 2
    w[left:left + win_length] = _window(window, win_length)

    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)[None, :]
    angle = 2.0 * np.pi * n * k / n_fft
    cos_b = (np.cos(angle) * w[:, None]).astype(np.float32)
    sin_b = (np.sin(angle) * w[:, None]).astype(np.float32)
    return cos_b, sin_b


def dct_matrix(n_mfcc: int, n_mels: int, norm: str = "ortho") -> np.ndarray:
    """DCT-II basis ``[n_mels, n_mfcc]`` (torchaudio ``create_dct`` layout)."""
    n = np.arange(n_mels, dtype=np.float64)
    k = np.arange(n_mfcc, dtype=np.float64)[None, :]
    dct = np.cos(np.pi / n_mels * (n[:, None] + 0.5) * k)
    if norm == "ortho":
        dct[:, 0] *= 1.0 / math.sqrt(2.0)
        dct *= math.sqrt(2.0 / n_mels)
    else:
        dct *= 2.0
    return dct.astype(np.float32)


def frame_indices(num_samples_padded: int, n_fft: int, hop_length: int) -> np.ndarray:
    n_frames = 1 + (num_samples_padded - n_fft) // hop_length
    return (np.arange(n_frames)[:, None] * hop_length
            + np.arange(n_fft)[None, :]).astype(np.int32)


# ---------------------------------------------------------------------------
# JAX-side ops.
# ---------------------------------------------------------------------------

def pre_emphasis(x: jax.Array, coef: float = 0.97) -> jax.Array:
    """``y[t] = x[t] - coef * x[t-1]`` with left reflect padding.

    Parity with the reference's conv1d formulation (src/utils.py:53-71):
    reflect-pad of one sample means ``y[0] = x[0] - coef * x[1]``.
    """
    prev = jnp.concatenate([x[..., 1:2], x[..., :-1]], axis=-1)
    return x - coef * prev


def power_to_db(power: jax.Array, top_db: Optional[float] = 80.0,
                amin: float = 1e-10, ref: float = 1.0) -> jax.Array:
    """Power → dB with per-example dynamic-range clamp (torchaudio semantics).

    ``top_db`` is applied relative to the max over each example's full
    spectrogram (all axes except the leading batch axis).
    """
    db = 10.0 * jnp.log10(jnp.maximum(power, amin))
    db = db - 10.0 * math.log10(max(amin, ref))
    if top_db is not None:
        max_db = jnp.max(db.reshape(db.shape[0], -1), axis=-1)
        floor = (max_db - top_db).reshape((-1,) + (1,) * (db.ndim - 1))
        db = jnp.maximum(db, floor)
    return db


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    """Defaults mirror yaml/configuration.yaml:62-73 of the reference.

    fmin/fmax default to the reference's MELSPECTROGRAM factory values
    (0 / None→sr/2, feature.py:71-72) — every bare-default consumer
    (RawECAPAHybrid.frontend, MixedModel.frontend) computes mel. MFCC
    consumers get the mfcc factory's 10/4000 via ``from_hparams``/the
    builder, which key the defaults on the feature type.
    """
    sample_rate: int = 8000
    n_fft: int = 512
    win_length: int = 200
    hop_length: int = 80
    n_mels: int = 80
    n_mfcc: int = 80
    fmin: float = 0.0
    fmax: Optional[float] = None
    window: str = "hamming"
    mel_scale: str = "slaney"
    mel_norm: Optional[str] = "slaney"
    power: float = 2.0
    center: bool = True
    pre_emphasis: Optional[float] = 0.97
    top_db: Optional[float] = 80.0

    @classmethod
    def from_hparams(cls, hparams: dict,
                     feature_type: str = "melspectrogram") -> "FrontendConfig":
        """Build from the reference YAML schema keys — the ONE canonical
        implementation (``builder.frontend_from_hparams`` and the
        hybrids' ``_frontend_cfg`` both delegate here, so the
        feature-type-keyed band-edge defaults live in exactly one
        place).

        Top-level ``sample_rate`` wins over ``audio_spec``'s so the
        encoder-level frontend and the in-model featurizers can never
        disagree; win/hop default from ``audio_spec``'s win_len/hop_len
        seconds. fmin/fmax defaults follow the reference factory for
        the given ``feature_type`` (feature.py — mfcc: 10/4000 at :37;
        melspectrogram: 0/None at :71-72); explicit keys win.
        """
        spec = hparams.get("audio_spec", {}) or {}
        sr = int(hparams.get("sample_rate", spec.get("sample_rate", 8000)))
        if feature_type == "mfcc":
            default_fmin, default_fmax = 10.0, 4000.0
        else:
            default_fmin, default_fmax = 0.0, None  # None → sr/2 in the bank
        return cls(
            sample_rate=sr,
            n_fft=int(hparams.get("n_fft", 512)),
            win_length=int(hparams.get("win_length",
                                       round(spec.get("win_len", 0.025)
                                             * sr))),
            hop_length=int(hparams.get("hop_length",
                                       round(spec.get("hop_len", 0.01)
                                             * sr))),
            n_mels=int(hparams.get("n_mels", 80)),
            n_mfcc=int(hparams.get("n_mfcc", 80)),
            fmin=float(hparams.get("fmin", default_fmin)),
            fmax=hparams.get("fmax", default_fmax),
            pre_emphasis=0.97 if hparams.get("pre_emphasis", True) else None,
        )


@functools.lru_cache(maxsize=16)
def _constants(cfg: FrontendConfig):
    cos_b, sin_b = dft_matrices(cfg.n_fft, cfg.win_length, cfg.window)
    fb = mel_filterbank(cfg.n_fft // 2 + 1, cfg.n_mels, cfg.sample_rate,
                        cfg.fmin, cfg.fmax, cfg.mel_scale, cfg.mel_norm)
    dct = dct_matrix(cfg.n_mfcc, cfg.n_mels)
    return cos_b, sin_b, fb, dct


def make_frontend(cfg: FrontendConfig = FrontendConfig(),
                  feature_type: str = "melspectrogram") -> Callable[[jax.Array], jax.Array]:
    """Build ``wave [..., T] -> features [..., frames, n_mels]``.

    ``feature_type``: ``melspectrogram`` | ``mfcc`` | ``spectrogram`` | ``raw``
    (parity with the reference's feature factory,
    src/models/FeatureExtraction/feature.py:34-94; ``raw`` is a passthrough,
    src/model.py:96-102).

    Direct-API mfcc callers: build ``cfg`` with
    ``FrontendConfig.from_hparams({...}, "mfcc")`` — the bare dataclass
    defaults carry the MEL factory's 0/None band edges, not the mfcc
    factory's 10/4000 (the defaults are feature-type-dependent in the
    reference and only ``from_hparams`` knows the type).
    """
    if feature_type == "raw":
        return lambda x: x

    cos_np, sin_np, fb_np, dct_np = _constants(cfg)

    def frontend(x: jax.Array) -> jax.Array:
        batch_shape = x.shape[:-1]
        x = x.reshape((-1,) + x.shape[-1:])
        if cfg.pre_emphasis is not None:
            x = pre_emphasis(x, cfg.pre_emphasis)
        if cfg.center:
            pad = cfg.n_fft // 2
            x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")

        idx = jnp.asarray(frame_indices(x.shape[-1], cfg.n_fft, cfg.hop_length))
        frames = jnp.take(x, idx, axis=-1)                 # [B, F, n_fft]

        cos_b = jnp.asarray(cos_np)
        sin_b = jnp.asarray(sin_np)
        re = jnp.einsum("bfn,nk->bfk", frames, cos_b,
                        preferred_element_type=jnp.float32)
        im = jnp.einsum("bfn,nk->bfk", frames, sin_b,
                        preferred_element_type=jnp.float32)
        power = re * re + im * im                           # [B, F, bins]
        if cfg.power != 2.0:
            power = jnp.power(jnp.maximum(power, 0.0), cfg.power / 2.0)

        if feature_type == "spectrogram":
            out = power
        else:
            out = jnp.einsum("bfk,km->bfm", power, jnp.asarray(fb_np),
                             preferred_element_type=jnp.float32)
            if feature_type == "mfcc":
                out = power_to_db(out, cfg.top_db)
                out = jnp.einsum("bfm,mc->bfc", out, jnp.asarray(dct_np),
                                 preferred_element_type=jnp.float32)
            elif feature_type != "melspectrogram":
                raise ValueError(f"unknown feature_type {feature_type!r}")

        return out.reshape(batch_shape + out.shape[-2:])

    return frontend
