"""Pin the nnAudio default-backend numerics (VERDICT r3 item #6).

The reference's default feature backend is nnAudio
(``lib: nnaudio``, /root/reference/yaml/configuration.yaml:72); the factory at
/root/reference/src/models/FeatureExtraction/feature.py:67-94 builds
``nnAudio.features.mel.MelSpectrogram(sr, n_fft, win_length, n_mels,
hop_length, window, fmin, fmax)`` and leaves every other knob at nnAudio's
defaults: ``center=True, pad_mode='reflect', power=2.0, htk=False, norm=1``.
nnAudio is not importable in this image, so this file carries a self-contained
NumPy oracle of its *published* algorithm (github.com/KinWaiCheuk/nnAudio,
``nnAudio/utils.py::create_fourier_kernels`` + ``Spectrogram.MelSpectrogram``):

  1. window = scipy ``get_window(window, win_length, fftbins=True)``,
     center-padded to ``n_fft`` (librosa ``pad_center``);
  2. conv1d-STFT: cos/sin kernels ``cos(2*pi*k*t/n_fft) * window`` for
     k in 0..n_fft//2, correlated at stride ``hop`` over the input after
     ``ReflectionPad1d(n_fft//2)``;
  3. power spectrum ``real**2 + imag**2`` (``power=2.0``);
  4. mel projection ``librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax,
     htk=False, norm=1)``.

The one genuinely version-dependent knob is step 4's ``norm=1``:
librosa < 0.8 read the integer 1 as Slaney area-normalization (the only
accepted value), librosa >= 0.8 reads it as unit-l1 row normalization.
nnAudio passes the integer verbatim, so which one the reference actually
computed depends on the librosa it ran against. Both interpretations are
oracled here; the tests prove

  * our pinned torchaudio-slaney frontend (ops/frontend.py) equals the
    legacy/slaney reading of nnAudio bit-for-bit-modulo-f32 for the
    reference's default configs, and
  * the l1 reading differs from slaney ONLY by a per-mel-row positive
    scalar, which the models' own log + per-bin mean subtraction (CMN,
    reference src/models/ECAPA_TDNN.py:469-478) provably erases.

Together these pin the numerics of the default backend for the "EER within
0.1 % with ported weights" north star: whatever librosa era the reference
checkpoint was trained under, the post-CMN features our frontend feeds the
backbone match it.
"""

import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from speakerverification_tpu.ops import frontend as FE


# ---------------------------------------------------------------------------
# The oracle: nnAudio MelSpectrogram, published algorithm, NumPy float64.
# ---------------------------------------------------------------------------

def _nnaudio_fourier_kernels(n_fft: int, win_length: int, window: str):
    """cos/sin conv kernels exactly as nnAudio's ``create_fourier_kernels``
    builds them (freq_scale='no', freq_bins=n_fft//2+1)."""
    freq_bins = n_fft // 2 + 1
    s = np.arange(n_fft, dtype=np.float64)
    # scipy periodic window, centered inside the n_fft frame (pad_center)
    w = scipy.signal.get_window(window, win_length, fftbins=True)
    mask = np.zeros(n_fft, dtype=np.float64)
    left = (n_fft - win_length) // 2
    mask[left:left + win_length] = w
    k = np.arange(freq_bins, dtype=np.float64)[:, None]
    wcos = np.cos(2 * np.pi * k * s[None, :] / n_fft) * mask[None, :]
    wsin = np.sin(2 * np.pi * k * s[None, :] / n_fft) * mask[None, :]
    return wcos, wsin  # [freq_bins, n_fft]


def _librosa_mel_basis(sr, n_fft, n_mels, fmin, fmax, norm):
    """librosa.filters.mel (htk=False → Slaney mel scale), with ``norm`` in
    {'slaney', 'l1'} covering the two librosa-era readings of nnAudio's
    default ``norm=1``. Returns [n_mels, n_freqs]."""
    fmax = sr / 2.0 if fmax is None else fmax
    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_f = FE.mel_to_hz(
        np.linspace(FE.hz_to_mel(fmin), FE.hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (mel_f[2:n_mels + 2] - mel_f[:n_mels])
        weights *= enorm[:, None]
    elif norm == "l1":
        # librosa >= 0.8: util.normalize(weights, norm=1, axis=-1)
        weights /= np.sum(np.abs(weights), axis=-1, keepdims=True)
    else:
        raise ValueError(norm)
    return weights


def nnaudio_melspectrogram(x, sr=8000, n_fft=512, win_length=200, n_mels=80,
                           hop_length=80, window="hamming", fmin=0.0,
                           fmax=None, norm="slaney", pre_emph=None):
    """nnAudio MelSpectrogram forward, float64. Returns [frames, n_mels]
    (transposed from nnAudio's [n_mels, frames] to our layout)."""
    x = np.asarray(x, dtype=np.float64)
    if pre_emph is not None:
        # the factory prepends the reference's PreEmphasis (conv1d over a
        # (1, 0) reflect pad, src/utils.py:53-71): y[0] = x[0] - c * x[1]
        pad = np.concatenate([x[1:2], x])
        x = pad[1:] - pre_emph * pad[:-1]
    x = np.pad(x, n_fft // 2, mode="reflect")          # ReflectionPad1d
    wcos, wsin = _nnaudio_fourier_kernels(n_fft, win_length, window)
    n_frames = 1 + (len(x) - n_fft) // hop_length
    frames = np.stack([x[i * hop_length:i * hop_length + n_fft]
                       for i in range(n_frames)])      # conv1d stride=hop
    real = frames @ wcos.T
    imag = frames @ wsin.T
    power = real ** 2 + imag ** 2                      # power=2.0 default
    mel = _librosa_mel_basis(sr, n_fft, n_mels, fmin, fmax, norm)
    return power @ mel.T


# ---------------------------------------------------------------------------
# 1. Our frontend == nnAudio(slaney reading), reference default configs.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sr,n_fft,win,hop,fmin,fmax", [
    # melspectrogram factory defaults (feature.py:67-75): fmin=0, fmax=None —
    # what the default Raw3_ECAPA mel branch actually computes
    (8000, 512, 200, 80, 0.0, None),
    # mfcc factory defaults (feature.py:34-38): fmin=10, fmax=4000
    (8000, 512, 200, 80, 10.0, 4000.0),
    # a 16 kHz variant
    (16000, 512, 400, 160, 20.0, 7600.0),
])
def test_frontend_matches_nnaudio_slaney(sr, n_fft, win, hop, fmin, fmax):
    rng = np.random.default_rng(11)
    x = rng.normal(0, 0.1, sr).astype(np.float32)

    cfg = FE.FrontendConfig(sample_rate=sr, n_fft=n_fft, win_length=win,
                            hop_length=hop, fmin=fmin, fmax=fmax,
                            pre_emphasis=0.97)
    ours = np.asarray(FE.make_frontend(cfg, "melspectrogram")(
        jnp.asarray(x)[None]))[0]

    ref = nnaudio_melspectrogram(x, sr=sr, n_fft=n_fft, win_length=win,
                                 hop_length=hop, fmin=fmin, fmax=fmax,
                                 norm="slaney", pre_emph=0.97)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-3,
                               atol=2e-4 * float(np.max(ref)))


def test_oracle_power_path_matches_rfft():
    """Self-check: the conv-kernel formulation equals an rFFT formulation
    (nnAudio's conv1d-STFT is an exact windowed DFT, not an approximation)."""
    rng = np.random.default_rng(3)
    x = rng.normal(0, 0.1, 4000)
    wcos, wsin = _nnaudio_fourier_kernels(512, 200, "hamming")
    xp = np.pad(x, 256, mode="reflect")
    frames = np.stack([xp[i * 80:i * 80 + 512] for i in range(44)])
    conv_power = (frames @ wcos.T) ** 2 + (frames @ wsin.T) ** 2
    w = np.zeros(512)
    w[156:356] = scipy.signal.get_window("hamming", 200, fftbins=True)
    fft_power = np.abs(np.fft.rfft(frames * w[None, :], axis=-1)) ** 2
    np.testing.assert_allclose(conv_power, fft_power, rtol=1e-9, atol=1e-12)


# ---------------------------------------------------------------------------
# 2. The l1 reading of norm=1: a per-row rescale that CMN erases.
# ---------------------------------------------------------------------------

def test_norm1_l1_variant_is_row_rescale():
    slaney = _librosa_mel_basis(8000, 512, 80, 0.0, None, "slaney")
    l1 = _librosa_mel_basis(8000, 512, 80, 0.0, None, "l1")
    # every mel row is the same triangle times a positive scalar
    for i in range(80):
        nz = slaney[i] > 0
        assert nz.any()
        ratio = l1[i, nz] / slaney[i, nz]
        assert ratio.min() > 0
        np.testing.assert_allclose(ratio, ratio[0], rtol=1e-9)


def test_cmn_erases_the_norm1_ambiguity():
    """log(mel) + per-bin mean subtraction over time — the in-model
    normalization every mel consumer applies (reference
    src/models/ECAPA_TDNN.py:469-478: ``(x + 1e-6).log()`` then
    ``x - x.mean(dim=-1, keepdim=True)``) — maps both librosa-era readings
    of nnAudio's ``norm=1`` to the same features."""
    rng = np.random.default_rng(5)
    # realistic speech-scale int16-normalized audio (the loaders feed
    # waveforms with |x| up to ~1e4 like soundfile int16 reads)
    x = (rng.normal(0, 0.05, 16000)
         + 0.3 * np.sin(2 * np.pi * 220 * np.arange(16000) / 8000)) * 3000.0

    feats = {}
    for norm in ("slaney", "l1"):
        mel = nnaudio_melspectrogram(x, norm=norm, pre_emph=0.97)
        log = np.log(mel + 1e-6)
        feats[norm] = log - log.mean(axis=0, keepdims=True)  # CMN over time

    # exact up to the 1e-6 epsilon's interaction with the rescale; on
    # speech-scale energies that residual is far below any model's noise
    # floor (documented in PARITY.md §2.3)
    np.testing.assert_allclose(feats["l1"], feats["slaney"],
                               rtol=1e-6, atol=1e-6)

    # and without the epsilon the identity is exact
    for norm in ("slaney", "l1"):
        mel = nnaudio_melspectrogram(x, norm=norm, pre_emph=0.97)
        log = np.log(mel)
        feats[norm] = log - log.mean(axis=0, keepdims=True)
    np.testing.assert_allclose(feats["l1"], feats["slaney"],
                               rtol=1e-12, atol=1e-10)


# ---------------------------------------------------------------------------
# 3. Builder defaults follow the reference factory's per-feature defaults.
# ---------------------------------------------------------------------------

def test_builder_defaults_match_reference_factories():
    """feature.py's two factories default differently — melspectrogram:
    fmin=0, fmax=None (:71-72); mfcc: fmin=10, fmax=4000 (:37) — and the
    default config passes neither, so the builder must key its defaults on
    the feature type or ported default-config checkpoints see shifted mel
    band edges (fmin 10 vs 0 moves every filter; CMN does NOT erase that)."""
    from speakerverification_tpu.builder import frontend_from_hparams

    mel_cfg = frontend_from_hparams({}, feature_type="melspectrogram")
    assert mel_cfg.fmin == 0.0
    assert mel_cfg.fmax in (None, 4000.0)  # None → sr/2 = 4000 at 8 kHz

    mfcc_cfg = frontend_from_hparams({}, feature_type="mfcc")
    assert mfcc_cfg.fmin == 10.0
    assert float(mfcc_cfg.fmax) == 4000.0

    # explicit config keys still win for both
    ovr = frontend_from_hparams({"fmin": 25.0, "fmax": 3500.0},
                                feature_type="melspectrogram")
    assert ovr.fmin == 25.0 and float(ovr.fmax) == 3500.0
