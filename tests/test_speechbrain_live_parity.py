"""Live-torch parity for the vendored SpeechBrain feature stack.

SURVEY.md §2.3 lists the reference's SpeechBrain feature copy
(src/models/FeatureExtraction/features_speechbrain.py — pure torch,
importable in this image) as a component; until now our counterparts
were verified only by hand oracles / roundtrips. Here every class runs
LIVE on identical inputs against our ops:

* ``STFT``              vs ``ops/frontend.py::dft_matrices`` framing
                           (center=False and the win<n_fft centering)
* ``spectral_magnitude`` vs re²+im² (our power path)
* ``Filterbank``        vs ``ops/features_extra.speechbrain_fbank_matrix``
                           (+ ``speechbrain_log_fbank``) for all three
                           filter shapes — note this is the HTK-mel
                           construction, distinct from the
                           torchaudio-slaney matrix the model frontends
                           use (that one is scipy-oracle tested)
* ``DCT``               vs ``ops/frontend.py::dct_matrix`` (ortho + raw)
* ``Deltas``            vs ``ops/features_extra.deltas``
* ``ContextWindow``     vs ``ops/features_extra.context_window``
                           (channel-major layout, zero-padded borders)
* ``ISTFT``             vs ``ops/features_extra.istft`` (sign convention:
                           our frontend's sin basis yields −Im)
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from speakerverification_tpu.ops import features_extra as FX  # noqa: E402
from speakerverification_tpu.ops.frontend import (  # noqa: E402
    FrontendConfig,
    dct_matrix,
    dft_matrices,
    frame_indices,
)


@pytest.fixture(scope="module")
def sb():
    """Import the reference's vendored SpeechBrain feature module live."""
    path = "/root/reference/src/models/FeatureExtraction"
    if path not in sys.path:
        sys.path.insert(0, path)
    import features_speechbrain as m

    return m


SR = 16000


def _wave(n=SR, seed=0, batch=2):
    rng = np.random.default_rng(seed)
    return rng.normal(0, 0.3, (batch, n)).astype(np.float32)


# ---------------------------------------------------------------- STFT

@pytest.mark.parametrize("win_ms,n_fft", [(25, 400), (16, 512)])
def test_stft_parity(sb, win_ms, n_fft):
    """torch.stft (center=False) == our framed windowed-DFT GEMM,
    including the centered placement of win_length < n_fft windows."""
    x = _wave()
    ref = sb.STFT(sample_rate=SR, win_length=win_ms, hop_length=10,
                  n_fft=n_fft, center=False)
    got_ref = ref(torch.from_numpy(x)).numpy()          # [B, T, bins, 2]

    win = int(round(SR / 1000.0 * win_ms))
    hop = int(round(SR / 1000.0 * 10))
    cos_b, sin_b = dft_matrices(n_fft, win, "hamming")
    idx = frame_indices(x.shape[-1], n_fft, hop)
    frames = x[:, idx]                                   # [B, T, n_fft]
    re = frames @ cos_b
    im = -(frames @ sin_b)                               # sin basis = −Im
    assert got_ref.shape[:3] == re.shape
    np.testing.assert_allclose(re, got_ref[..., 0], atol=2e-3)
    np.testing.assert_allclose(im, got_ref[..., 1], atol=2e-3)


def test_spectral_magnitude_parity(sb):
    x = _wave(n=8000)
    stft = sb.STFT(sample_rate=SR, win_length=25, hop_length=10, n_fft=400)
    s = stft(torch.from_numpy(x))
    ref_pow = sb.spectral_magnitude(s, power=1).numpy()
    ref_mag = sb.spectral_magnitude(s, power=0.5).numpy()
    re, im = s[..., 0].numpy(), s[..., 1].numpy()
    power = re * re + im * im
    np.testing.assert_allclose(power, ref_pow, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.sqrt(power + 1e-14), ref_mag,
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------- Filterbank

@pytest.mark.parametrize("shape", ["triangular", "rectangular", "gaussian"])
@pytest.mark.parametrize("n_mels,f_min,f_max,n_fft,sr",
                         [(40, 0.0, 8000.0, 400, 16000),
                          (80, 20.0, 7600.0, 512, 16000),
                          (64, 10.0, 3800.0, 512, 8001)])  # odd sr // 2
def test_fbank_matrix_parity(sb, shape, n_mels, f_min, f_max, n_fft, sr):
    ref = sb.Filterbank(n_mels=n_mels, f_min=f_min, f_max=f_max,
                        n_fft=n_fft, sample_rate=sr, filter_shape=shape,
                        log_mel=False)
    spec = np.eye(n_fft // 2 + 1, dtype=np.float32)[None]  # unit impulses
    ref_mat = ref(torch.from_numpy(spec)).numpy()[0]        # [n_stft, n_mels]
    got = FX.speechbrain_fbank_matrix(n_mels, f_min, f_max, n_fft, sr, shape)
    # torch.linspace and np.linspace differ by ~1 ulp in fp32; narrow
    # triangles amplify that to ~2e-5 on a few edge bins
    np.testing.assert_allclose(got, ref_mat, atol=5e-5)


def test_log_fbank_parity(sb):
    """Full Filterbank forward incl. the per-sequence top_db clamp."""
    rng = np.random.default_rng(3)
    spec = (rng.gamma(1.0, 1.0, (3, 50, 201)) * 10.0 ** rng.uniform(
        -12, 2, (3, 50, 201))).astype(np.float32)           # huge dyn range
    ref = sb.Filterbank(n_mels=40, f_min=0.0, f_max=8000.0, n_fft=400,
                        sample_rate=16000, log_mel=True)
    ref_out = ref(torch.from_numpy(spec)).numpy()
    mat = FX.speechbrain_fbank_matrix(40, 0.0, 8000.0, 400, 16000)
    got = np.asarray(FX.speechbrain_log_fbank(jnp.asarray(spec @ mat)))
    # fp32 matmul association differences shift a handful of dB values
    # near the clamp boundary by ~3e-3
    np.testing.assert_allclose(got, ref_out, rtol=2e-3, atol=5e-3)


# ----------------------------------------------------------------- DCT

@pytest.mark.parametrize("ortho", [True, False])
def test_dct_parity(sb, ortho):
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (2, 30, 40)).astype(np.float32)
    ref = sb.DCT(input_size=40, n_out=20, ortho_norm=ortho)
    ref_out = ref(torch.from_numpy(x)).numpy()
    got = x @ dct_matrix(20, 40, "ortho" if ortho else "none")
    np.testing.assert_allclose(got, ref_out, rtol=1e-4, atol=1e-5)


# -------------------------------------------------------------- Deltas

@pytest.mark.parametrize("win", [5, 7])
def test_deltas_parity(sb, win):
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (2, 40, 12)).astype(np.float32)
    ref = sb.Deltas(input_size=12, window_length=win)
    ref_out = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(FX.deltas(jnp.asarray(x), window_length=win))
    np.testing.assert_allclose(got, ref_out, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------- ContextWindow

@pytest.mark.parametrize("left,right", [(5, 5), (3, 1), (1, 3), (0, 0)])
def test_context_window_parity(sb, left, right):
    rng = np.random.default_rng(4)
    x = rng.normal(0, 1, (2, 25, 6)).astype(np.float32)
    ref = sb.ContextWindow(left_frames=left, right_frames=right)
    ref_out = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(FX.context_window(jnp.asarray(x), left, right))
    np.testing.assert_allclose(got, ref_out, atol=1e-6)


# --------------------------------------------------------------- ISTFT

def test_istft_parity(sb):
    """Same onesided spectrum through torch.istft and our OLA synthesis."""
    rng = np.random.default_rng(5)
    frames, bins, n_fft, hop_ms = 60, 201, 400, 10
    re = rng.normal(0, 1, (2, frames, bins)).astype(np.float32)
    im = rng.normal(0, 1, (2, frames, bins)).astype(np.float32)
    im[:, :, 0] = 0.0
    im[:, :, -1] = 0.0                                   # real DC/Nyquist
    length = 8000

    ref = sb.ISTFT(sample_rate=SR, win_length=25, hop_length=hop_ms)
    stacked = torch.from_numpy(np.stack([re, im], axis=-1))
    ref_out = ref(stacked, sig_length=length).numpy()

    cfg = FrontendConfig(sample_rate=SR, n_fft=n_fft, win_length=400,
                         hop_length=160, window="hamming")
    got = np.asarray(FX.istft(jnp.asarray(re), jnp.asarray(-im), cfg,
                              length=length))
    np.testing.assert_allclose(got, ref_out, rtol=1e-3, atol=1e-4)
