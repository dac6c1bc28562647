"""Frontend golden tests vs an independent scipy/numpy STFT oracle."""

import os

import numpy as np
import pytest
import scipy.fft
import scipy.signal

import jax.numpy as jnp

from speakerverification_tpu.ops import frontend as FE


def oracle_power_spectrogram(x, n_fft, win_length, hop_length, window="hamming",
                             pre_emph=None, center=True):
    """Independent oracle: scipy rfft per frame (torch.stft semantics)."""
    x = np.asarray(x, dtype=np.float64)
    if pre_emph is not None:
        pad = np.concatenate([x[1:2], x])       # reflect-pad 1 left
        x = pad[1:] - pre_emph * pad[:-1]
    if center:
        x = np.pad(x, n_fft // 2, mode="reflect")
    w = scipy.signal.get_window(window, win_length, fftbins=True)
    wp = np.zeros(n_fft)
    left = (n_fft - win_length) // 2
    wp[left:left + win_length] = w
    n_frames = 1 + (len(x) - n_fft) // hop_length
    frames = np.stack([x[i * hop_length:i * hop_length + n_fft] * wp
                       for i in range(n_frames)])
    spec = scipy.fft.rfft(frames, axis=-1)
    return np.abs(spec) ** 2                     # [frames, bins]


@pytest.mark.parametrize("sr,n_fft,win,hop", [(8000, 512, 200, 80),
                                              (16000, 512, 400, 160)])
def test_power_spectrogram_matches_scipy(sr, n_fft, win, hop):
    rng = np.random.default_rng(42)
    x = rng.normal(0, 0.1, sr).astype(np.float32)  # 1 second

    cfg = FE.FrontendConfig(sample_rate=sr, n_fft=n_fft, win_length=win,
                            hop_length=hop, pre_emphasis=0.97)
    fn = FE.make_frontend(cfg, "spectrogram")
    ours = np.asarray(fn(jnp.asarray(x)[None]))[0]

    ref = oracle_power_spectrogram(x, n_fft, win, hop, pre_emph=0.97)
    assert ours.shape == ref.shape == (1 + sr // hop, n_fft // 2 + 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_mel_spectrogram_matches_oracle():
    rng = np.random.default_rng(7)
    x = rng.normal(0, 0.1, 16000).astype(np.float32)
    cfg = FE.FrontendConfig()
    fn = FE.make_frontend(cfg, "melspectrogram")
    ours = np.asarray(fn(jnp.asarray(x)[None]))[0]

    power = oracle_power_spectrogram(x, cfg.n_fft, cfg.win_length,
                                     cfg.hop_length, pre_emph=0.97)
    fb = FE.mel_filterbank(cfg.n_fft // 2 + 1, cfg.n_mels, cfg.sample_rate,
                           cfg.fmin, cfg.fmax)
    ref = power @ fb
    assert ours.shape == (1 + 16000 // cfg.hop_length, cfg.n_mels)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-5)


def test_mel_scale_anchors():
    """Analytic anchor points of the slaney mel scale."""
    assert FE.hz_to_mel(1000.0) == pytest.approx(15.0)
    assert FE.hz_to_mel(200.0 / 3 * 10) == pytest.approx(10.0)
    assert float(FE.mel_to_hz(15.0 + 27.0)) == pytest.approx(6400.0)
    assert FE.hz_to_mel(0.0) == pytest.approx(0.0)
    # htk
    assert FE.hz_to_mel(700.0, "htk") == pytest.approx(2595.0 * np.log10(2))
    # round trip
    f = np.linspace(10, 4000, 50)
    np.testing.assert_allclose(FE.mel_to_hz(FE.hz_to_mel(f)), f, rtol=1e-10)


def test_mel_filterbank_properties():
    fb = FE.mel_filterbank(257, 80, 8000, fmin=10.0, fmax=4000.0)
    assert fb.shape == (257, 80)
    assert np.all(fb >= 0)
    # slaney normalization: each filter integrates (over Hz) to ~2/(width)·area ≈ 1
    m_pts = np.linspace(FE.hz_to_mel(10.0), FE.hz_to_mel(4000.0), 82)
    f_pts = FE.mel_to_hz(m_pts)
    peaks = 2.0 / (f_pts[2:] - f_pts[:-2])
    assert np.max(fb) == pytest.approx(np.max(peaks), rel=0.1)
    # every filter has support
    assert np.all(fb.sum(axis=0)[1:-1] > 0)


def test_pre_emphasis_parity():
    """y[0] = x[0] - c*x[1]; y[t] = x[t] - c*x[t-1] (src/utils.py:53-71)."""
    x = np.arange(10, dtype=np.float32)
    y = np.asarray(FE.pre_emphasis(jnp.asarray(x)[None], 0.97))[0]
    ref = np.concatenate([[x[0] - 0.97 * x[1]], x[1:] - 0.97 * x[:-1]])
    np.testing.assert_allclose(y, ref, rtol=1e-6)


def test_mfcc_shape_and_finite():
    cfg = FE.FrontendConfig()
    fn = FE.make_frontend(cfg, "mfcc")
    x = np.random.default_rng(1).normal(0, 0.1, (2, 16000)).astype(np.float32)
    out = np.asarray(fn(jnp.asarray(x)))
    assert out.shape == (2, 1 + 16000 // cfg.hop_length, cfg.n_mfcc)
    assert np.all(np.isfinite(out))


def test_dct_matrix_orthonormal():
    d = FE.dct_matrix(80, 80)
    np.testing.assert_allclose(d.T @ d, np.eye(80), atol=1e-4)


def test_raw_passthrough():
    fn = FE.make_frontend(FE.FrontendConfig(), "raw")
    x = jnp.ones((2, 100))
    assert fn(x) is x


def test_batch_shapes_preserved():
    cfg = FE.FrontendConfig()
    fn = FE.make_frontend(cfg, "melspectrogram")
    x = jnp.zeros((2, 3, 16000))
    out = fn(x)
    assert out.shape == (2, 3, 201, 80)


@pytest.mark.slow
def test_numeric_parity_at_default_xla_opt_level():
    """O2 canary (ADVICE r2): the whole CPU suite runs at
    --xla_backend_optimization_level=0 for compile speed, so numeric
    tolerances are otherwise never exercised at the optimization level
    production uses. Re-run the scipy-oracle frontend tests in a
    subprocess with the default (full) XLA pipeline."""
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "PYTEST_CURRENT_TEST")}
    env["JAX_PLATFORMS"] = "cpu"
    env["SV_TPU_KEEP_XLA_FLAGS"] = "1"   # conftest: skip the O0 override
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
         "tests/test_frontend.py::test_power_spectrogram_matches_scipy",
         "tests/test_frontend.py::test_mel_spectrogram_matches_oracle"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
