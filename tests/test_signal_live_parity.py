"""Live-torch parity for the DSP library (ops/signal.py).

The reference's SpeechBrain DSP copy
(src/processing/signal_processing.py — pure torch, importable) runs
live on identical inputs against our single JAX implementation:
compute_amplitude (all type×scale combos, with/without lengths),
normalize, rescale (linear + dB), dB_to_amplitude, convolve1d (the
circular-FFT path with kernel rotation), reverberate (direct-path
alignment + level restore), notch_filter, overlap_and_add (incl. a
non-divisor hop exercising the gcd subframe path), and
gabor_impulse_response.

Documented divergence (asserted, not skipped): the reference's
``convolve1d(use_fft=False)`` is torch ``conv1d`` — CROSS-correlation —
while its own FFT branch is true convolution; the two disagree for any
asymmetric kernel. Both of our paths compute true convolution, so our
direct path matches the reference's FFT path, and matches the
reference's direct path only after flipping the kernel.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from speakerverification_tpu.ops import signal as S  # noqa: E402


@pytest.fixture(scope="module")
def sp():
    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")
    from processing import signal_processing as m

    return m


def _wave(shape=(3, 4000), seed=0, scale=0.3):
    rng = np.random.default_rng(seed)
    return (rng.normal(0, scale, shape)).astype(np.float32)


# ----------------------------------------------------- amplitude math

@pytest.mark.parametrize("amp_type,scale", [("avg", "linear"),
                                            ("avg", "dB"),
                                            ("peak", "linear"),
                                            ("peak", "dB")])
@pytest.mark.parametrize("use_lengths", [False, True])
def test_compute_amplitude_parity(sp, amp_type, scale, use_lengths):
    x = _wave()
    lengths = np.asarray([4000.0, 3000.0, 1.0], np.float32)
    t_len = torch.from_numpy(lengths).view(-1, 1) if use_lengths else None
    ref = sp.compute_amplitude(torch.from_numpy(x), t_len, amp_type,
                               scale).numpy()
    got = np.asarray(S.compute_amplitude(
        jnp.asarray(x), jnp.asarray(lengths) if use_lengths else None,
        amp_type, scale))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_normalize_rescale_parity(sp):
    x = _wave(seed=1)
    T = x.shape[-1]
    ref_n = sp.normalize(torch.from_numpy(x), None, "avg").numpy()
    got_n = np.asarray(S.normalize_amplitude(jnp.asarray(x), "avg"))
    np.testing.assert_allclose(got_n, ref_n, rtol=1e-5, atol=1e-6)

    for scale, lvl in [("linear", 0.7), ("dB", -12.0)]:
        ref_r = sp.rescale(torch.from_numpy(x), T, lvl, "peak", scale).numpy()
        got_r = np.asarray(S.rescale(jnp.asarray(x), lvl, "peak", scale))
        np.testing.assert_allclose(got_r, ref_r, rtol=1e-5, atol=1e-6)


def test_db_to_amplitude_parity(sp):
    for snr in (-20.0, 0.0, 10.0, 35.5):
        assert np.isclose(float(S.db_to_amplitude(jnp.float32(snr))),
                          sp.dB_to_amplitude(snr), rtol=1e-6)


# ---------------------------------------------------------- convolve1d

def test_convolve1d_fft_circular_parity(sp):
    """Circular FFT convolution with kernel rotation — exact reference
    semantics including the wrap-around at the signal edges."""
    x = _wave((2, 512), seed=2)
    ker = _wave((1, 64), seed=3, scale=1.0)[0]
    for rot in (0, 17):
        ref = sp.convolve1d(
            torch.from_numpy(x).unsqueeze(-1),
            torch.from_numpy(ker).view(1, -1, 1),
            use_fft=True, rotation_index=rot).squeeze(-1).numpy()
        got = np.asarray(S.convolve1d(jnp.asarray(x), jnp.asarray(ker),
                                      use_fft=True, rotation_index=rot))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_convolve1d_direct_parity_and_divergence(sp):
    """Our direct path mirrors the reference's exactly (torch conv1d =
    cross-correlation, valid output); for an asymmetric kernel that
    DISAGREES with the (true-convolution) FFT path — the reference's
    internal inconsistency, asserted here so it stays documented."""
    x = _wave((1, 200), seed=4)
    ker = np.zeros(9, np.float32)
    ker[1] = 1.0                                     # asymmetric shift kernel
    ref_direct = sp.convolve1d(
        torch.from_numpy(x).unsqueeze(-1),
        torch.from_numpy(ker).view(1, -1, 1),
        padding=4, use_fft=False).squeeze(-1).numpy()
    got_direct = np.asarray(S.convolve1d(jnp.asarray(x), jnp.asarray(ker),
                                         padding=4, use_fft=False))
    np.testing.assert_allclose(got_direct, ref_direct, rtol=1e-4, atol=1e-6)
    # the same call through the FFT branch convolves (flips the kernel):
    # the two reference branches disagree for asymmetric kernels
    got_fft = np.asarray(S.convolve1d(jnp.asarray(x), jnp.asarray(ker),
                                      padding=0, use_fft=True))
    assert not np.allclose(got_fft[:, 4:196], ref_direct[:, 3:195],
                           atol=1e-5)
    # cross-correlation advances by 1 where convolution delays by 1
    np.testing.assert_allclose(got_fft[0, 2:100], x[0, 1:99],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ref_direct[0, 4:100], x[0, 1:97],
                               rtol=1e-4, atol=1e-5)


def test_convolve1d_symmetric_kernel_both_paths(sp):
    """For symmetric kernels (the notch filter case) every path agrees."""
    x = _wave((2, 300), seed=5)
    ker = np.asarray(sp.notch_filter(0.25).squeeze().numpy())
    pad = len(ker) // 2
    ref = sp.convolve1d(
        torch.from_numpy(x).unsqueeze(-1),
        torch.from_numpy(ker).view(1, -1, 1),
        padding=pad, use_fft=False).squeeze(-1).numpy()
    got = np.asarray(S.convolve1d(jnp.asarray(x), jnp.asarray(ker),
                                  padding=pad, use_fft=False))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------- reverberate

def test_reverberate_parity(sp):
    x = _wave((1, 2000), seed=6)
    rir = np.zeros(400, np.float32)
    rir[60] = 1.0                                    # direct path at 60
    rng = np.random.default_rng(7)
    rir[61:] = (rng.normal(0, 0.08, 339) *
                np.exp(-np.arange(339) / 80.0)).astype(np.float32)
    ref = sp.reverberate(torch.from_numpy(x),
                         torch.from_numpy(rir)).numpy()
    got = np.asarray(S.reverberate(jnp.asarray(x), jnp.asarray(rir)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------- notch filter

@pytest.mark.parametrize("freq,width", [(0.25, 101), (0.5, 33), (0.9, 257)])
def test_notch_filter_parity(sp, freq, width):
    ref = sp.notch_filter(freq, width).squeeze().numpy()
    got = np.asarray(S.notch_filter(freq, width))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


# ------------------------------------------------------ overlap_and_add

@pytest.mark.parametrize("frame_len,step", [(20, 20), (20, 10), (16, 6)])
def test_overlap_and_add_parity(sp, frame_len, step):
    rng = np.random.default_rng(8)
    frames = rng.normal(0, 1, (2, 7, frame_len)).astype(np.float32)
    ref = sp.overlap_and_add(torch.from_numpy(frames), step).numpy()
    got = np.asarray(S.overlap_and_add(jnp.asarray(frames), step))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


# -------------------------------------------- PreEmphasis / mixup

def test_pre_emphasis_live_parity():
    """src/utils.py:53-71 PreEmphasis (reflect pad + [-c, 1] conv) vs
    our ops/frontend.py::pre_emphasis, on the live reference class."""
    from test_torch_parity import _install_asteroid_stub

    _install_asteroid_stub()
    import utils as ref_utils

    from speakerverification_tpu.ops.frontend import pre_emphasis

    x = _wave((3, 500), seed=9)
    ref = ref_utils.PreEmphasis(0.97)(torch.from_numpy(x)).numpy()
    got = np.asarray(pre_emphasis(jnp.asarray(x), 0.97))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("label_type", ["soft", "hard"])
def test_mixup_live_parity(label_type):
    """OnStreamAugment mixup with injected (permutation, c) — exact on
    both features and clamped labels for soft and hard label modes."""
    path = "/root/reference/src/models/OnStreamAugment"
    if path not in sys.path:
        sys.path.insert(0, path)
    import FilterAugment as ref_fa

    from speakerverification_tpu.ops.filteraugment import mixup

    import jax

    rng = np.random.default_rng(10)
    feats = rng.normal(0, 1, (6, 30, 12)).astype(np.float32)
    label = (rng.random((6, 4)) < 0.5).astype(np.float32)
    perm = np.asarray([3, 0, 5, 1, 4, 2])
    c = 0.37
    ref_x, ref_y = ref_fa.mixup(torch.from_numpy(feats.copy()),
                                torch.from_numpy(label.copy()),
                                permutation=torch.from_numpy(perm),
                                c=c, mixup_label_type=label_type)
    got_x, got_y = mixup(jax.random.PRNGKey(0), jnp.asarray(feats),
                         jnp.asarray(label), mixup_label_type=label_type,
                         permutation=perm, c=c)
    np.testing.assert_allclose(np.asarray(got_x), ref_x.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_y), ref_y.numpy(),
                               rtol=1e-5, atol=1e-6)


# ------------------------------------------------------------- gabor

def test_twin_dsp_copies_agree(sp):
    """SURVEY.md lists the DSP library TWICE (signal_processing.py and
    audio_signal.py). They are functionally identical (numpy coercion +
    docstrings aside; gabor lives only in signal_processing) — asserted
    here so our single JAX copy provably covers both."""
    from processing import audio_signal as sp2

    np.testing.assert_allclose(sp.notch_filter(0.3).numpy(),
                               sp2.notch_filter(0.3).numpy(), atol=0)
    x = _wave((1, 1500), seed=11)
    rir = _wave((1, 200), seed=12, scale=1.0)[0]
    a = sp.reverberate(torch.from_numpy(x), torch.from_numpy(rir)).numpy()
    b = sp2.reverberate(torch.from_numpy(x), torch.from_numpy(rir)).numpy()
    np.testing.assert_allclose(a, b, atol=0)


def test_gabor_impulse_response_parity(sp):
    t = np.arange(-200, 201, dtype=np.float32)
    center = np.asarray([0.3, 1.1, 2.6], np.float32)
    fwhm = np.asarray([15.0, 40.0, 90.0], np.float32)
    ref = sp.gabor_impulse_response(torch.from_numpy(t),
                                    torch.from_numpy(center),
                                    torch.from_numpy(fwhm)).numpy()
    got = np.asarray(S.gabor_impulse_response(jnp.asarray(t),
                                              jnp.asarray(center),
                                              jnp.asarray(fwhm)))
    np.testing.assert_allclose(got.real, ref.real, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(got.imag, ref.imag, rtol=1e-4, atol=1e-6)
