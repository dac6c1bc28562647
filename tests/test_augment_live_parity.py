"""Live-reference parity for loadWAV + AugmentWAV (the augment math).

The env-corrupt math (SNR-scaled additive mixing, energy-normalized
full-convolution reverb) was previously verified against hand oracles;
here the reference's OWN ``src/processing/audio_loader.py`` runs live —
``soundfile`` is stubbed onto our C++/numpy WAV decoder (both produce
identical /32768-scaled float32 for 16-bit PCM), ``pydub``/``torchaudio``
are import-only stubs (that code path is never taken with
``read_mode='sf'``).

Randomness is ELIMINATED rather than seed-matched: every noise category
holds exactly one file, ``noise_samples`` pins k=1, ``noise_snr`` pins
the SNR to a point, noise files are shorter than ``max_audio`` (the
pad-wrap leaves exactly one valid crop offset, so the random crop start
is 0 on both sides), and there is a single RIR. Every compared quantity
is then a pure function of the inputs.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

pytest.importorskip("torch")

from speakerverification_tpu.data import write_wav  # noqa: E402
from speakerverification_tpu.data.audio import load_wav  # noqa: E402
from speakerverification_tpu.data.augment import AugmentWav  # noqa: E402

SR = 8000
SPEC = {"sample_rate": SR, "channels": 1, "sentence_len": 1.0,
        "win_len": 0.025, "hop_len": 0.01}
MAX_AUDIO = SR  # sentence_len * sr
CATS = ["noise", "speech", "music", "noise_vad", "noise_rirs"]


@pytest.fixture(scope="module")
def ref_audio_loader():
    """Import the reference's processing.audio_loader with decoder shims."""
    from test_torch_parity import _install_asteroid_stub

    _install_asteroid_stub()                 # torchaudio/librosa stubs
    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")

    from speakerverification_tpu.data.wavio import read_wav

    if "soundfile" not in sys.modules:
        sf = types.ModuleType("soundfile")

        def read(path, *a, **k):             # sf.read(path, dtype='float32')
            return read_wav(str(path))

        sf.read = read
        sys.modules["soundfile"] = sf
    if "pydub" not in sys.modules:
        pd = types.ModuleType("pydub")
        pd.AudioSegment = type("AudioSegment", (), {})
        sys.modules["pydub"] = pd

    from processing import audio_loader as m
    return m


@pytest.fixture(scope="module")
def augment_tree(tmp_path_factory):
    """One WAV per noise category + one simulated RIR, in the reference's
    folder conventions (audio_loader.py:185-214)."""
    root = tmp_path_factory.mktemp("aug")
    rng = np.random.default_rng(11)

    def wav(relpath, n, scale=0.1):
        sig = (rng.normal(0, scale, n)).astype(np.float32)
        sig = np.clip(sig, -0.99, 0.99)
        write_wav(root / relpath, sig, SR)

    # shorter than MAX_AUDIO → pad-wrap leaves exactly one crop offset.
    # MUSAN layout is the split_musan output — category/source/utt/chunk
    # (4 levels: audio_loader.py:188-195 globs */*/*/*.wav and takes
    # path[-4] as the category)
    wav("musan_split/noise/free-sound/noise-0001/c00.wav", 6000)
    wav("musan_split/speech/librivox/speech-0001/c00.wav", 5000)
    wav("musan_split/music/fma/music-0001/c00.wav", 7000)
    wav("noise_vad/callcenter/nv-0001.wav", 4000)
    wav("rirs/pointsource_noises/pn-0001.wav", 6500)
    wav("rirs/simulated_rirs/smallroom/Room001/Room001-00001.wav", 400,
        scale=0.3)

    options = {
        "augment_chain": ["env_corrupt"],
        "augment_paths": {"musan": str(root / "musan_split"),
                          "noise_vad": str(root / "noise_vad"),
                          "rirs": str(root / "rirs")},
        "noise_snr": {"noise": [5, 5], "speech": [4, 4], "music": [6, 6],
                      "noise_vad": [3, 3], "noise_rirs": [7, 7]},
        "noise_samples": {c: [1, 1] for c in CATS},
    }
    return options


def _clean_audio(seed=3):
    rng = np.random.default_rng(seed)
    return (0.1 * rng.normal(0, 1, (1, MAX_AUDIO))).astype(np.float32)


def test_loadwav_live_parity(ref_audio_loader, augment_tree, tmp_path):
    """Reference loadWAV vs our load_wav, byte-identical decode + crops."""
    rng = np.random.default_rng(5)
    long_f = tmp_path / "long.wav"
    write_wav(long_f, rng.normal(0, 0.1, 3 * SR).astype(np.float32), SR)
    short_f = tmp_path / "short.wav"
    write_wav(short_f, rng.normal(0, 0.1, 5000).astype(np.float32), SR)

    # eval mode: num_eval linspace'd crops
    ref = ref_audio_loader.loadWAV(str(long_f), SPEC, evalmode=True,
                                   num_eval=5)
    ours = load_wav(str(long_f), SPEC, evalmode=True, num_eval=5)
    np.testing.assert_array_equal(ours, ref)

    # num_eval=0: whole file
    ref = ref_audio_loader.loadWAV(str(long_f), SPEC, evalmode=True,
                                   num_eval=0)
    ours = load_wav(str(long_f), SPEC, evalmode=True, num_eval=0)
    np.testing.assert_array_equal(ours, ref)

    # train mode, offset 0 (random_chunk=False)
    ref = ref_audio_loader.loadWAV(str(long_f), SPEC, evalmode=False,
                                   random_chunk=False)
    ours = load_wav(str(long_f), SPEC, evalmode=False, random_chunk=False)
    np.testing.assert_array_equal(ours, ref)

    # short file: pad-wrap, single valid offset → deterministic
    ref = ref_audio_loader.loadWAV(str(short_f), SPEC, evalmode=False)
    ours = load_wav(str(short_f), SPEC, evalmode=False)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("cat", CATS)
def test_additive_noise_live_parity(ref_audio_loader, augment_tree, cat):
    ref_aug = ref_audio_loader.AugmentWAV(augment_tree, SPEC)
    ours = AugmentWav(augment_tree, SPEC, rng=np.random.default_rng(0))
    audio = _clean_audio()
    ref_out = ref_aug.additive_noise(cat, audio.copy())
    our_out = ours.additive_noise(cat, audio.copy())
    assert ref_out.shape == our_out.shape == (1, MAX_AUDIO)
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-6, atol=1e-7)
    assert not np.allclose(our_out, audio)        # noise actually mixed


def test_reverberate_live_parity(ref_audio_loader, augment_tree):
    ref_aug = ref_audio_loader.AugmentWAV(augment_tree, SPEC)
    ours = AugmentWav(augment_tree, SPEC, rng=np.random.default_rng(0))
    audio = _clean_audio(seed=9)
    ref_out = ref_aug.reverberate(audio.copy())
    our_out = ours.reverberate(audio.copy())
    assert ref_out.shape == our_out.shape == (1, MAX_AUDIO)
    # ours uses fftconvolve, the reference direct/auto convolve — identical
    # math, float-accumulation differences only
    np.testing.assert_allclose(our_out, ref_out, rtol=2e-4, atol=1e-6)
    assert not np.allclose(our_out, audio)
