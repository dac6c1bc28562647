"""On-device TimeAugment chain (ops/timeaugment.py).

The reference module (src/models/OnStreamAugment/timeaugment.py) is
dead code over absent audiomentations packages, so there is no live
oracle — these tests assert OUR documented transform semantics
deterministically, plus jit/static-shape integration for both modes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speakerverification_tpu.ops.device_augment import AugmentBanks
from speakerverification_tpu.ops import timeaugment as ta


def _banks(L=400, n_noise=4, n_rir=3, seed=0):
    rng = np.random.default_rng(seed)
    noise = rng.normal(size=(n_noise, L)).astype(np.float32) * 0.1
    noise_db = 10.0 * np.log10(np.mean(noise ** 2, axis=1) + 1e-4)
    rir = np.zeros((n_rir, L), np.float32)
    for i in range(n_rir):
        rir[i, 5 * i + 2] = 1.0          # delayed unit impulses
        rir[i, 5 * i + 40] = 0.3
    return AugmentBanks(jnp.asarray(noise), jnp.asarray(noise_db),
                        jnp.full((n_noise,), 3.0), jnp.full((n_noise,), 15.0),
                        jnp.asarray(rir))


def test_gain_db_exact():
    x = jnp.ones((2, 8))
    out = ta._gain_db(x, jnp.asarray([20.0, -20.0]))
    np.testing.assert_allclose(out[0], 10.0, rtol=1e-6)
    np.testing.assert_allclose(out[1], 0.1, rtol=1e-6)


def test_roll_matches_numpy():
    x = np.arange(24, dtype=np.float32).reshape(2, 12)
    out = ta._roll(jnp.asarray(x), jnp.asarray([3, -5]))
    np.testing.assert_array_equal(np.asarray(out[0]), np.roll(x[0], 3))
    np.testing.assert_array_equal(np.asarray(out[1]), np.roll(x[1], -5))


def test_shift_fade_zeroes_seam():
    x = jnp.ones((1, 100))
    out = np.asarray(ta._shift_fade(x, jnp.asarray([30]), fade_len=5))
    assert out[0, 30] == 0.0                       # seam sample silenced
    assert out[0, 80] == 1.0                       # far from seam untouched
    assert 0.0 < out[0, 32] < 1.0                  # inside the fade ramp


def test_peak_normalize_only_too_loud():
    x = jnp.stack([jnp.linspace(-2.0, 2.0, 16), jnp.linspace(-0.5, 0.5, 16)])
    out = ta._peak_normalize_too_loud(x)
    np.testing.assert_allclose(np.max(np.abs(np.asarray(out[0]))), 1.0,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(x[1]))


def test_colored_noise_spectral_slope():
    key = jax.random.key(0)
    # brown (f_decay=2) must concentrate energy at low frequencies;
    # violet (-2) at high frequencies
    n = ta._colored_noise(key, (2, 4096), jnp.asarray([2.0, -2.0]))
    spec = np.abs(np.fft.rfft(np.asarray(n))) ** 2
    half = spec.shape[-1] // 2
    low0, high0 = spec[0, 1:half].sum(), spec[0, half:].sum()
    low1, high1 = spec[1, 1:half].sum(), spec[1, half:].sum()
    assert low0 > 10 * high0
    # violet power ∝ f² → upper-half/lower-half energy ratio is ~7 exactly
    assert high1 > 4 * low1
    rms = np.sqrt(np.mean(np.asarray(n) ** 2, axis=-1))
    np.testing.assert_allclose(rms, 1.0, rtol=1e-4)


def test_mix_at_snr_hits_target():
    key = jax.random.key(1)
    x = jax.random.normal(key, (3, 8192))
    unit = jax.random.normal(jax.random.key(2), (3, 8192))
    unit = unit / jnp.sqrt(jnp.mean(unit ** 2, -1, keepdims=True))
    snr = jnp.asarray([3.0, 10.0, 30.0])
    out = ta._mix_at_snr(x, unit, snr)
    noise = np.asarray(out - x)
    sig_rms = np.sqrt(np.mean(np.asarray(x) ** 2, axis=-1))
    noise_rms = np.sqrt(np.mean(noise ** 2, axis=-1))
    got = 20.0 * np.log10(sig_rms / noise_rms)
    np.testing.assert_allclose(got, np.asarray(snr), atol=0.05)


def test_compensate_delay_moves_peak_to_zero():
    banks = _banks()
    out = np.asarray(ta._compensate_delay(banks.rir))
    assert (np.argmax(np.abs(out), axis=-1) == 0).all()
    # relative tap spacing preserved
    assert out[1, 38] == pytest.approx(0.3)


def test_air_absorption_attenuates_high_freq_only():
    sr = 16000
    t = np.arange(2048) / sr
    low = np.sin(2 * np.pi * 100 * t).astype(np.float32)
    high = np.sin(2 * np.pi * 7000 * t).astype(np.float32)
    x = jnp.asarray(np.stack([low + high]))
    out = np.asarray(ta._air_absorption(
        x, jnp.asarray([15.0]), jnp.asarray([70.0]), jnp.asarray([1.0]), sr))
    spec_in = np.abs(np.fft.rfft(np.asarray(x[0])))
    spec_out = np.abs(np.fft.rfft(out[0]))
    f = np.fft.rfftfreq(2048, 1 / sr)
    i_low = np.argmin(np.abs(f - 100))
    i_high = np.argmin(np.abs(f - 7000))
    assert spec_out[i_low] / spec_in[i_low] > 0.999
    assert spec_out[i_high] / spec_in[i_high] < 0.999
    # monotone: higher frequency attenuated more
    assert (spec_out[i_high] / spec_in[i_high]
            < spec_out[i_low] / spec_in[i_low])


def test_tanh_distortion_preserves_rms_and_compresses():
    x = jax.random.normal(jax.random.key(3), (2, 4096))
    out = ta._tanh_distortion(x, jnp.asarray([0.2, 0.01]))
    rms_in = np.sqrt(np.mean(np.asarray(x) ** 2, axis=-1))
    rms_out = np.sqrt(np.mean(np.asarray(out) ** 2, axis=-1))
    np.testing.assert_allclose(rms_out, rms_in, rtol=1e-4)
    # stronger distortion → lower crest factor (peak/rms)
    crest_in = np.max(np.abs(np.asarray(x)), -1) / rms_in
    crest_out = np.max(np.abs(np.asarray(out)), -1) / rms_out
    assert crest_out[0] < crest_in[0]


def test_time_mask_zeroes_interior_with_fade():
    x = jnp.ones((1, 1000))
    out = np.asarray(ta._time_mask(x, jnp.asarray([0.2]), jnp.asarray([0.5])))
    band = 200
    start = int(0.5 * (1000 - band))
    mid = start + band // 2
    assert out[0, mid] == 0.0
    assert out[0, start - 5] == 1.0
    assert out[0, start + band + 5] == 1.0
    assert 0.0 < out[0, start + 5] < 1.0           # fade ramp


def test_gain_transition_ramp_then_hold():
    x = jnp.ones((1, 100))
    out = np.asarray(ta._gain_transition(
        x, jnp.asarray([20.0]), jnp.asarray([10.0]), jnp.asarray([20.0])))
    np.testing.assert_allclose(out[0, :10], 1.0, rtol=1e-6)   # before ramp
    np.testing.assert_allclose(out[0, 30:], 10.0, rtol=1e-6)  # after: +20 dB
    assert 1.0 < out[0, 20] < 10.0                            # mid ramp


@pytest.mark.parametrize("mode", ["torch", "np"])
def test_time_augment_jits_and_changes_signal(mode):
    banks = _banks()
    x = jax.random.normal(jax.random.key(7), (6, 400)) * 0.3
    fn = jax.jit(lambda w, k: ta.time_augment(w, k, banks, mode=mode,
                                              sample_rate=16000))
    out = fn(x, jax.random.key(11))
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    assert not np.allclose(np.asarray(out), np.asarray(x))
    # different key → different augmentation, same compiled fn
    out2 = fn(x, jax.random.key(12))
    assert not np.allclose(np.asarray(out), np.asarray(out2))


@pytest.mark.slow
def test_time_augment_no_banks_and_3d_shape():
    """Slow tier (r5 cold budget, 6 s of extra-shape compiles): both
    modes' 2-D default paths stay default-tier in
    test_time_augment_jits_and_changes_signal."""
    x = jax.random.normal(jax.random.key(9), (2, 3, 400)) * 0.3
    out = ta.time_augment(x, jax.random.key(1), banks=None, mode="np")
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    out_t = ta.time_augment(x, jax.random.key(1), banks=None, mode="torch")
    assert out_t.shape == x.shape


def test_np_mode_selects_exactly_k():
    # the exactly-k machinery, probed directly
    key = jax.random.key(5)
    k = jax.random.randint(jax.random.key(6), (64,), 4, 11)
    scores = jax.random.uniform(key, (64, 10))
    thr = jnp.take_along_axis(jnp.sort(scores, axis=-1)[:, ::-1],
                              (k - 1)[:, None], axis=-1)
    sel = np.asarray(scores >= thr)
    np.testing.assert_array_equal(sel.sum(axis=1), np.asarray(k))


def test_unknown_mode_raises():
    with pytest.raises(ValueError):
        ta.time_augment(jnp.zeros((1, 10)), jax.random.key(0), mode="bogus")


@pytest.mark.slow
def test_trainer_device_time_augment_end_to_end(tmp_path):
    """Trainer with device_time_augment composes the TimeAugment chain
    after on-device env_corrupt (shared banks) and trains an epoch."""
    from speakerverification_tpu.data.manifest import generate_metadata
    from speakerverification_tpu.data.wav_conversion import write_wav
    from speakerverification_tpu.training.trainer import Trainer

    SR = 8000
    rng = np.random.default_rng(7)
    data = tmp_path / "data"
    for spk in range(4):
        for utt in range(4):
            t = np.arange(int(1.2 * SR)) / SR
            sig = 0.3 * np.sin(2 * np.pi * (150 + 80 * spk) * t) \
                + rng.normal(0, 0.02, len(t))
            write_wav(data / f"spk{spk}" / f"u{utt}.wav",
                      sig.astype(np.float32), SR)
    for cat in ("noise", "music"):
        for i in range(3):
            write_wav(tmp_path / "musan_split" / cat / "s" / f"x{i}"
                      / f"{i}.wav",
                      rng.normal(0, 0.1, 12000).astype(np.float32), SR)
    write_wav(tmp_path / "RIRS_NOISES" / "simulated_rirs" / "sm" / "R0"
              / "r.wav",
              np.exp(-np.arange(1500) / 300.0).astype(np.float32), SR)
    generate_metadata(data, tmp_path / "meta", num_val_utts=0)

    hparams = {
        "seed": 3, "save_folder": str(tmp_path / "save"),
        "train_annotation": str(tmp_path / "meta" / "train.csv"),
        "number_of_epochs": 1, "batch_size": 4, "lr": 0.005,
        "nClasses": 4, "device_augment": True,
        "device_time_augment": "torch", "augment": True,
        "augment_options": {
            "augment_paths": {"musan": str(tmp_path / "musan_split"),
                              "noise_vad": "/nonexistent",
                              "rirs": str(tmp_path / "RIRS_NOISES")},
            "augment_chain": ["env_corrupt"],
            "noise_snr": {"noise": [0, 15], "music": [5, 15]},
            "noise_samples": {"noise": [1, 1], "music": [1, 1]},
        },
        "device_augment_noise_bank": 8, "device_augment_rir_bank": 2,
        "dataloader_options": {"batch_size": 4, "num_workers": 1,
                               "nPerSpeaker": 1, "max_seg_per_spk": 100},
        "audio_spec": {"sample_rate": SR, "sentence_len": 1.0,
                       "win_len": 0.025, "hop_len": 0.01},
        "n_mels": 24, "features": "melspectrogram",
        "model": {"name": "ECAPA_TDNN", "feature_type": "melspectrogram",
                  "nOut": 16, "channels": [16, 16, 16, 16, 48],
                  "kernel_sizes": [5, 3, 3, 3, 1],
                  "dilations": [1, 2, 3, 4, 1], "attention_channels": 4,
                  "res2net_scale": 4, "se_channels": 4},
        "criterion": {"name": "AAmSoftmax", "margin": 0.2, "scale": 30},
        "optimizer": {"name": "adam", "weight_decay": 0.0},
        "callbacks": {"name": "steplr"},
        "test_interval": -1, "save_model_last": True,
        "ckpt_interval_minutes": -1,
    }
    tr = Trainer(hparams)
    assert tr._augment_fn is not None
    assert tr._aug_banks is not None
    assert tr.loader.augmentor is None          # env_corrupt on device
    tr.fit()
    assert (tmp_path / "save" / "ECAPA_TDNN" / "AAmSoftmax" / "model"
            / "last_state.msgpack").exists()


@pytest.mark.slow
def test_trainer_time_augment_without_env_corrupt(tmp_path):
    """device_time_augment alone (no device_augment): host env_corrupt
    stays attached, banks still feed the chain's bg-noise/IR members."""
    from speakerverification_tpu.data.manifest import generate_metadata
    from speakerverification_tpu.data.wav_conversion import write_wav
    from speakerverification_tpu.training.trainer import Trainer

    SR = 8000
    rng = np.random.default_rng(8)
    data = tmp_path / "data"
    for spk in range(4):
        for utt in range(3):
            write_wav(data / f"spk{spk}" / f"u{utt}.wav",
                      rng.normal(0, 0.1, int(1.2 * SR)).astype(np.float32),
                      SR)
    for i in range(2):
        write_wav(tmp_path / "musan_split" / "noise" / "s" / f"x{i}"
                  / f"{i}.wav",
                  rng.normal(0, 0.1, 12000).astype(np.float32), SR)
    write_wav(tmp_path / "RIRS_NOISES" / "simulated_rirs" / "sm" / "R0"
              / "r.wav",
              np.exp(-np.arange(1500) / 300.0).astype(np.float32), SR)
    generate_metadata(data, tmp_path / "meta", num_val_utts=0)

    hparams = {
        "seed": 5, "save_folder": str(tmp_path / "save"),
        "train_annotation": str(tmp_path / "meta" / "train.csv"),
        "number_of_epochs": 1, "batch_size": 4, "lr": 0.005,
        "nClasses": 4, "device_time_augment": True, "augment": True,
        "augment_options": {
            "augment_paths": {"musan": str(tmp_path / "musan_split"),
                              "noise_vad": "/nonexistent",
                              "rirs": str(tmp_path / "RIRS_NOISES")},
            "augment_chain": ["env_corrupt"],
            "noise_snr": {"noise": [0, 15]},
            "noise_samples": {"noise": [1, 1]},
        },
        "device_augment_noise_bank": 4, "device_augment_rir_bank": 2,
        "dataloader_options": {"batch_size": 4, "num_workers": 1,
                               "nPerSpeaker": 1, "max_seg_per_spk": 100},
        "audio_spec": {"sample_rate": SR, "sentence_len": 1.0,
                       "win_len": 0.025, "hop_len": 0.01},
        "n_mels": 24, "features": "melspectrogram",
        "model": {"name": "ECAPA_TDNN", "feature_type": "melspectrogram",
                  "nOut": 16, "channels": [16, 16, 16, 16, 48],
                  "kernel_sizes": [5, 3, 3, 3, 1],
                  "dilations": [1, 2, 3, 4, 1], "attention_channels": 4,
                  "res2net_scale": 4, "se_channels": 4},
        "criterion": {"name": "AAmSoftmax", "margin": 0.2, "scale": 30},
        "optimizer": {"name": "adam", "weight_decay": 0.0},
        "callbacks": {"name": "steplr"},
        "test_interval": -1, "save_model_last": True,
        "ckpt_interval_minutes": -1,
    }
    tr = Trainer(hparams)
    assert tr._augment_fn is not None
    assert tr._aug_banks is not None
    assert tr.loader.augmentor is not None      # host env_corrupt kept
    tr.fit()
    assert (tmp_path / "save" / "ECAPA_TDNN" / "AAmSoftmax" / "model"
            / "last_state.msgpack").exists()
