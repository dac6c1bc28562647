"""On-device batched env-corrupt (ops/device_augment.py): math parity
with the host AugmentWav formulas, distribution sanity, train-step hook.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from scipy import signal as sps

from speakerverification_tpu.ops.device_augment import (
    AugmentBanks,
    _mix_noise,
    _reverberate,
    build_banks,
    device_env_corrupt,
)

SR = 8000
SPEC = {"sample_rate": SR, "max_frames": 100}   # max_audio = 8240 @ 8k? no:


def _banks(L=1600, n_noise=8, n_rir=4, lr=400, seed=0):
    rng = np.random.default_rng(seed)
    noise = rng.normal(0, 0.1, (n_noise, L)).astype(np.float32)
    rir = rng.normal(0, 1, (n_rir, lr)).astype(np.float32)
    rir /= np.sqrt(np.sum(rir ** 2, axis=1, keepdims=True))
    return AugmentBanks(
        jnp.asarray(noise),
        jnp.asarray(10 * np.log10(np.mean(noise ** 2, 1) + 1e-4)),
        jnp.full((n_noise,), 5.0), jnp.full((n_noise,), 15.0),
        jnp.asarray(rir))


def test_mix_noise_matches_host_formula():
    """Device gain == audio_loader.py:216-235 / data/augment.py:83-102."""
    rng = np.random.default_rng(1)
    wave = rng.normal(0, 0.3, (2, 1600)).astype(np.float32)
    noise = rng.normal(0, 0.1, (2, 1600)).astype(np.float32)
    ndb = 10 * np.log10(np.mean(noise ** 2, 1) + 1e-4)
    snr = np.array([7.0, 12.0], np.float32)
    got = np.asarray(_mix_noise(jnp.asarray(wave), jnp.asarray(noise),
                                jnp.asarray(ndb), jnp.asarray(snr)))
    clean_db = 10 * np.log10(np.mean(wave ** 2, 1) + 1e-4)
    gain = np.sqrt(10 ** ((clean_db - ndb - snr) / 10))
    np.testing.assert_allclose(got, wave + gain[:, None] * noise, rtol=1e-5)


def test_reverberate_matches_scipy_fftconvolve():
    rng = np.random.default_rng(2)
    wave = rng.normal(0, 0.3, (3, 1600)).astype(np.float32)
    rir = rng.normal(0, 1, (3, 400)).astype(np.float32)
    rir /= np.sqrt(np.sum(rir ** 2, 1, keepdims=True))
    got = np.asarray(_reverberate(jnp.asarray(wave), jnp.asarray(rir)))
    for b in range(3):
        want = sps.fftconvolve(wave[b], rir[b], mode="full")[:1600]
        np.testing.assert_allclose(got[b], want, atol=1e-4)


def test_env_corrupt_mix_distribution():
    """rev/noise/both/none ≈ .2/.4/.2/.2: the 'none' rows must be exactly
    the input; corrupted rows must differ; all finite."""
    banks = _banks()
    rng = np.random.default_rng(3)
    wave = jnp.asarray(rng.normal(0, 0.3, (512, 1600)).astype(np.float32))
    out = jax.jit(device_env_corrupt)(wave, banks, jax.random.PRNGKey(0))
    assert out.shape == wave.shape
    assert np.isfinite(np.asarray(out)).all()
    unchanged = np.all(np.asarray(out) == np.asarray(wave), axis=1)
    frac_none = unchanged.mean()
    assert 0.12 < frac_none < 0.28, frac_none       # p=.2, n=512


def test_env_corrupt_multiway_shape():
    banks = _banks()
    wave = jnp.zeros((4, 2, 1600))
    out = device_env_corrupt(wave + 0.1, banks, jax.random.PRNGKey(1))
    assert out.shape == (4, 2, 1600)


def test_build_banks_from_host_augmentor(tmp_path):
    from speakerverification_tpu.data.augment import AugmentWav
    from speakerverification_tpu.data.wav_conversion import write_wav

    rng = np.random.default_rng(4)
    for cat in ("noise", "music"):
        for i in range(3):
            write_wav(tmp_path / "musan_split" / cat / "s" / f"x{i}"
                      / f"{i}.wav",
                      rng.normal(0, 0.1, 12000).astype(np.float32), SR)
    write_wav(tmp_path / "RIRS_NOISES" / "simulated_rirs" / "sm" / "R0"
              / "r.wav",
              np.exp(-np.arange(1500) / 300.0).astype(np.float32), SR)
    aug = AugmentWav({
        "augment_paths": {"musan": str(tmp_path / "musan_split"),
                          "noise_vad": "/nonexistent",
                          "rirs": str(tmp_path / "RIRS_NOISES")},
        "augment_chain": ["env_corrupt"],
        "noise_snr": {"noise": [0, 15], "music": [5, 15]},
        "noise_samples": {"noise": [1, 1], "music": [1, 1]},
    }, SPEC, rng=rng)
    banks = build_banks(aug, n_noise=6, n_rir=2, rng=rng)
    assert banks.noise.shape == (6, aug.max_audio)
    assert banks.rir.shape[0] == 2
    # RIRs energy-normalized
    np.testing.assert_allclose(
        np.sum(np.asarray(banks.rir) ** 2, 1), 1.0, rtol=1e-4)
    # SNR ranges carry the per-category settings
    assert set(np.asarray(banks.snr_lo)) <= {0.0, 5.0}


@pytest.mark.slow
def test_train_step_augment_hook():
    """augment_fn runs inside the jitted step and training stays finite."""
    from speakerverification_tpu.encoder import SpeakerEncoder
    from speakerverification_tpu.losses import build_loss
    from speakerverification_tpu.models import build_model
    from speakerverification_tpu.optim import build_optimizer
    from speakerverification_tpu.training.state import TrainState
    from speakerverification_tpu.training.train_step import make_train_step

    banks = _banks(L=8000)
    enc = SpeakerEncoder(
        backbone=build_model("ECAPA_TDNN", nOut=16,
                             channels=(16, 16, 16, 16, 48),
                             attention_channels=4, res2net_scale=4,
                             se_channels=4),
        loss=build_loss("AAmSoftmax", nOut=16, nClasses=4))
    wave = jnp.asarray(np.random.default_rng(5).normal(
        0, 0.1, (4, 8000)).astype(np.float32))
    label = jnp.asarray([0, 1, 2, 3])
    v = enc.init(jax.random.PRNGKey(0), wave, label, train=False)
    tx = build_optimizer("adam", 1e-3)
    state = TrainState(step=jnp.zeros([], jnp.int32), params=v["params"],
                       batch_stats=v.get("batch_stats", {}),
                       opt_state=tx.init(v["params"]))

    # banks as a step ARGUMENT (the trainer's refresh path)
    step = jax.jit(make_train_step(
        enc, tx,
        augment_fn=lambda w, r, b: device_env_corrupt(w, b, r)))
    s2, m = step(state, wave, label, jax.random.PRNGKey(1), 1e-3, banks)
    assert np.isfinite(float(m["loss"]))
    d = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree_util.tree_leaves(s2.params),
        jax.tree_util.tree_leaves(state.params)))
    assert d > 0
    # refreshed banks (same shapes, new values) must NOT recompile
    banks2 = _banks(L=8000, seed=9)
    step(state, wave, label, jax.random.PRNGKey(2), 1e-3, banks2)
    assert step._cache_size() == 1


@pytest.mark.slow
def test_trainer_device_augment_end_to_end(tmp_path):
    """Trainer with device_augment: true detaches the host env_corrupt
    engine, builds banks, and trains an epoch with on-device corruption."""
    from speakerverification_tpu.data.manifest import generate_metadata
    from speakerverification_tpu.data.wav_conversion import write_wav
    from speakerverification_tpu.training.trainer import Trainer

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
        "number_of_epochs": 2, "batch_size": 4, "lr": 0.005,
        "nClasses": 4, "device_augment": True, "augment": True,
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
    assert tr.loader.augmentor is None          # host engine detached
    banks0 = np.asarray(tr._aug_banks.noise)
    tr.fit()                                    # 2 epochs: banks refresh
    assert not np.array_equal(np.asarray(tr._aug_banks.noise), banks0)
    assert (tmp_path / "save" / "ECAPA_TDNN" / "AAmSoftmax" / "model"
            / "last_state.msgpack").exists()
