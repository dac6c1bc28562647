"""Fused Pallas mel kernel vs the XLA-path frontend (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from speakerverification_tpu.ops.frontend import FrontendConfig, make_frontend
from speakerverification_tpu.ops.pallas_frontend import make_pallas_mel_frontend


@pytest.mark.parametrize("sr,win,hop,T", [(8000, 200, 80, 16000),
                                          (16000, 400, 160, 32000)])
def test_pallas_matches_xla(sr, win, hop, T):
    cfg = FrontendConfig(sample_rate=sr, win_length=win, hop_length=hop)
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.normal(0, 0.1, (2, T)).astype(np.float32))

    ref = make_frontend(cfg, "melspectrogram")(wave)
    fused = make_pallas_mel_frontend(cfg, frames_per_block=64,
                                     interpret=True)(wave)
    assert fused.shape == ref.shape == (2, 1 + T // hop, cfg.n_mels)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pallas_non_divisible_frames():
    """Frame count not a multiple of the block size."""
    cfg = FrontendConfig()
    rng = np.random.default_rng(1)
    wave = jnp.asarray(rng.normal(0, 0.1, (1, 12000)).astype(np.float32))
    ref = make_frontend(cfg, "melspectrogram")(wave)
    fused = make_pallas_mel_frontend(cfg, frames_per_block=32,
                                     interpret=True)(wave)
    assert fused.shape == ref.shape
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
