"""Summary tool + wav conversion utilities."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_count_and_summarize_params():
    from speakerverification_tpu.utils.summary import (
        count_params,
        summarize_params,
    )
    params = {"layer1": {"kernel": jnp.zeros((3, 4)), "bias": jnp.zeros(4)},
              "layer2": {"kernel": jnp.zeros((4, 2))}}
    assert count_params(params) == 12 + 4 + 8
    text = summarize_params(params)
    assert "layer1" in text and "total" in text and "24" in text


def test_mel_frames_for_spec():
    from speakerverification_tpu.utils.summary import mel_frames_for_spec
    spec = {"sample_rate": 8000, "sentence_len": 2.0, "win_len": 0.025,
            "hop_len": 0.01}
    assert mel_frames_for_spec(spec) == 201            # center=True
    assert mel_frames_for_spec(spec, center=False) == 198


def test_pcm_roundtrip():
    from speakerverification_tpu.data.wav_conversion import (
        np_to_pcm16,
        pcm16_to_np,
    )
    rng = np.random.default_rng(0)
    x = rng.uniform(-0.9, 0.9, 1000).astype(np.float32)
    y = pcm16_to_np(np_to_pcm16(x))
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_resample_file(tmp_path):
    from speakerverification_tpu.data.wav_conversion import resample_file
    from speakerverification_tpu.data.wavio import read_wav, write_wav
    t = np.arange(16000) / 16000.0
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    src = tmp_path / "a16.wav"
    write_wav(src, x, 16000)
    dst = resample_file(src, tmp_path / "a8.wav", 8000)
    y, sr = read_wav(dst)
    assert sr == 8000
    assert abs(len(y) - 8000) < 10
    # tone survives resampling: dominant frequency still ~440 Hz
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak_hz = np.argmax(spec) * 8000 / len(y)
    assert peak_hz == pytest.approx(440, abs=5)


def test_forward_flops_counts_the_dense():
    """forward_flops (parity upgrade over the reference's torchsummary
    Mult-Adds, src/model.py:806): the XLA cost analysis of a bare Dense
    must be ~2·B·in·out FLOPs."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from speakerverification_tpu.utils.summary import forward_flops

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Dense(32, use_bias=False)(x)

    m = M()
    x = jnp.zeros((4, 64))
    v = m.init(jax.random.PRNGKey(0), x)
    f = forward_flops(m, v, x)
    assert f == f                       # backend reported a cost model
    assert abs(f - 2 * 4 * 64 * 32) / (2 * 4 * 64 * 32) < 0.5, f
