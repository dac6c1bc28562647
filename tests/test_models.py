"""Encoder zoo: shape/jit/finite checks on small configs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speakerverification_tpu.encoder import SpeakerEncoder
from speakerverification_tpu.losses import build_loss
from speakerverification_tpu.models import MODELS, build_model
from speakerverification_tpu.ops.frontend import FrontendConfig

SMALL_ECAPA = dict(channels=(64, 64, 64, 64, 192), kernel_sizes=(5, 3, 3, 3, 1),
                   dilations=(1, 2, 3, 4, 1), attention_channels=16,
                   res2net_scale=4, se_channels=16)


@pytest.fixture(scope="module")
def ecapa_small():
    return build_model("ECAPA_TDNN", nOut=32, **SMALL_ECAPA)


# NOTE on jit discipline in this file: eager `.apply` walks the model
# op-by-op — hundreds of sub-second XLA programs that fall under the
# persistent cache's write threshold, so they recompile EVERY suite run.
# Jitting gives one program that persists, cutting both cold and warm
# wall time on the 1-CPU CI box (r3 suite-budget work).


def test_ecapa_shapes_jit_finite(ecapa_small):
    x = jnp.asarray(np.random.default_rng(0).normal(
        0.5, 0.2, (2, 100, 80)).astype(np.float32)) ** 2
    variables = jax.jit(ecapa_small.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(ecapa_small.apply)(variables, x)
    assert out.shape == (2, 32)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_ecapa_batch_stats_update(ecapa_small):
    x = jnp.ones((2, 50, 80))
    variables = ecapa_small.init(jax.random.PRNGKey(0), x)
    out, mutated = ecapa_small.apply(variables, x, train=True,
                                     mutable=["batch_stats"])
    assert "batch_stats" in mutated
    assert out.shape == (2, 32)


def test_speaker_encoder_embeddings():
    enc = SpeakerEncoder(
        backbone=build_model("ECAPA_TDNN", nOut=32, **SMALL_ECAPA),
        loss=None, feature_type="melspectrogram",
        frontend=FrontendConfig())
    wave = jnp.asarray(np.random.default_rng(1).normal(
        0, 0.1, (2, 8000)).astype(np.float32))
    variables = jax.jit(enc.init)(jax.random.PRNGKey(0), wave)
    emb = jax.jit(enc.apply)(variables, wave)
    assert emb.shape == (2, 32)


def test_speaker_encoder_loss_path():
    enc = SpeakerEncoder(
        backbone=build_model("ECAPA_TDNN", nOut=32, **SMALL_ECAPA),
        loss=build_loss("AAmSoftmax", nOut=32, nClasses=5),
        feature_type="melspectrogram")
    wave = jnp.asarray(np.random.default_rng(2).normal(
        0, 0.1, (3, 2, 8000)).astype(np.float32))  # [B, nPerSpeaker, T]
    label = jnp.asarray([0, 1, 2])
    variables = jax.jit(enc.init)(jax.random.PRNGKey(0), wave, label)
    apply = jax.jit(
        lambda v, w, l: enc.apply(v, w, l, train=True,
                                  mutable=["batch_stats"]))
    (loss, prec1), mutated = apply(variables, wave, label)
    assert np.isfinite(float(loss))
    assert 0 <= float(prec1) <= 100


def test_model_registry():
    assert "ECAPA_TDNN" in MODELS
