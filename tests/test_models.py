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


@pytest.mark.slow        # two extra grad compiles ≈ 26 s cold; the remat
                         # path stays default-covered by the engine
                         # strips-remat test and the driver dryrun
def test_ecapa_remat_matches_exactly(ecapa_small):
    """remat=True (per-SE-Res2Net-block jax.checkpoint) must be a pure
    memory/recompute trade: identical forward AND identical gradients
    (same params, same program math — only the backward's activation
    storage changes)."""
    remat_model = build_model("ECAPA_TDNN", nOut=32, remat=True,
                              **SMALL_ECAPA)
    rng = np.random.default_rng(17)
    # positive mel-power-like inputs: the model log-compresses
    # (log of a negative would make every comparison NaN==NaN-vacuous)
    feats = jnp.asarray(
        rng.gamma(2.0, 1.0, (2, 100, 80)).astype(np.float32))
    variables = ecapa_small.init(jax.random.PRNGKey(0), feats)

    f1 = jax.jit(lambda v, f: ecapa_small.apply(v, f))
    f2 = jax.jit(lambda v, f: remat_model.apply(v, f))
    np.testing.assert_array_equal(np.asarray(f1(variables, feats)),
                                  np.asarray(f2(variables, feats)))

    def loss1(p, f):
        return jnp.sum(ecapa_small.apply(
            {"params": p, "batch_stats": variables["batch_stats"]}, f) ** 2)

    def loss2(p, f):
        return jnp.sum(remat_model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]}, f) ** 2)

    g1 = jax.jit(jax.grad(loss1))(variables["params"], feats)
    g2 = jax.jit(jax.grad(loss2))(variables["params"], feats)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    # train mode: BN mutation must flow through the lifted remat
    @jax.jit
    def train_apply(v, f):
        return remat_model.apply(v, f, train=True,
                                 mutable=["batch_stats"])
    out, mutated = train_apply(variables, feats)
    assert np.isfinite(np.asarray(out)).all()
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(variables["batch_stats"]),
            jax.tree_util.tree_leaves(mutated["batch_stats"])))
    assert changed, "remat blocked the batch_stats update"


def test_log_input_clamps_warp_overshoot_negatives():
    """SpecAugment's exact-port bicubic time warp can overshoot linear
    power mel NEGATIVE; the reference then NaNs in x.log() (its own
    comment at src/models/ECAPA_TDNN.py:475 admits the hazard). Our
    in-model logs clamp at 0 — identical for all legal (non-negative)
    inputs, finite where the reference NaNs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from speakerverification_tpu.models import build_model

    m = build_model("ECAPA_TDNN", nOut=16, n_mels=24,
                    channels=(8, 8, 8, 8, 24), attention_channels=4,
                    res2net_scale=4, se_channels=4)
    feats = np.abs(np.random.default_rng(0).normal(
        0.5, 0.2, (2, 32, 24))).astype(np.float32)
    feats[0, 3, 5] = -1e-4                     # warp-overshoot artifact
    v = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.asarray(np.abs(feats)))
    out = jax.jit(lambda v, x: m.apply(v, x, train=False))(
        v, jnp.asarray(feats))
    assert np.isfinite(np.asarray(out)).all()
    # and clean inputs are bit-identical to the unclamped formula
    clean = jnp.asarray(np.abs(feats))
    np.testing.assert_array_equal(
        np.asarray(jnp.log(jnp.maximum(clean, 0.0) + 1e-6)),
        np.asarray(jnp.log(clean + 1e-6)))
