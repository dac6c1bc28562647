"""Raw-waveform model family: SincConv, RawNet2/3, hybrids."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speakerverification_tpu.models import MODELS, build_model
from speakerverification_tpu.ops.sinc import SincConv, sinc_init_frequencies

SR = 16000
T = 16000  # 1 s keeps CPU compile time reasonable


def _run(model, x, train=False):
    # jitted init: one persisted program instead of hundreds of eager
    # op programs below the cache's write threshold (see test_models.py)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    if train:
        out, _ = jax.jit(lambda v, x: model.apply(
            v, x, train=True, mutable=["batch_stats"]))(variables, x)
        return out, variables
    return jax.jit(model.apply)(variables, x), variables


def test_sinc_init_mel_spaced():
    low, band = sinc_init_frequencies(64, SR)
    assert low.shape == (64,) and band.shape == (64,)
    assert low[0] == pytest.approx(30.0, abs=1.0)
    assert np.all(np.diff(low) > 0)           # monotone increasing
    assert np.all(band > 0)


def test_sinc_conv_is_bandpass():
    """Energy response must peak inside each filter's band."""
    sc = SincConv(out_channels=16, kernel_size=251, stride=1,
                  sample_rate=SR)
    t = np.arange(4000) / SR
    x_lo = jnp.asarray(np.sin(2 * np.pi * 100 * t)[None].astype(np.float32))
    x_hi = jnp.asarray(np.sin(2 * np.pi * 6000 * t)[None].astype(np.float32))
    variables = sc.init(jax.random.PRNGKey(0), x_lo)
    e_lo = np.asarray(jnp.mean(sc.apply(variables, x_lo) ** 2, axis=1))[0]
    e_hi = np.asarray(jnp.mean(sc.apply(variables, x_hi) ** 2, axis=1))[0]
    # low tone excites the lowest filters more than the highest, vice versa
    assert e_lo[:3].mean() > e_lo[-3:].mean()
    assert e_hi[-3:].mean() > e_hi[:3].mean()


def test_sinc_conv_shapes_and_stride():
    sc = SincConv(out_channels=32, kernel_size=251, stride=10, sample_rate=SR)
    x = jnp.zeros((2, T))
    variables = sc.init(jax.random.PRNGKey(0), x)
    out = sc.apply(variables, x)
    assert out.shape == (2, (T - 251) // 10 + 1, 32)


@pytest.mark.parametrize("name,kw", [
    ("RawNet3", dict(C=128, model_scale=4)),
    pytest.param("RawNet2", dict(), marks=pytest.mark.slow),
    pytest.param("RawNet2_custom", dict(front_proc="sinc", aggregate="asp"),
                 marks=pytest.mark.slow),
    pytest.param("RawNet2_custom", dict(front_proc="conv", aggregate="gru"),
                 marks=pytest.mark.slow),
])
def test_raw_models_forward(name, kw):
    model = build_model(name, nOut=64, sample_rate=SR, **kw)
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 0.1, (2, T)).astype(np.float32))
    out, _ = _run(model, x)
    assert out.shape == (2, 64)
    assert np.all(np.isfinite(np.asarray(out)))


def test_rawnet3_train_mode_batchstats():
    model = build_model("RawNet3", nOut=32, C=128, model_scale=4,
                        sample_rate=SR)
    x = jnp.asarray(np.random.default_rng(1).normal(
        0, 0.1, (2, T)).astype(np.float32))
    out, variables = _run(model, x, train=True)
    assert out.shape == (2, 32)


def test_raw3_ecapa_hybrid():
    """Default reference model: concat of ECAPA-192 and RawNet3 branches."""
    model = build_model("Raw3_ECAPA", nOut=256,
                        audio_spec={"sample_rate": 8000, "win_len": 0.025,
                                    "hop_len": 0.01},
                        n_mels=40)
    # shrink the raw branch for CPU test speed
    from speakerverification_tpu.models.hybrids import RawECAPAHybrid
    from speakerverification_tpu.models.rawnet3 import RawNet3
    from speakerverification_tpu.models.ecapa_tdnn import ECAPA_TDNN
    model = RawECAPAHybrid(
        raw_branch=RawNet3(nOut=64, C=128, model_scale=4, sample_rate=8000),
        ecapa=ECAPA_TDNN(lin_neurons=32, channels=(32, 32, 32, 32, 96),
                         attention_channels=8, res2net_scale=4, se_channels=8,
                         log_input=False, input_norm=True),
        frontend=model.frontend)
    x = jnp.asarray(np.random.default_rng(2).normal(
        0, 0.1, (2, 8000)).astype(np.float32))
    out, _ = _run(model, x)
    assert out.shape == (2, 32 + 64)
    assert np.all(np.isfinite(np.asarray(out)))


def test_hybrid_registry_names():
    for name in ["Raw3_ECAPA", "Raw_ECAPA", "Raw_ECAPA_sinc_asp",
                 "Raw_ECAPA_conv_asp", "Raw_ECAPA_sinc_gru", "RawNet2",
                 "RawNet2_custom", "RawNet3"]:
        assert name in MODELS, name


def test_sinc_conv_differentiable():
    """Cheap default-run stand-in for the full-model grad test below:
    gradients must reach the learnable sinc cutoffs."""
    from speakerverification_tpu.ops.sinc import SincConv
    sc = SincConv(out_channels=16, kernel_size=101, sample_rate=SR)
    x = jnp.asarray(np.random.default_rng(4).normal(
        0, 0.1, (2, 2000)).astype(np.float32))
    variables = sc.init(jax.random.PRNGKey(0), x)

    def f(params):
        return jnp.sum(sc.apply({"params": params}, x) ** 2)

    g = jax.jit(jax.grad(f))(variables["params"])
    assert float(jnp.abs(g["low_hz"]).sum()) > 0
    assert float(jnp.abs(g["band_hz"]).sum()) > 0
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree_util.tree_leaves(g))


@pytest.mark.slow
def test_raw_model_differentiable():
    model = build_model("RawNet3", nOut=16, C=64, model_scale=4,
                        sample_rate=SR)
    x = jnp.asarray(np.random.default_rng(3).normal(
        0, 0.1, (2, T)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)

    def f(params):
        out, _ = model.apply({**variables, "params": params}, x,
                             train=True, mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    g = jax.grad(f)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # sinc params must receive gradients
    gsinc = g["SincConv_0"]
    assert float(jnp.abs(gsinc["low_hz"]).sum()) > 0


def test_raw_models_bf16_step():
    """mixedprec regression (r4): a bf16 step casts PARAMS down and the
    encoder casts the wave, so the sinc front used to die in
    lax.conv_general_dilated on (bf16 wave, fp32 filters) — the
    reference's DEFAULT model Raw3_ECAPA crashed on both eval and train.
    SincConv now constructs filters in fp32 and runs the conv in the
    wave's dtype (torch AMP halves this conv too, Raw3_ECAPA.py:50);
    log/instance-norm segments pin fp32 like torch autocast does."""
    from speakerverification_tpu.builder import encoder_from_hparams
    from speakerverification_tpu.optim import build_optimizer
    from speakerverification_tpu.training.state import create_train_state
    from speakerverification_tpu.training.train_step import (
        make_eval_embed_fn,
        make_train_step,
    )

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, .1, (2, 8000)).astype(np.float32))
    tw = jnp.asarray(rng.normal(0, .1, (2, 2, 8000)).astype(np.float32))
    tl = jnp.asarray([0, 1])
    # Raw3_ECAPA (the crash) + RawNet2 eval paths stay default-tier;
    # the train-step half lives in test_raw3_bf16_train_step (slow —
    # its cold compile alone cost ~40 s of the default budget, r5).
    # C=128 shrinks the raw branch (the bf16 dtype crash is
    # width-independent); the hybrid's ECAPA branch stays the
    # reference-hard-coded 512-channel one.
    for name, extra, with_train in [("Raw3_ECAPA", {"nOut": 256, "C": 128},
                                     False),
                                    ("RawNet2", {}, False)]:
        hp = {"model": {"name": name, "nOut": 64, **extra},
              "features": "raw", "nClasses": 8, "mixedprec": True,
              "audio_spec": {"sample_rate": 8000},
              "criterion": {"name": "AAmSoftmax"}}
        enc = encoder_from_hparams(hp)
        v = jax.jit(enc.init)(jax.random.PRNGKey(0), tw, tl)
        embed = make_eval_embed_fn(enc, normalize=True,
                                   compute_dtype=jnp.bfloat16)
        e = np.asarray(embed(v["params"], v.get("batch_stats", {}), w))
        assert np.isfinite(e).all(), name

        if with_train:
            tx = build_optimizer("adam", learning_rate=1e-3)
            state = create_train_state(enc, tx, jax.random.PRNGKey(0),
                                       tw, tl)
            step = make_train_step(enc, tx, compute_dtype=jnp.bfloat16)
            _, m = jax.jit(step)(state, tw, tl, jax.random.PRNGKey(1),
                                 jnp.float32(1e-3))
            assert np.isfinite(float(m["loss"])), name


def test_rawnet3_bf16_train_step_small():
    """Default-tier guard for the bf16 TRAIN crash path (59f0b58): a
    fwd+bwd step through the sinc front's fp32-pinned construction and
    norm segments under mixedprec. Standalone small RawNet3 — the sinc
    conv's dtype handling is where the crash lived, and compiling it
    without the hybrid's reference-hard-coded ECAPA-512 branch keeps
    this in the cold default budget (the full-hybrid train step rides
    the slow tier below)."""
    from speakerverification_tpu.builder import encoder_from_hparams
    from speakerverification_tpu.optim import build_optimizer
    from speakerverification_tpu.training.state import create_train_state
    from speakerverification_tpu.training.train_step import make_train_step

    rng = np.random.default_rng(0)
    tw = jnp.asarray(rng.normal(0, .1, (2, 2, 8000)).astype(np.float32))
    tl = jnp.asarray([0, 1])
    hp = {"model": {"name": "RawNet3", "nOut": 32, "C": 64,
                    "model_scale": 4},
          "features": "raw", "nClasses": 8, "mixedprec": True,
          "audio_spec": {"sample_rate": 8000},
          "criterion": {"name": "AAmSoftmax"}}
    enc = encoder_from_hparams(hp)
    tx = build_optimizer("adam", learning_rate=1e-3)
    state = create_train_state(enc, tx, jax.random.PRNGKey(0), tw, tl)
    step = make_train_step(enc, tx, compute_dtype=jnp.bfloat16)
    _, m = jax.jit(step)(state, tw, tl, jax.random.PRNGKey(1),
                         jnp.float32(1e-3))
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_raw3_bf16_train_step():
    """Train-step half of the bf16 regression above (fwd+bwd through
    the sinc front and both fp32-pinned norm segments)."""
    from speakerverification_tpu.builder import encoder_from_hparams
    from speakerverification_tpu.optim import build_optimizer
    from speakerverification_tpu.training.state import create_train_state
    from speakerverification_tpu.training.train_step import make_train_step

    rng = np.random.default_rng(0)
    tw = jnp.asarray(rng.normal(0, .1, (2, 2, 8000)).astype(np.float32))
    tl = jnp.asarray([0, 1])
    hp = {"model": {"name": "Raw3_ECAPA", "nOut": 256, "C": 128},
          "features": "raw", "nClasses": 8, "mixedprec": True,
          "audio_spec": {"sample_rate": 8000},
          "criterion": {"name": "AAmSoftmax"}}
    enc = encoder_from_hparams(hp)
    tx = build_optimizer("adam", learning_rate=1e-3)
    state = create_train_state(enc, tx, jax.random.PRNGKey(0), tw, tl)
    step = make_train_step(enc, tx, compute_dtype=jnp.bfloat16)
    _, m = jax.jit(step)(state, tw, tl, jax.random.PRNGKey(1),
                         jnp.float32(1e-3))
    assert np.isfinite(float(m["loss"]))
