"""Multi-encoder MixedModel (models/mixed.py): the reference's
list-valued ``model.name`` path (src/model.py:76-80) made to work —
upstream it imports a models/Mixed_model.py that does not exist."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speakerverification_tpu.builder import encoder_from_hparams
from speakerverification_tpu.models.mixed import build_mixed_model

SR = 8000

_TINY_ECAPA = {"channels": [16, 16, 16, 16, 48], "attention_channels": 4,
               "res2net_scale": 4, "se_channels": 4}
_TINY_RAW3 = {"C": 16, "model_scale": 8}


def _hparams(model):
    return {
        "model": model,
        "criterion": {"name": "AAmSoftmax", "margin": 0.2, "scale": 30},
        "nClasses": 4, "features": "melspectrogram", "n_mels": 24,
        "audio_spec": {"sample_rate": SR, "sentence_len": 1.0,
                       "win_len": 0.025, "hop_len": 0.01},
    }


def test_mixed_forward_and_split():
    enc = encoder_from_hparams(_hparams({
        "name": ["RawNet3", "ECAPA_TDNN"], "nOut": 48, "nOuts": [32, 16],
        "branch_options": [_TINY_RAW3, _TINY_ECAPA],
    }), num_devices=1)
    assert enc.feature_type == "raw"            # wave passthrough
    wave = jnp.asarray(np.random.default_rng(0).normal(
        0, 0.1, (2, SR)).astype(np.float32))
    v = enc.init(jax.random.PRNGKey(0), wave, train=False)
    out = enc.apply(v, wave, train=False)
    assert out.shape == (2, 48)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_mixed_default_even_split_and_grad():
    enc = encoder_from_hparams(_hparams({
        # 2 mel branches: the shared mel frontend is computed once
        "name": ["ECAPA_TDNN", "TitaNet"], "nOut": 33,
        "branch_options": [_TINY_ECAPA,
                           {"model_size": "s", "n_mega_blocks": 2,
                            "hidden_size": 32, "mega_block_kernel": 3}],
    }), num_devices=1)
    wave = jnp.asarray(np.random.default_rng(1).normal(
        0, 0.1, (4, SR)).astype(np.float32))
    label = jnp.asarray([0, 1, 2, 3])
    v = enc.init(jax.random.PRNGKey(0), wave, label, train=False)

    def loss_fn(params):
        (loss, _), _ = enc.apply(
            {"params": params, "batch_stats": v.get("batch_stats", {})},
            wave, label, train=True, mutable=["batch_stats"],
            rngs={"specaug": jax.random.PRNGKey(1),
                  "dropout": jax.random.PRNGKey(2)})
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(v["params"])
    assert np.isfinite(float(loss))
    gsum = sum(float(jnp.abs(g).sum())
               for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gsum) and gsum > 0
    # default split of 33 over 2 branches: 17 + 16 (remainder to first)
    emb = enc.apply(v, wave, train=False)
    assert emb.shape == (4, 33)


def test_mixed_validation_errors():
    with pytest.raises(ValueError, match="sum"):
        build_mixed_model(["RawNet3", "ECAPA_TDNN"], nOut=48,
                          nOuts=[32, 32])
    with pytest.raises(ValueError, match=">= 2"):
        build_mixed_model(["RawNet3"], nOut=48)
    with pytest.raises(KeyError, match="unknown model"):
        build_mixed_model(["RawNet3", "NoSuchNet"], nOut=48)
    with pytest.raises(ValueError, match="feature_types"):
        build_mixed_model(["RawNet3", "ECAPA_TDNN"], nOut=48,
                          feature_types=["raw"])


def test_mixed_run_dirs_join(tmp_path):
    from speakerverification_tpu.training.trainer import run_dirs
    dirs = run_dirs({"save_folder": str(tmp_path),
                     "model": {"name": ["RawNet3", "ECAPA_TDNN"]},
                     "criterion": {"name": "AAmSoftmax"}})
    assert dirs["root"].name == "AAmSoftmax"
    assert dirs["root"].parent.name == "RawNet3+ECAPA_TDNN"


def test_mixed_raw_shared_feature_type_coerces_to_mel():
    """'features: raw' (the reference's standard hybrid setting) must
    not feed the 2-D waveform to mel-consuming branches — non-wave
    branches coerce to melspectrogram like the builder does for a lone
    ECAPA_TDNN (review finding r3). Construction-only: the resulting
    (raw, melspectrogram) forward is test_mixed_forward_and_split."""
    hp = _hparams({
        "name": ["RawNet3", "ECAPA_TDNN"], "nOut": 48, "nOuts": [32, 16],
        "branch_options": [_TINY_RAW3, _TINY_ECAPA],
    })
    hp["features"] = "raw"
    enc = encoder_from_hparams(hp, num_devices=1)
    assert enc.backbone.input_kinds == ("raw", "melspectrogram")
    assert enc.feature_type == "raw"


def test_mixed_honors_toplevel_frontend_overrides():
    """Top-level n_fft/win_length/hop_length/fmax reach the mixed
    model's in-model frontend exactly like frontend_from_hparams does
    for single models (review finding r3)."""
    hp = _hparams({
        "name": ["RawNet3", "ECAPA_TDNN"], "nOut": 48, "nOuts": [32, 16],
        "branch_options": [_TINY_RAW3, _TINY_ECAPA],
    })
    hp.update(n_fft=256, win_length=160, hop_length=64, fmax=3500.0)
    enc = encoder_from_hparams(hp, num_devices=1)
    fe = enc.backbone.frontend
    assert (fe.n_fft, fe.win_length, fe.hop_length, fe.fmax) == (
        256, 160, 64, 3500.0)


def test_mixed_mfcc_branch_gets_mfcc_band_edge_defaults():
    """An mfcc branch under a mel-shared mixed config must use the
    reference mfcc factory's fmin=10/fmax=4000 defaults (feature.py:37),
    not the mel factory's 0/None leaked from the shared config (advisor
    finding r4). Explicit top-level fmin/fmax still win for every kind."""
    hp = _hparams({
        "name": ["ECAPA_TDNN", "ECAPA_TDNN"], "nOut": 32, "nOuts": [16, 16],
        "feature_types": ["melspectrogram", "mfcc"],
        "branch_options": [_TINY_ECAPA, _TINY_ECAPA],
    })
    enc = encoder_from_hparams(hp, num_devices=1)
    cfgs = dict(enc.backbone.frontends)
    assert (cfgs["melspectrogram"].fmin, cfgs["melspectrogram"].fmax) == \
        (0.0, None)
    assert (cfgs["mfcc"].fmin, cfgs["mfcc"].fmax) == (10.0, 4000.0)
    # the forward consumes the per-kind configs via MixedModel.__call__'s
    # cfg_by_kind lookup — exercised by test_mixed_forward_and_split;
    # compiling a second 2-branch graph here cost ~7 s cold (r5 budget)
    # explicit keys override for all kinds
    hp2 = dict(hp, fmin=25.0, fmax=3000.0)
    enc2 = encoder_from_hparams(hp2, num_devices=1)
    for cfg in dict(enc2.backbone.frontends).values():
        assert (cfg.fmin, cfg.fmax) == (25.0, 3000.0)


def test_builder_threads_audio_and_frontend_params_into_models():
    """audio_spec and top-level frontend overrides reach MainModel
    builds (the reference hands its models the full config kwargs,
    src/model.py:70-73): a 16 kHz hybrid must NOT silently build
    8 kHz-default in-model mel and sinc banks; overrides must reach a
    hybrid nested inside a MixedModel too (review findings r3)."""
    hp = _hparams({"name": "Raw3_ECAPA", "nOut": 256})
    hp["features"] = "raw"
    hp["audio_spec"] = {"sample_rate": 16000, "sentence_len": 2.0,
                        "win_len": 0.025, "hop_len": 0.01}
    enc = encoder_from_hparams(hp, num_devices=1)
    assert enc.backbone.frontend.sample_rate == 16000
    assert enc.backbone.frontend.win_length == 400     # 0.025 * 16k
    assert enc.backbone.raw_branch.sample_rate == 16000

    hp2 = _hparams({"name": ["RawNet3", "Tita_ECAPA"], "nOut": 96,
                    "nOuts": [32, 64],
                    "branch_options": [_TINY_RAW3, {}]})
    hp2.update(n_fft=256, win_length=160, hop_length=64)
    enc2 = encoder_from_hparams(hp2, num_devices=1)
    nested = enc2.backbone.branches[1]
    assert (nested.frontend.n_fft, nested.frontend.win_length,
            nested.frontend.hop_length) == (256, 160, 64)
    # and the frontend_backend knob threads all the way down
    hp2["frontend_backend"] = "xla"
    enc3 = encoder_from_hparams(hp2, num_devices=1)
    assert enc3.frontend_backend == "xla"
    assert enc3.backbone.frontend_backend == "xla"
    assert enc3.backbone.branches[1].frontend_backend == "xla"
    # typos are rejected, not silently mapped to the slow path
    hp2["frontend_backend"] = "palas"
    with pytest.raises(ValueError, match="frontend_backend"):
        encoder_from_hparams(hp2, num_devices=1)

    # a bare top-level sample_rate (no audio_spec) keeps the encoder
    # frontend and the in-model featurizers at the SAME rate
    hp3 = _hparams({"name": "Raw3_ECAPA", "nOut": 256})
    hp3["features"] = "raw"
    hp3.pop("audio_spec", None)
    hp3["sample_rate"] = 16000
    enc4 = encoder_from_hparams(hp3, num_devices=1)
    assert enc4.frontend.sample_rate == 16000
    assert enc4.backbone.frontend.sample_rate == 16000
    assert enc4.backbone.raw_branch.sample_rate == 16000


@pytest.mark.slow
def test_mixed_specaugment_reaches_inmodel_features():
    """With augment_chain ['spec_domain'] the builder threads the
    SpecAugment config into the raw-passthrough MixedModel (the
    encoder-level hook only sees 2-D waves): train-mode forwards with
    different specaug rngs must differ; eval must be deterministic and
    unmasked (review finding r3; parity: the reference hybrids'
    internal ECAPA gets the hook via **kwargs, Raw3_ECAPA.py:21-24)."""
    hp = _hparams({
        "name": ["RawNet3", "ECAPA_TDNN"], "nOut": 48, "nOuts": [32, 16],
        "branch_options": [_TINY_RAW3, _TINY_ECAPA],
    })
    hp.update(augment=True,
              augment_options={"augment_chain": ["spec_domain"]})
    enc = encoder_from_hparams(hp, num_devices=1)
    assert enc.backbone.spec_augment is not None
    wave = jnp.asarray(np.random.default_rng(4).normal(
        0, 0.1, (2, SR)).astype(np.float32))
    v = enc.init(jax.random.PRNGKey(0), wave, train=False)

    def fwd(seed, train):
        out = enc.apply(v, wave, train=train,
                        mutable=["batch_stats"] if train else False,
                        rngs={"specaug": jax.random.PRNGKey(seed),
                              "dropout": jax.random.PRNGKey(9)})
        return np.asarray(out[0] if train else out)

    a, b = fwd(1, True), fwd(2, True)
    # finiteness FIRST: NaN != NaN would satisfy "not allclose" and mask
    # the log-of-warp-overshoot NaN this suite once shipped
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert not np.allclose(a, b), "specaug rng had no effect on train fwd"
    e1, e2 = fwd(1, False), fwd(2, False)
    np.testing.assert_array_equal(e1, e2)


@pytest.mark.slow
def test_mixed_bf16_train_step_runs():
    """mixedprec: the builder clones compute_dtype into the mixed
    backbone — frontend stays fp32 on the uncast wave, branches run
    bf16 (review finding r3). One grad step must be finite."""
    hp = _hparams({
        "name": ["RawNet3", "ECAPA_TDNN"], "nOut": 48, "nOuts": [32, 16],
        "branch_options": [_TINY_RAW3, _TINY_ECAPA],
    })
    hp["mixedprec"] = True
    enc = encoder_from_hparams(hp, num_devices=1)
    assert enc.backbone.compute_dtype is not None
    wave = jnp.asarray(np.random.default_rng(5).normal(
        0, 0.1, (4, SR)).astype(np.float32))
    label = jnp.asarray([0, 1, 2, 3])
    v = enc.init(jax.random.PRNGKey(0), wave, label, train=False)

    def loss_fn(p):
        (loss, _), _ = enc.apply(
            {"params": p, "batch_stats": v.get("batch_stats", {})},
            wave, label, train=True, mutable=["batch_stats"],
            rngs={"specaug": jax.random.PRNGKey(1),
                  "dropout": jax.random.PRNGKey(2)})
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(v["params"])
    gsum = sum(float(jnp.abs(g).sum())
               for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(float(loss)) and np.isfinite(gsum) and gsum > 0


def test_hybrid_backbones_get_specaug_and_dtype_threaded():
    """The builder clones spec_augment/compute_dtype into EVERY
    raw-passthrough backbone with an in-model frontend — the Raw*_ECAPA
    / *_tita hybrids, not just MixedModel (construction only, no
    forward)."""
    for name in ("Raw3_ECAPA", "Raw_ECAPA", "Tita_ECAPA", "Raw_tita",
                 "Raw_ECAPA_hype"):
        hp = _hparams({"name": name, "nOut": 256})
        hp.update(features="raw", mixedprec=True, augment=True,
                  augment_options={"augment_chain": ["spec_domain"]})
        enc = encoder_from_hparams(hp, num_devices=1)
        assert enc.backbone.spec_augment is not None, name
        assert enc.backbone.compute_dtype is not None, name
        # and without the chain, the module stays unaugmented
        hp["augment"] = False
        enc = encoder_from_hparams(hp, num_devices=1)
        assert enc.backbone.spec_augment is None, name


def test_mixed_threads_into_nested_hybrid_branches():
    """A hybrid nested as a MixedModel branch owns its own in-model
    frontend: the builder must thread spec_augment/compute_dtype into
    THAT module too, and MixedModel must hand it the uncast wave
    (review finding r3)."""
    hp = _hparams({
        "name": ["RawNet3", "Tita_ECAPA"], "nOut": 96, "nOuts": [32, 64],
        "branch_options": [_TINY_RAW3, {}],
    })
    hp.update(mixedprec=True, augment=True,
              augment_options={"augment_chain": ["spec_domain"]})
    enc = encoder_from_hparams(hp, num_devices=1)
    mixed = enc.backbone
    assert mixed.spec_augment is not None and mixed.compute_dtype is not None
    tita = mixed.branches[1]
    assert tita.__class__.__name__ == "TitaECAPA"
    assert tita.spec_augment is not None, "nested hybrid not threaded"
    assert tita.compute_dtype is not None, "nested hybrid not threaded"
    # the raw RawNet3 branch has no in-model frontend — left untouched
    assert not hasattr(mixed.branches[0], "spec_augment")
