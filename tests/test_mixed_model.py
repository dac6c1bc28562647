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
