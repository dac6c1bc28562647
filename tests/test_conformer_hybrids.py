"""Conformer family + Tita_ECAPA / Raw_tita / Res_ECAPA hybrids."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speakerverification_tpu.models import MODELS, build_model


def _feats(b=2, t=100, m=40, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray((rng.normal(0.5, 0.2, (b, t, m)) ** 2
                        ).astype(np.float32))


def _init_apply(model, x, train=False):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x)
    if train:
        return jax.jit(lambda v, x: model.apply(
            v, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)}))(variables, x)[0]
    return jax.jit(model.apply)(variables, x)


@pytest.mark.slow
def test_conformer_speaker():
    model = build_model("Conformer", nOut=32, n_mels=40, encoder_dim=32,
                        num_layers=2)
    out = _init_apply(model, _feats())
    assert out.shape == (2, 32)
    assert np.all(np.isfinite(np.asarray(out)))


# the conformer path is covered by test_conformer_speaker in the default
# tier; this second variant is slow-tier budget control
@pytest.mark.slow
def test_ecapa_conformer_small():
    from speakerverification_tpu.models.conformer import ECAPAConformer
    model = ECAPAConformer(nOut=24, channels=(32, 32, 32, 32, 96),
                           res2net_scale=4, se_channels=8,
                           attention_channels=8, encoder_dim=32, num_layers=2)
    out = _init_apply(model, _feats(seed=1), train=True)
    assert out.shape == (2, 24)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_res_ecapa():
    from speakerverification_tpu.models.hybrids2 import ResECAPA
    model = ResECAPA(nOut=24, num_filters=(8, 16), num_layers=(1, 1),
                     ecapa_channels=(32, 32, 32, 32, 96))
    out = _init_apply(model, _feats(m=40, seed=2))
    assert out.shape == (2, 24)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_tita_ecapa_small():
    from speakerverification_tpu.models.ecapa_tdnn import ECAPA_TDNN
    from speakerverification_tpu.models.hybrids2 import TitaECAPA
    from speakerverification_tpu.models.titanet import TitaNet
    from speakerverification_tpu.ops.frontend import FrontendConfig
    model = TitaECAPA(
        ecapa=ECAPA_TDNN(lin_neurons=16, channels=(32, 32, 32, 32, 96),
                         attention_channels=8, res2net_scale=4, se_channels=8,
                         log_input=False, input_norm=True),
        titanet=TitaNet(nOut=16, hidden_size=32, mega_block_kernel=3,
                        n_mega_blocks=1),
        frontend=FrontendConfig(n_mels=40))
    rng = np.random.default_rng(3)
    wave = jnp.asarray(rng.normal(0, 0.1, (2, 8000)).astype(np.float32))
    out = _init_apply(model, wave)
    assert out.shape == (2, 32)


@pytest.mark.slow
def test_raw_tita_small():
    from speakerverification_tpu.models.hybrids2 import RawTita
    from speakerverification_tpu.models.rawnet2_custom import RawNet2Custom
    from speakerverification_tpu.models.titanet import TitaNet
    from speakerverification_tpu.ops.frontend import FrontendConfig
    model = RawTita(
        titanet=TitaNet(nOut=16, hidden_size=32, mega_block_kernel=3,
                        n_mega_blocks=1),
        raw_branch=RawNet2Custom(nOut=16, front_proc="sinc", aggregate="asp",
                                 layers=(1, 1, 1, 1, 1, 1),
                                 filters=(16, 16, 32, 32, 32, 32),
                                 sample_rate=8000),
        frontend=FrontendConfig(n_mels=40))
    rng = np.random.default_rng(4)
    wave = jnp.asarray(rng.normal(0, 0.1, (2, 16000)).astype(np.float32))
    out = _init_apply(model, wave)
    assert out.shape == (2, 32)


def test_registry_names():
    for name in ["Conformer", "ECAPA_Conformer", "Tita_ECAPA", "Raw_tita",
                 "Res_ECAPA"]:
        assert name in MODELS, name
