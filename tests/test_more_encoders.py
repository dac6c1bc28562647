"""NeXt family, EfficientNet v1/v2, RepVGG, SCNet, DPN + full registry parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speakerverification_tpu.models import MODELS

RNGS = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}


def _feats(b=1, t=64, m=40, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray((rng.normal(0.5, 0.2, (b, t, m)) ** 2
                        ).astype(np.float32))


def _train_apply(model, x):
    v = model.init(RNGS, x)
    out, _ = jax.jit(lambda v, x: model.apply(
        v, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)}))(v, x)
    return out


def _image_cases():
    import speakerverification_tpu.models.image_encoders as IE
    # (name, builder, slow): one cheap representative runs by default;
    # the rest compile minutes each on the 1-CPU CI box → mark slow.
    return {
        "EfficientNetV2": (lambda: IE.EfficientNetV2(
            nOut=16, cfgs=((1, 8, 1, 1, 0), (4, 16, 1, 2, 1))), False),
        "EfficientNet": (lambda: IE.EfficientNet(
            nOut=16, width_coeff=1.0, depth_coeff=0.3), True),
        "RepVGG": (lambda: IE.RepVGG(
            nOut=16, num_blocks=(1, 1, 1, 1),
            width=(0.25, 0.25, 0.25, 0.5)), True),
        "SCNet": (lambda: IE.SCNet(nOut=16, layers=(1, 1, 1, 1)), True),
        "DPN": (lambda: IE.DPN(nOut=16, k_sec=(1, 1, 1, 1),
                               inc_sec=(4, 8, 8, 16), k_r=32, groups=8),
                True),
    }


@pytest.mark.parametrize("name", [
    pytest.param(n, marks=pytest.mark.slow if slow else ())
    for n, (_, slow) in _image_cases().items()])
def test_image_encoders_small(name):
    build, _ = _image_cases()[name]
    out = _train_apply(build(), _feats())
    assert out.shape == (1, 16), name
    assert np.all(np.isfinite(np.asarray(out))), name


@pytest.mark.parametrize("which", [
    pytest.param("RawNeXt", marks=pytest.mark.slow),
    pytest.param("ResNeXt", marks=pytest.mark.slow)])
def test_next_family_small(which):
    import speakerverification_tpu.models.next as NX
    # batch of 2: train-mode BatchNorm on a single example zeroes the code
    wave = jnp.asarray(np.random.default_rng(1).normal(
        0, 0.1, (2, 8000)).astype(np.float32))
    cls = getattr(NX, which)
    model = cls(nOut=16, levels=(1, 1, 1, 1, 1, 1),
                channels=(32, 32, 32, 32, 64, 64))
    out = _train_apply(model, wave)
    assert out.shape == (2, 16)
    assert np.all(np.isfinite(np.asarray(out)))
    # training codes are x9-normalized (RawNeXt.py:174-178)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1),
                               9.0, rtol=1e-4)


def test_gate_module_weights_sum_to_one():
    import speakerverification_tpu.models.next as NX
    gm = NX.GateModule(channels=16, bottleneck=8, nb_input=3)
    rng = np.random.default_rng(2)
    branches = [jnp.asarray(rng.normal(size=(2, 10, 16)).astype(np.float32))
                for _ in range(3)]
    v = gm.init(RNGS, branches)
    out = gm.apply(v, branches)
    assert out.shape == (2, 10, 16)


def test_registry_covers_all_reference_mainmodels():
    """Every reference MainModel name must resolve in our registry
    (SURVEY.md §2.4; `grep "def MainModel" src/models/*.py`)."""
    reference_names = [
        "Conformer", "ECAPA_Conformer", "ECAPA_TDNN", "EfficientNet",
        "Raw3_ECAPA", "RawNeXt", "RawNet2_custom", "RawNet3",
        "RawNet_baseline", "Raw_ECAPA", "Raw_ECAPA_conv_asp",
        "Raw_ECAPA_hype", "Raw_ECAPA_sinc_asp", "Raw_ECAPA_sinc_gru",
        "Raw_tita", "RepVGG", "ResNeXt", "ResNetSE100m2", "ResNetSE101",
        "ResNetSE152", "ResNetSE34", "ResNetSE34V2", "ResNetSE50",
        "ResNetSE50V2", "Res_ECAPA", "SCnet", "TitaNet", "Tita_ECAPA",
    ]
    missing = [n for n in reference_names if n not in MODELS]
    assert not missing, f"missing reference models: {missing}"
    # extras we also provide
    for n in ["EfficientNetv2", "DPN", "RawNet2"]:
        assert n in MODELS
