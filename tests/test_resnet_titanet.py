"""ResNetSE family + TitaNet: shape/finite/grad checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speakerverification_tpu.models import MODELS, build_model


def _feats(b=2, t=100, m=40, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray((rng.normal(0.5, 0.2, (b, t, m)) ** 2
                        ).astype(np.float32))


@pytest.mark.slow   # covered by test_resnetse34_forward_parity
def test_resnetse34_forward():
    model = build_model("ResNetSE34", nOut=64, n_mels=40)
    x = _feats()
    variables = model.init(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(variables, x)
    assert out.shape == (2, 64)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow   # V2 block variant; basic family covered by the parity test
def test_resnetse34v2_sap():
    model = build_model("ResNetSE34V2", nOut=32, n_mels=40,
                        encoder_type="SAP")
    x = _feats(seed=1)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(variables, x)
    assert out.shape == (2, 32)


@pytest.mark.slow
def test_resnetse_bottleneck():
    """Smallest bottleneck variant (ResNetSE50 block type), reduced depth."""
    from speakerverification_tpu.models.resnetse import ResNetSE
    model = ResNetSE(nOut=32, block="bottleneck", layers=(1, 1, 1, 1),
                     num_filters=(8, 8, 16, 16), n_mels=40)
    x = _feats(seed=2)
    variables = model.init(jax.random.PRNGKey(0), x)
    out, mutated = jax.jit(lambda v, x: model.apply(
        v, x, train=True, mutable=["batch_stats"]))(variables, x)
    assert out.shape == (2, 32)
    assert np.all(np.isfinite(np.asarray(out)))


def test_resnetse_registry():
    for name in ["ResNetSE34", "ResNetSE34V2", "ResNetSE50", "ResNetSE50V2",
                 "ResNetSE100m2", "ResNetSE101", "ResNetSE152"]:
        assert name in MODELS, name


# TitaNet forward is covered by the weight-port parity test in the
# default tier; the size-S smoke moves to the slow tier
@pytest.mark.slow
def test_titanet_s_forward():
    model = build_model("TitaNet", nOut=48, model_size="s", n_mega_blocks=2)
    x = _feats(seed=3)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(variables, x)
    assert out.shape == (2, 48)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_titanet_train_dropout_rng():
    """Slow tier (r5 cold budget, 7 s compile): TitaNet forward
    coverage stays default in the parametrized forwards above."""
    model = build_model("TitaNet", nOut=16, model_size="s", n_mega_blocks=1)
    x = _feats(seed=4)
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, x)
    out, mutated = jax.jit(lambda v, x: model.apply(
        v, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)}))(variables, x)
    assert out.shape == (2, 16)
    assert "batch_stats" in mutated


@pytest.mark.slow
def test_resnetse_grad_finite():
    model = build_model("ResNetSE34", nOut=16, n_mels=40)
    x = _feats(seed=5)
    variables = model.init(jax.random.PRNGKey(0), x)

    def f(params):
        out, _ = model.apply({**variables, "params": params}, x,
                             train=True, mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    g = jax.grad(f)(variables["params"])
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree_util.tree_leaves(g))
