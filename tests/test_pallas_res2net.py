"""Fused Res2Net cascade kernel vs the XLA module path (interpret mode).

The kernel (ops/pallas_res2net.py) must reproduce Res2NetBlock's
eval-mode forward — Conv1d k=3 reflect-padded dilated convs, ReLU, and
eval BatchNorm folded to an affine — exactly (f32 tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speakerverification_tpu.models.layers import Res2NetBlock


def _randomized_variables(variables, key):
    """Perturb init so BN stats/affine are non-trivial."""
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(key, len(leaves))
    out = []
    for leaf, k in zip(leaves, keys):
        noise = jax.random.normal(k, leaf.shape, leaf.dtype) * 0.3
        # keep BN variances positive
        out.append(jnp.abs(leaf + noise) if leaf.ndim == 1 else leaf + noise)
    return jax.tree_util.tree_unflatten(treedef, out)


@pytest.mark.parametrize("dilation", [2, 3, 4])
def test_fused_cascade_matches_xla(dilation):
    features, scale, T, B = 64, 4, 37, 5
    xla = Res2NetBlock(features, scale, 3, dilation, backend="xla")
    fused = Res2NetBlock(features, scale, 3, dilation, backend="pallas")

    rng = np.random.default_rng(dilation)
    x = jnp.asarray(rng.normal(0, 1, (B, T, features)).astype(np.float32))
    variables = xla.init(jax.random.PRNGKey(0), x)
    variables = _randomized_variables(variables, jax.random.PRNGKey(7))

    ref = xla.apply(variables, x, train=False)
    got = fused.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_cascade_param_tree_identical():
    xla = Res2NetBlock(32, 4, 3, 2, backend="xla")
    fused = Res2NetBlock(32, 4, 3, 2, backend="pallas")
    x = jnp.ones((2, 19, 32))
    v1 = xla.init(jax.random.PRNGKey(0), x)
    v2 = fused.init(jax.random.PRNGKey(0), x)
    t1 = jax.tree_util.tree_structure(v1)
    t2 = jax.tree_util.tree_structure(v2)
    assert t1 == t2
    for a, b in zip(jax.tree_util.tree_leaves(v1),
                    jax.tree_util.tree_leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_cascade_train_mode_uses_xla_path():
    """train=True must take the XLA path (batch-stat updates intact)."""
    blk = Res2NetBlock(32, 4, 3, 2, backend="pallas")
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (3, 21, 32)),
                    jnp.float32)
    variables = blk.init(jax.random.PRNGKey(0), x)
    out, mutated = blk.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    ref_blk = Res2NetBlock(32, 4, 3, 2, backend="xla")
    ref, ref_mut = ref_blk.apply(variables, x, train=True,
                                 mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(mutated),
                    jax.tree_util.tree_leaves(ref_mut)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


# the pallas cascade kernel is OPT-IN (ships at-par); its exact-match
# check runs in the slow tier
@pytest.mark.slow
def test_ecapa_conv_backend_pallas_matches_xla():
    from speakerverification_tpu.models import build_model

    kwargs = dict(channels=(32, 32, 32, 32, 96), kernel_sizes=(5, 3, 3, 3, 1),
                  dilations=(1, 2, 3, 4, 1), attention_channels=8,
                  res2net_scale=4, se_channels=8)
    m_xla = build_model("ECAPA_TDNN", nOut=16, conv_backend="xla", **kwargs)
    m_pl = build_model("ECAPA_TDNN", nOut=16, conv_backend="pallas", **kwargs)

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(0, 1, (2, 50, 80)).astype(np.float32)) ** 2
    variables = m_xla.init(jax.random.PRNGKey(0), feats)
    ref = m_xla.apply(variables, feats, train=False)
    got = m_pl.apply(variables, feats, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)
