"""Extended loss zoo: ARmSoftmax, MS family, Circle, proxies, MP, triplet."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speakerverification_tpu.losses import LOSSES, build_loss

RNG = np.random.default_rng(0)
X3 = jnp.asarray(RNG.normal(size=(6, 2, 16)).astype(np.float32))
LBL = jnp.asarray(RNG.integers(0, 10, 6))


def _run(name, x=X3, label=LBL, **kw):
    loss_mod = build_loss(name, nOut=16, nClasses=10, **kw)
    rngs = {"params": jax.random.PRNGKey(0), "mining": jax.random.PRNGKey(1)}
    variables = loss_mod.init(rngs, x, label)
    apply = jax.jit(lambda v, x, l: loss_mod.apply(
        v, x, l, rngs={"mining": jax.random.PRNGKey(2)}))
    return apply(variables, x, label)


ALL_NEW = ["ARmSoftmax", "AngularPenaltySMLoss", "MultiSimilarity",
           "MultiSimilarity_v2", "MSSoftmax", "MSAmSoftmax", "CircleLoss",
           "CircleLossV2", "ProxyAnchor", "ProxyNCA", "MP", "MMP",
           "TripletLoss", "GE2ELossV2", "GE2ELoss_fusion"]


@pytest.mark.parametrize("name", ALL_NEW)
def test_loss_runs_and_finite(name):
    loss, prec = _run(name)
    assert np.isfinite(float(loss)), name
    assert np.isfinite(float(prec)), name


@pytest.mark.parametrize("name", ALL_NEW)
def test_loss_differentiable(name):
    loss_mod = build_loss(name, nOut=16, nClasses=10)
    rngs = {"params": jax.random.PRNGKey(0), "mining": jax.random.PRNGKey(1)}
    variables = loss_mod.init(rngs, X3, LBL)

    def f(x):
        l, _ = loss_mod.apply(variables, x, LBL,
                              rngs={"mining": jax.random.PRNGKey(2)})
        return l

    g = jax.jit(jax.grad(f))(X3)
    assert np.all(np.isfinite(np.asarray(g))), name
    assert float(jnp.abs(g).sum()) > 0, name


def test_armsoftmax_oracle():
    """Literal port of the relative-margin trick (ARmSoftmax.py:36-60)."""
    rng = np.random.default_rng(1)
    B, D, C = 8, 16, 10
    x = rng.normal(size=(B, D)).astype(np.float32)
    label = rng.integers(0, C, B)
    loss_mod = build_loss("ARmSoftmax", nOut=D, nClasses=C, margin=0.1,
                          scale=30)
    variables = loss_mod.init(jax.random.PRNGKey(0), jnp.asarray(x),
                              jnp.asarray(label))
    loss, _ = loss_mod.apply(variables, jnp.asarray(x), jnp.asarray(label))

    W = np.asarray(variables["params"]["W"])
    xn = x / np.clip(np.linalg.norm(x, axis=1, keepdims=True), 1e-12, None)
    wn = W / np.clip(np.linalg.norm(W, axis=0, keepdims=True), 1e-12, None)
    costh = xn @ wn
    onehot = np.eye(C)[label]
    logits = 30 * (costh - 0.1 * onehot)
    own = logits[np.arange(B), label][:, None]
    reduced = logits - own
    relu_logits = np.where(reduced < 0, 0.0, logits)
    ls = relu_logits - relu_logits.max(1, keepdims=True)
    logp = ls - np.log(np.exp(ls).sum(1, keepdims=True))
    ref = -logp[np.arange(B), label].mean()
    assert float(loss) == pytest.approx(ref, rel=1e-4)


def test_proxy_anchor_oracle():
    rng = np.random.default_rng(2)
    B, D, C = 8, 16, 10
    x = rng.normal(size=(B, D)).astype(np.float32)
    label = rng.integers(0, C, B)
    loss_mod = build_loss("ProxyAnchor", nOut=D, nClasses=C, margin=0.1,
                          scale=30)
    variables = loss_mod.init(jax.random.PRNGKey(0), jnp.asarray(x),
                              jnp.asarray(label))
    loss, _ = loss_mod.apply(variables, jnp.asarray(x), jnp.asarray(label))

    P = np.asarray(variables["params"]["proxies"])
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    pn = P / np.linalg.norm(P, axis=1, keepdims=True)
    cos = xn @ pn.T
    onehot = np.eye(C)[label]
    pos_exp = np.exp(-30 * (cos - 0.1))
    neg_exp = np.exp(30 * (cos + 0.1))
    with_pos = onehot.sum(0) > 0
    p_sim = (pos_exp * onehot).sum(0)
    n_sim = (neg_exp * (1 - onehot)).sum(0)
    ref = (np.log1p(p_sim[with_pos]).sum() / with_pos.sum()
           + np.log1p(n_sim).sum() / C)
    assert float(loss) == pytest.approx(ref, rel=1e-3)


def test_multisimilarity_selects_pairs():
    """With well-separated clusters, MS loss should be near zero."""
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(3, 16)) * 20
    x = np.stack([np.stack([centers[i] + rng.normal(size=16) * 0.01
                            for _ in range(2)]) for i in range(3)])
    loss, _ = _run("MultiSimilarity", x=jnp.asarray(x.astype(np.float32)),
                   label=jnp.asarray([0, 1, 2]))
    assert float(loss) < 0.5


def test_triplet_semi_hard_mode():
    loss_mod = build_loss("TripletLoss", hard_rank=-1, margin=0.2)
    rngs = {"params": jax.random.PRNGKey(0), "mining": jax.random.PRNGKey(1)}
    variables = loss_mod.init(rngs, X3, None)
    loss, prec = loss_mod.apply(variables, X3, None,
                                rngs={"mining": jax.random.PRNGKey(3)})
    assert np.isfinite(float(loss))


def test_registry_covers_reference_loss_names():
    # Reference loss zoo (SURVEY.md §2.5) minus not-yet-implemented ones
    for n in ["Softmax", "AmSoftmax", "AAmSoftmax", "ARmSoftmax",
              "MSAmSoftmax", "MSSoftmax", "AngularProto", "Prototypical",
              "GE2ELoss", "GE2ELossV2", "GE2ELoss_fusion", "TripletLoss",
              "CircleLoss", "CircleLossV2", "MultiSimilarity",
              "MultiSimilarity_v2", "ProxyAnchor", "ProxyNCA",
              "AngularPenaltySMLoss", "MP", "MMP", "AAmSoftmaxAP",
              "SoftmaxAngularProto", "AmSoftmaxProto", "AAmSoftmaxProto"]:
        assert n in LOSSES, n
