"""Loss zoo: golden tests vs numpy oracles of the reference math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speakerverification_tpu.losses import LOSSES, build_loss


def _init_and_apply(loss, x, label=None, seed=0):
    variables = loss.init(jax.random.PRNGKey(seed), x, label)
    out = loss.apply(variables, x, label)
    return variables, out


def _softmax_ce(logits, labels):
    logits = logits - logits.max(axis=1, keepdims=True)
    logp = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
    return -logp[np.arange(len(labels)), labels].mean()


def test_aamsoftmax_oracle():
    rng = np.random.default_rng(0)
    B, D, C = 8, 16, 10
    x = rng.normal(size=(B, D)).astype(np.float32)
    label = rng.integers(0, C, B)

    loss_mod = build_loss("AAmSoftmax", nOut=D, nClasses=C, margin=0.2, scale=30)
    variables, (loss, prec1) = _init_and_apply(loss_mod, jnp.asarray(x),
                                               jnp.asarray(label))
    W = np.asarray(variables["params"]["weight"])

    # oracle: literal port of src/losses/AAmSoftmax.py:50-68
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    wn = W / np.linalg.norm(W, axis=1, keepdims=True)
    cos = xn @ wn.T
    sin = np.sqrt(np.clip(1 - cos**2, 0, 1))
    m = 0.2
    phi = cos * np.cos(m) - sin * np.sin(m)
    th, mm = np.cos(np.pi - m), np.sin(np.pi - m) * m
    phi = np.where(cos - th > 0, phi, cos - mm)
    onehot = np.eye(C)[label]
    logits = 30 * (onehot * phi + (1 - onehot) * cos)
    assert float(loss) == pytest.approx(_softmax_ce(logits, label), rel=1e-4)


def test_aamsoftmax_grouped_input():
    """3D input must flatten with repeat-interleaved labels
    (src/losses/AAmSoftmax.py:41-44)."""
    rng = np.random.default_rng(1)
    x3 = rng.normal(size=(4, 2, 16)).astype(np.float32)
    label = rng.integers(0, 10, 4)
    loss_mod = build_loss("AAmSoftmax", nOut=16, nClasses=10)
    variables = loss_mod.init(jax.random.PRNGKey(0), jnp.asarray(x3),
                              jnp.asarray(label))
    loss3, _ = loss_mod.apply(variables, jnp.asarray(x3), jnp.asarray(label))
    loss2, _ = loss_mod.apply(variables, jnp.asarray(x3).reshape(8, 16),
                              jnp.asarray(np.repeat(label, 2)))
    assert float(loss3) == pytest.approx(float(loss2), rel=1e-6)


def test_amsoftmax_oracle():
    rng = np.random.default_rng(2)
    B, D, C = 8, 16, 10
    x = rng.normal(size=(B, D)).astype(np.float32)
    label = rng.integers(0, C, B)
    loss_mod = build_loss("AmSoftmax", nOut=D, nClasses=C, margin=0.1, scale=30)
    variables, (loss, prec1) = _init_and_apply(loss_mod, jnp.asarray(x),
                                               jnp.asarray(label))
    W = np.asarray(variables["params"]["W"])  # [D, C]
    xn = x / np.clip(np.linalg.norm(x, axis=1, keepdims=True), 1e-12, None)
    wn = W / np.clip(np.linalg.norm(W, axis=0, keepdims=True), 1e-12, None)
    costh = xn @ wn
    onehot = np.eye(C)[label]
    logits = 30 * (costh - 0.1 * onehot)
    assert float(loss) == pytest.approx(_softmax_ce(logits, label), rel=1e-4)


def test_angularproto_oracle():
    rng = np.random.default_rng(3)
    B, P, D = 6, 2, 16
    x = rng.normal(size=(B, P, D)).astype(np.float32)
    loss_mod = build_loss("AngularProto")
    variables, (loss, prec1) = _init_and_apply(loss_mod, jnp.asarray(x))

    anchor = x[:, 1:, :].mean(1)
    pos = x[:, 0, :]
    an = anchor / np.linalg.norm(anchor, axis=1, keepdims=True)
    pn = pos / np.linalg.norm(pos, axis=1, keepdims=True)
    logits = (pn @ an.T) * 10.0 - 5.0
    assert float(loss) == pytest.approx(
        _softmax_ce(logits, np.arange(B)), rel=1e-4)


def test_prototypical_oracle():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(5, 3, 8)).astype(np.float32)
    loss_mod = build_loss("Prototypical")
    _, (loss, prec1) = _init_and_apply(loss_mod, jnp.asarray(x))
    anchor = x[:, 1:, :].mean(1)
    pos = x[:, 0, :]
    d2 = ((pos[:, None, :] - anchor[None, :, :]) ** 2).sum(-1)
    assert float(loss) == pytest.approx(
        _softmax_ce(-d2, np.arange(5)), rel=1e-4)


def test_ge2e_softmax_oracle():
    rng = np.random.default_rng(5)
    N, M, D = 4, 3, 8
    x = rng.normal(size=(N, M, D)).astype(np.float32)
    loss_mod = build_loss("GE2ELoss")
    _, (loss, prec1) = _init_and_apply(loss_mod, jnp.asarray(x))

    # oracle: per-element cosine to centroids, leave-one-out on own speaker
    centroids = x.mean(1)
    sim = np.zeros((N, M, N))
    for j in range(N):
        for i in range(M):
            for k in range(N):
                c = centroids[k] if k != j else \
                    (x[j].sum(0) - x[j, i]) / (M - 1)
                denom = max(np.linalg.norm(x[j, i]), 1e-6) * \
                    max(np.linalg.norm(c), 1e-6)
                sim[j, i, k] = x[j, i] @ c / denom
    sim = sim * 10.0 - 5.0
    logp = sim - np.log(np.exp(sim - sim.max(-1, keepdims=True)).sum(
        -1, keepdims=True)) - sim.max(-1, keepdims=True)
    ref = -sum(logp[j, i, j] for j in range(N) for i in range(M))
    assert float(loss) == pytest.approx(ref, rel=1e-3)


def test_combined_losses_run():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(4, 2, 16)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 10, 4))
    for name in ["SoftmaxAngularProto", "AmSoftmaxProto", "AAmSoftmaxProto",
                 "AAmSoftmaxAP"]:
        loss_mod = build_loss(name, nOut=16, nClasses=10)
        _, (loss, prec1) = _init_and_apply(loss_mod, x, label)
        assert np.isfinite(float(loss)), name
        assert 0.0 <= float(prec1) <= 100.0, name


# every-head differentiability is exercised indirectly by the live-parity
# and train-step tests; the exhaustive sweep is slow-tier budget control
@pytest.mark.slow
def test_losses_differentiable():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(4, 2, 16)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 10, 4))
    for name in ["AAmSoftmax", "AngularProto", "GE2ELoss"]:
        loss_mod = build_loss(name, nOut=16, nClasses=10)
        variables = loss_mod.init(jax.random.PRNGKey(0), x, label)

        def f(xx):
            l, _ = loss_mod.apply(variables, xx, label)
            return l
        g = jax.grad(f)(x)
        assert np.all(np.isfinite(np.asarray(g))), name


def test_registry_names():
    for name in ["Softmax", "AmSoftmax", "AAmSoftmax", "AngularProto",
                 "Prototypical", "GE2ELoss", "SoftmaxAngularProto",
                 "AmSoftmaxProto", "AAmSoftmaxProto", "AAmSoftmaxAP"]:
        assert name in LOSSES
