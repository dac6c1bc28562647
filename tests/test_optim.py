"""Optimizer/scheduler zoo tests."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speakerverification_tpu.optim import (
    EarlyStopping,
    OPTIMIZERS,
    ReduceOnPlateau,
    build_optimizer,
    build_scheduler,
    set_learning_rate,
)

ALL_NAMES = ["adam", "sgd", "AdaBelief", "RAdam", "Lamb", "LARS", "NovoGrad",
             "Yogi", "Adafactor", "SGDW", "QHM", "QHAdam", "DiffGrad",
             "MADGRAD", "AdaBound", "AdaMod", "AdamP", "SGDP", "AggMo",
             "PID", "AccSGD", "SWATS", "Lookahead"]


@pytest.mark.parametrize("name", ALL_NAMES)
@pytest.mark.filterwarnings("ignore:optimizer .* ignores config key")
def test_optimizer_reduces_quadratic(name):
    """Each optimizer must make progress on a convex quadratic (the
    blanket momentum=0.9 below intentionally exercises the ignored-key
    filter, hence the warning suppression)."""
    params = {"w": jnp.array([1.0, -2.0, 3.0])}

    def loss(p):
        return jnp.sum(p["w"] ** 2)

    lr = 0.05 if name not in ("LARS",) else 0.5
    # AdaMod's momental bound (EMA of per-element LRs from zero) makes the
    # first steps intentionally tiny; use a faster bound EMA in the test.
    extra = {"b3": 0.5} if name == "AdaMod" else {}
    tx = build_optimizer(name, learning_rate=lr, weight_decay=0.0,
                         momentum=0.9, **extra)
    opt_state = tx.init(params)
    l0 = float(loss(params))

    @jax.jit
    def step(params, opt_state):
        grads = jax.grad(loss)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return jax.tree_util.tree_map(lambda p, u: p + u, params,
                                      updates), opt_state

    for _ in range(50):
        params, opt_state = step(params, opt_state)
    l1 = float(loss(params))
    assert l1 < l0 * 0.9, f"{name}: {l0} -> {l1}"


def test_weight_decay_coupled():
    """torch-style L2: with wd, zero-grad params still shrink (adam)."""
    params = {"w": jnp.ones(4)}
    tx = build_optimizer("adam", learning_rate=0.1, weight_decay=0.5)
    s = tx.init(params)
    g = {"w": jnp.zeros(4)}
    u, s = tx.update(g, s, params)
    assert float(jnp.sum(jnp.abs(u["w"]))) > 0


def test_set_learning_rate_inside_jit():
    params = {"w": jnp.ones(3)}
    tx = build_optimizer("sgd", learning_rate=1.0, weight_decay=0.0)
    s = tx.init(params)

    @jax.jit
    def step(s, lr):
        s = set_learning_rate(s, lr)
        g = {"w": jnp.ones(3)}
        u, s = tx.update(g, s, params)
        return u

    u1 = step(s, 0.1)
    u2 = step(s, 0.2)
    np.testing.assert_allclose(np.asarray(u1["w"]), -0.1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(u2["w"]), -0.2, rtol=1e-6)


def test_steplr_schedule():
    sched, unit = build_scheduler("steplr", lr=1.0, step_size=10, lr_decay=0.5)
    assert unit == "epoch"
    assert sched(0) == 1.0
    assert sched(9) == 1.0
    assert sched(10) == 0.5
    assert sched(25) == 0.25


def test_cosine_annealing_pt_schedule():
    """Closed form of torch CosineAnnealingLR at eta_min=1e-6."""
    lr, T = 0.003, 1000
    sched, unit = build_scheduler("cosine_annealinglr_pt", lr=lr, T_max=T)
    assert unit == "iteration"
    assert sched(0) == pytest.approx(lr)
    assert sched(T) == pytest.approx(1e-6)
    mid = 1e-6 + (lr - 1e-6) * 0.5 * (1 + math.cos(math.pi * 0.5))
    assert sched(T // 2) == pytest.approx(mid)


def test_warm_restarts_schedule():
    sched, _ = build_scheduler("cosine_annealing_warm_restarts", lr=1.0,
                               T_max=100, eta_min=0.0)
    assert sched(0) == pytest.approx(1.0)
    assert sched(50) == pytest.approx(0.5)
    assert sched(100) == pytest.approx(1.0)      # restart


def test_cyclic_triangular2():
    sched, _ = build_scheduler("cycliclr", lr=None, base_lr=0.0, max_lr=1.0,
                               T_max=200, mode="triangular2")
    assert sched(0) == pytest.approx(0.0)
    assert sched(100) == pytest.approx(1.0)      # peak of first cycle
    assert sched(300) == pytest.approx(0.5)      # peak of second cycle halved


def test_reduce_on_plateau():
    pl = ReduceOnPlateau(lr=1.0, patience=2, factor=0.5, min_lr=0.1)
    losses = [1.0, 0.9, 0.9, 0.95, 0.92]   # no improvement after 0.9
    lrs = [pl(l) for l in losses]
    assert lrs[-1] == pytest.approx(0.5)    # reduced after patience exceeded
    for _ in range(20):
        pl(2.0)
    assert pl.lr >= 0.1


def test_early_stopping():
    es = EarlyStopping(patience=3)
    for l in [1.0, 0.9, 0.8]:
        assert not es(l)
    assert not es(0.85)
    assert not es(0.85)
    assert es(0.85)          # third bad epoch hits patience
    assert es.early_stop


def test_unknown_optimizer():
    with pytest.raises(KeyError):
        build_optimizer("NoSuchOpt", learning_rate=0.1)


def test_registry_covers_reference_names():
    # Reference zoo names that must resolve (SURVEY.md §2.6)
    for n in ["adam", "sgd", "AdaBelief", "RAdam", "AdamP", "AdaBound",
              "AdaMod", "Adafactor", "DiffGrad", "LARS", "Lamb", "Lookahead",
              "MADGRAD", "NovoGrad", "PID", "QHAdam", "QHM", "AccSGD",
              "AggMo", "SGDP", "SGDW", "SWATS", "Yogi"]:
        assert n in OPTIMIZERS, n


def test_qhm_beta_alias_matches_momentum():
    """'beta' (pre-r3 name of QHM's momentum factor) must not be
    silently dropped by the signature filter."""
    params = {"w": jnp.array([1.0, -2.0])}
    g = {"w": jnp.array([0.5, 0.5])}
    tx_a = build_optimizer("QHM", learning_rate=0.1, beta=0.9)
    tx_b = build_optimizer("QHM", learning_rate=0.1, momentum=0.9)
    sa, sb = tx_a.init(params), tx_b.init(params)
    for _ in range(3):
        ua, sa = tx_a.update(g, sa, params)
        ub, sb = tx_b.update(g, sb, params)
    np.testing.assert_allclose(np.asarray(ua["w"]), np.asarray(ub["w"]))


def test_ignored_optimizer_key_warns():
    with pytest.warns(UserWarning, match="ignores config key"):
        build_optimizer("adam", learning_rate=0.1, momentum=0.9)


def test_track_ema_matches_manual_ema(tmp_path):
    """ema_decay appends track_ema: the opt_state carries an EMA of the
    POST-update params; set_learning_rate still drives the chained
    state; save_checkpoint -> load_ema_params round-trips it and a
    no-EMA checkpoint returns None."""
    from speakerverification_tpu.optim import get_ema_params
    from speakerverification_tpu.training.checkpoint import (
        load_ema_params,
        save_checkpoint,
    )
    from speakerverification_tpu.training.state import TrainState

    d = 0.9
    tx = build_optimizer("sgd", learning_rate=0.1, ema_decay=d)
    params = {"w": jnp.array([1.0, -2.0, 3.0])}
    opt_state = tx.init(params)

    manual_ema = np.asarray(params["w"])
    p = params
    for i in range(4):
        g = {"w": 2.0 * p["w"]}                       # grad of sum(w^2)
        opt_state = set_learning_rate(opt_state, jnp.float32(0.05))
        updates, opt_state = tx.update(g, opt_state, p)
        import optax
        p = optax.apply_updates(p, updates)
        manual_ema = manual_ema * d + np.asarray(p["w"]) * (1 - d)

    ema = get_ema_params(opt_state)
    assert ema is not None
    np.testing.assert_allclose(np.asarray(ema["w"]), manual_ema, rtol=1e-6)
    # the lr actually changed (0.1 -> 0.05): one update is -2*0.05*w
    assert not np.allclose(np.asarray(p["w"]), 0.0)

    state = TrainState(step=jnp.zeros([], jnp.int32), params=p,
                       batch_stats={}, opt_state=opt_state)
    save_checkpoint(tmp_path / "ck.msgpack", state)
    template = TrainState(
        step=jnp.zeros([], jnp.int32),
        params={"w": jnp.zeros((3,))}, batch_stats={},
        opt_state=opt_state)
    out = load_ema_params(tmp_path / "ck.msgpack", template)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out.params["w"]), manual_ema,
                               rtol=1e-6)

    # checkpoint trained WITHOUT ema -> None
    tx0 = build_optimizer("sgd", learning_rate=0.1)
    state0 = TrainState(step=jnp.zeros([], jnp.int32), params=p,
                        batch_stats={}, opt_state=tx0.init(p))
    save_checkpoint(tmp_path / "ck0.msgpack", state0)
    assert load_ema_params(tmp_path / "ck0.msgpack", template) is None


def test_ema_decay_validation():
    with pytest.raises(ValueError, match="ema_decay"):
        build_optimizer("adam", learning_rate=1e-3, ema_decay=1.5)


def test_track_ema_averages_bfloat16_leaves():
    """bf16 master params must be EMA-averaged too (ml_dtypes' bfloat16
    has dtype.kind 'V' — a kind=='f' test silently skips it)."""
    import optax

    from speakerverification_tpu.optim import get_ema_params

    tx = build_optimizer("sgd", learning_rate=0.5, ema_decay=0.5)
    params = {"w": jnp.ones((4,), jnp.bfloat16)}
    opt_state = tx.init(params)
    g = {"w": jnp.ones((4,), jnp.bfloat16)}
    updates, opt_state = tx.update(g, opt_state, params)
    new_p = optax.apply_updates(params, updates)      # 1 - 0.5 = 0.5
    ema = get_ema_params(opt_state)["w"]
    # ema = 1*0.5 + 0.5*0.5 = 0.75 — NOT the raw post-update 0.5
    np.testing.assert_allclose(np.asarray(ema, np.float32), 0.75)
    np.testing.assert_allclose(np.asarray(new_p["w"], np.float32), 0.5)


@pytest.mark.slow        # 29 distinct tiny compiles ≈ 22 s; per-optimizer
                         # math is already covered by trajectory parity
def test_every_registered_optimizer_meets_contract():
    """Every registry entry must work through the zoo's one contract:
    build -> init on plain params -> set_learning_rate -> update -> jit,
    composed with ema_decay. (Caught: the optax.lookahead wrapper needs
    a fast/slow params pair and crashed on plain params.)"""
    import optax

    from speakerverification_tpu.optim import get_ema_params

    for name in sorted(OPTIMIZERS.names()):
        tx = build_optimizer(name, learning_rate=0.01, ema_decay=0.5)
        p = {"w": jnp.ones((4, 3)), "b": jnp.zeros((3,))}
        s = tx.init(p)
        s = set_learning_rate(s, jnp.float32(0.005))
        g = {"w": jnp.full((4, 3), 0.1), "b": jnp.full((3,), 0.1)}
        u, s = tx.update(g, s, p)
        p2 = optax.apply_updates(p, u)
        for leaf in jax.tree_util.tree_leaves(p2):
            assert np.isfinite(np.asarray(leaf)).all(), name
        assert get_ema_params(s) is not None, name
        jitted = jax.jit(lambda s_, p_, tx_=tx: tx_.update(g, s_, p_))
        jitted(s, p2)
