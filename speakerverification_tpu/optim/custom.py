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
* AdamP / SGDP — tangent-space projection for scale-invariant weights
  (Heo et al. 2021), full channel/layer-view projection
* AggMo     — aggregated momentum (Lucas et al. 2018)
* AccSGD    — accelerated SGD (Kidambi et al. 2018)
* PID       — PID-controller SGD (An et al. 2018)
* SWATS     — switches Adam→SGD on the projected-step convergence
  criterion (Keskar & Socher 2017)
* AdaBelief / RAdam / Lamb / LARS / NovoGrad / Adafactor — exact ports
  of the reference's vendored semantics (each differs from the optax
  built-in in decay coupling, debiasing, or state seeding; see the
  factory docstrings). All are trajectory-tested step-by-step against
  the live reference classes in tests/test_optim_trajectory_parity.py.
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
def qhm(learning_rate, weight_decay=0.0, nu=0.7, momentum=0.0, beta=None,
        **kw):
    """Parity: src/optimizer/QHM.py:51-52 defaults momentum=0, nu=0.7;
    coupled ('grad') weight decay; trajectory-tested vs the vendored
    class in test_optim_trajectory_parity.py. ``beta`` is the pre-r3
    name of the momentum factor (the paper's β) — kept as an alias so
    existing configs don't silently fall back to momentum=0."""
    if beta is not None:
        momentum = beta
    return optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        scale_by_qhm(nu, momentum), optax.scale(-learning_rate))


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
def qhadam(learning_rate, weight_decay=0.0, nu1=1.0, nu2=1.0,
           b1=0.9, b2=0.999, eps=1e-8, **kw):
    """Parity: src/optimizer/QHAdam.py:45-46 defaults nus=(1,1),
    betas=(0.9,0.999); its in-place normalized EMAs equal our
    bias-corrected moments algebraically."""
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
    """MADGRAD as a whole-update transformation (needs params).

    Parity with src/optimizer/MADGRAD.py:10-108: the effective rate is
    ``lr + eps``, ``λ_k = (lr+eps)·√(k+1)``, and the iterate is an
    EMA of z with weight ``ck = 1 − momentum`` on z."""

    def init(params):
        return MadgradState(jnp.zeros([], jnp.int32),
                            _tree_zeros_like(params), _tree_zeros_like(params),
                            params)

    def update(updates, state, params):
        if weight_decay:
            updates = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, updates, params)
        count = state.count + 1
        lamb = (learning_rate + eps) * jnp.sqrt(count.astype(jnp.float32))
        s = jax.tree_util.tree_map(lambda a, g: a + lamb * g,
                                   state.grad_sum, updates)
        nu = jax.tree_util.tree_map(lambda a, g: a + lamb * g * g,
                                    state.grad_sum_sq, updates)
        if momentum == 0:
            # x0 recomputed from the pre-update accumulators
            # (MADGRAD.py:87-90,100-101)
            x0 = jax.tree_util.tree_map(
                lambda p, ss, nn: p + ss / (jnp.cbrt(nn) + eps),
                params, state.grad_sum, state.grad_sum_sq)
            new_p = jax.tree_util.tree_map(
                lambda x, ss, nn: x - ss / (jnp.cbrt(nn) + eps), x0, s, nu)
        else:
            z = jax.tree_util.tree_map(
                lambda x0, ss, nn: x0 - ss / (jnp.cbrt(nn) + eps),
                state.x0, s, nu)
            new_p = jax.tree_util.tree_map(
                lambda p, zz: momentum * p + (1 - momentum) * zz, params, z)
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
    """Parity: src/optimizer/AdaMod.py — decay is DECOUPLED
    (``p -= wd·lr·p``, AdaMod.py:61-64), bounds applied against the
    updated rate EMA."""
    def init(params):
        z = _tree_zeros_like(params)
        return AdaModState(jnp.zeros([], jnp.int32), z, z, z)

    def update(updates, state, params=None):
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
        if weight_decay and params is not None:
            out = jax.tree_util.tree_map(
                lambda e, mm, p: -e * mm - weight_decay * learning_rate * p,
                eta, m, params)
        else:
            out = jax.tree_util.tree_map(lambda e, mm: -e * mm, eta, m)
        return out, AdaModState(count, m, v, s)

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# AdamP / SGDP — projection-based updates for scale-invariant weights
# (Heo et al. 2021; parity: src/optimizer/AdamP.py:90-126,182 and
# SGDP.py:90-126,182)
# ---------------------------------------------------------------------------

def _adamp_projection(p, grad, perturb, delta, wd_ratio, eps):
    """Tangent-space projection of ``perturb`` for scale-invariant ``p``.

    Mirrors AdamP._projection: try the channel view then the layer view;
    the first view whose max |cos(grad, p)| falls below
    ``delta / sqrt(view_cols)`` triggers the projection and the reduced
    weight-decay ratio. Data-dependent branches become ``jnp.where``.
    Returns ``(perturb', wd_ratio')``.

    The reference's channel view is ``x.view(x.size(0), -1)`` over torch
    ``[out, in, k...]`` tensors (AdamP.py:90-91) — one row per OUTPUT
    channel. Flax kernels are ``[k..., in, out]`` with output channels
    LAST, so the channel view here reduces over every axis but the last;
    that yields the same per-output-channel fan-in groups the
    scale-invariance argument (a following BatchNorm) is about. Parity
    with the live torch ``_projection`` on transposed tensors is pinned
    in tests/test_optim_trajectory_parity.py.
    """
    ch_axes = tuple(range(p.ndim - 1))     # fan-in axes (channel view)
    ly_axes = tuple(range(p.ndim))         # whole tensor (layer view)
    fan_in = 1
    for d in p.shape[:-1]:
        fan_in *= d

    def view_stats(axes, ncols):
        dot = jnp.sum(grad * p, axis=axes)
        gn = jnp.sqrt(jnp.sum(grad * grad, axis=axes)) + eps
        pn = jnp.sqrt(jnp.sum(p * p, axis=axes)) + eps
        return jnp.max(jnp.abs(dot) / gn / pn) < delta / (ncols ** 0.5)

    def project(axes):
        pv_norm = jnp.sqrt(jnp.sum(p * p, axis=axes, keepdims=True)) + eps
        p_n = p / pv_norm
        inner = jnp.sum(p_n * perturb, axis=axes, keepdims=True)
        return perturb - p_n * inner

    cond_ch = view_stats(ch_axes, fan_in)
    cond_ly = view_stats(ly_axes, p.size)
    out = jnp.where(cond_ch, project(ch_axes),
                    jnp.where(cond_ly, project(ly_axes), perturb))
    wd = jnp.where(cond_ch | cond_ly, wd_ratio, 1.0)
    return out, wd


class AdamPState(NamedTuple):
    count: chex.Array
    m: chex.ArrayTree
    v: chex.ArrayTree


@OPTIMIZERS.register("AdamP")
def adamp(learning_rate, weight_decay=0.0, b1=0.9, b2=0.999, eps=1e-8,
          delta=0.1, wd_ratio=0.1, nesterov=False, **kw):
    def init(params):
        return AdamPState(jnp.zeros([], jnp.int32),
                          _tree_zeros_like(params), _tree_zeros_like(params))

    def update(updates, state, params):
        count = state.count + 1
        bc1 = 1 - b1 ** count
        bc2 = 1 - b2 ** count
        m = jax.tree_util.tree_map(lambda mo, g: b1 * mo + (1 - b1) * g,
                                   state.m, updates)
        v = jax.tree_util.tree_map(lambda vo, g: b2 * vo + (1 - b2) * g * g,
                                   state.v, updates)
        step_size = learning_rate / bc1

        def leaf(p, g, mm, vv):
            denom = jnp.sqrt(vv) / jnp.sqrt(bc2) + eps
            perturb = ((b1 * mm + (1 - b1) * g) / denom if nesterov
                       else mm / denom)
            wdr = 1.0
            if p.ndim > 1:
                perturb, wdr = _adamp_projection(p, g, perturb, delta,
                                                 wd_ratio, eps)
            # p' = p·(1 − lr·wd·wdr) − step_size·perturb
            decay = (-learning_rate * weight_decay * wdr * p
                     if weight_decay > 0 else 0.0)
            return decay - step_size * perturb

        out = jax.tree_util.tree_map(leaf, params, updates, m, v)
        return out, AdamPState(count, m, v)

    return optax.GradientTransformation(init, update)


class SGDPState(NamedTuple):
    momentum: chex.ArrayTree


@OPTIMIZERS.register("SGDP")
def sgdp(learning_rate, weight_decay=0.0, momentum=0.9, dampening=0.0,
         eps=1e-8, delta=0.1, wd_ratio=0.1, nesterov=False, **kw):
    def init(params):
        return SGDPState(momentum=_tree_zeros_like(params))

    def update(updates, state, params):
        buf = jax.tree_util.tree_map(
            lambda b, g: momentum * b + (1 - dampening) * g,
            state.momentum, updates)

        def leaf(p, g, b):
            d_p = g + momentum * b if nesterov else b
            wdr = 1.0
            if p.ndim > 1:
                d_p, wdr = _adamp_projection(p, g, d_p, delta, wd_ratio, eps)
            decay = (-learning_rate * weight_decay * wdr / (1 - momentum) * p
                     if weight_decay != 0 else 0.0)
            return decay - learning_rate * d_p

        out = jax.tree_util.tree_map(leaf, params, updates, buf)
        return out, SGDPState(momentum=buf)

    return optax.GradientTransformation(init, update)


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
    count: chex.Array
    prev_grad: chex.ArrayTree
    i_buf: chex.ArrayTree
    d_buf: chex.ArrayTree


@OPTIMIZERS.register("PID")
def pid(learning_rate, weight_decay=0.0, momentum=0.0, dampening=0.0,
        integral=5.0, derivative=10.0, **kw):
    """Parity: src/optimizer/PID.py — momentum defaults to 0 (plain SGD
    path, buffers skipped); on the first momentum step the D-buffer is
    zero and the stored previous gradient REMAINS zero (the first-step
    branch never writes it, PID.py:36-44), so step 2 differentiates
    against 0."""
    def init(params):
        z = _tree_zeros_like(params)
        return PIDState(jnp.zeros([], jnp.int32), z, z, z)

    def update(updates, state, params=None):
        if weight_decay and params is not None:
            updates = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, updates, params)
        if momentum == 0:
            out = jax.tree_util.tree_map(lambda g: -learning_rate * g,
                                         updates)
            return out, state
        count = state.count + 1
        first = count == 1
        i_buf = jax.tree_util.tree_map(
            lambda i, g: momentum * i + jnp.where(first, g,
                                                  (1 - dampening) * g),
            state.i_buf, updates)
        d_buf = jax.tree_util.tree_map(
            lambda d, g, pg: jnp.where(
                first, jnp.zeros_like(g),
                momentum * d + (1 - momentum) * (g - pg)),
            state.d_buf, updates, state.prev_grad)
        prev = jax.tree_util.tree_map(
            lambda g: jnp.where(first, jnp.zeros_like(g), g), updates)
        out = jax.tree_util.tree_map(
            lambda g, i, d: -learning_rate * (g + integral * i + derivative * d),
            updates, i_buf, d_buf)
        return out, PIDState(count, prev, i_buf, d_buf)

    return optax.GradientTransformation(init, update)


class AccSGDState(NamedTuple):
    buf: chex.ArrayTree


@OPTIMIZERS.register("AccSGD")
def accsgd(learning_rate, weight_decay=0.0, kappa=1000.0, xi=10.0,
           small_const=0.7, **kw):
    """Accelerated SGD (Kidambi et al. 2018).

    Parity: src/optimizer/AccSGD.py:8-39 — auxiliary iterate seeded from
    the initial parameters, coupled decay, and the exact
    large_lr/alpha/beta/zeta coupling."""
    large_lr = learning_rate * kappa / small_const
    alpha = 1.0 - (small_const * small_const * xi) / kappa
    beta = 1.0 - alpha
    zeta = small_const / (small_const + beta)

    def init(params):
        return AccSGDState(buf=params)

    def update(updates, state, params):
        if weight_decay:
            updates = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, updates, params)
        buf = jax.tree_util.tree_map(
            lambda b, g, p: beta * ((1.0 / beta - 1.0) * b
                                    - large_lr * g + p),
            state.buf, updates, params)
        new_p = jax.tree_util.tree_map(
            lambda p, g, b: zeta * (p - learning_rate * g)
            + (1.0 - zeta) * b, params, updates, buf)
        out = jax.tree_util.tree_map(lambda np_, p: np_ - p, new_p, params)
        return out, AccSGDState(buf=buf)

    return optax.GradientTransformation(init, update)


class SWATSState(NamedTuple):
    count: chex.Array
    phase_sgd: chex.Array          # bool scalar: group has switched to SGD
    lr_sgd: chex.Array             # learning rate adopted at the switch
    m: chex.ArrayTree
    v: chex.ArrayTree
    exp_avg2: chex.ArrayTree       # per-leaf scalar projection-scaling EMA
    buf: chex.ArrayTree            # SGD momentum buffers
    buf_started: chex.ArrayTree    # per-leaf bool: buffer initialized


@OPTIMIZERS.register("SWATS")
def swats(learning_rate, weight_decay=0.0, b1=0.9, b2=0.999, eps=1e-3,
          nesterov=False, **kw):
    """SWATS (Keskar & Socher 2017): Adam until the projected-step scaling
    EMA converges, then SGD at the learned rate.

    Parity: src/optimizer/SWATS.py:85-203 — including the sequential
    within-step semantics where a switch triggered by one parameter puts
    every LATER parameter (flatten order) on the SGD path in the same
    step, with its momentum buffer seeded from the current gradient.
    Data-dependent branches are ``jnp.where``; the leaf loop is a Python
    loop over the flattened tree (static), carrying the traced phase.
    """
    def init(params):
        z = _tree_zeros_like(params)
        scalars = jax.tree_util.tree_map(
            lambda p: jnp.zeros([], p.dtype), params)
        flags = jax.tree_util.tree_map(
            lambda p: jnp.zeros([], bool), params)
        return SWATSState(jnp.zeros([], jnp.int32), jnp.zeros([], bool),
                          jnp.asarray(learning_rate, jnp.float32),
                          z, z, scalars, z, flags)

    def update(updates, state, params=None):
        count = state.count + 1
        bc1 = 1 - b1 ** count
        bc2 = 1 - b2 ** count
        flat_g, treedef = jax.tree_util.tree_flatten(updates)
        flat_p = treedef.flatten_up_to(params) if params is not None else \
            [None] * len(flat_g)
        ms = treedef.flatten_up_to(state.m)
        vs = treedef.flatten_up_to(state.v)
        e2s = treedef.flatten_up_to(state.exp_avg2)
        bufs = treedef.flatten_up_to(state.buf)
        started = treedef.flatten_up_to(state.buf_started)

        phase = state.phase_sgd
        lr_sgd = state.lr_sgd
        out, nm, nv, ne2, nbuf, nstart = [], [], [], [], [], []
        for g, p, m, v, e2, bf, st in zip(flat_g, flat_p, ms, vs, e2s,
                                          bufs, started):
            if weight_decay != 0 and p is not None:
                g = g + weight_decay * p

            # --- Adam branch (also evaluates the switch criterion) ---
            m1 = b1 * m + (1 - b1) * g
            v1 = b2 * v + (1 - b2) * g * g
            denom = jnp.sqrt(v1) + eps
            step_size = learning_rate * (bc2 ** 0.5) / bc1
            adam_upd = -step_size * (m1 / denom)
            pg = jnp.vdot(adam_upd, g)
            scaling = jnp.vdot(adam_upd, adam_upd) / -jnp.where(
                pg == 0, 1.0, pg)
            e2_new = jnp.where(pg == 0, e2, b2 * e2 + (1 - b2) * scaling)
            corrected = e2_new / bc2
            trigger = ((count > 1) & (pg != 0)
                       & (jnp.abs(corrected - scaling)
                          <= 1e-8 + 1e-6 * jnp.abs(scaling))
                       & (corrected > 0))

            # --- SGD branch (momentum seeded from g on first SGD use) ---
            buf_new = jnp.where(st, b1 * bf + g, g)
            d = buf_new * (1 - b1)
            if nesterov:
                d = d + b1 * buf_new
            sgd_upd = -lr_sgd * d

            out.append(jnp.where(phase, sgd_upd, adam_upd))
            nm.append(jnp.where(phase, m, m1))
            nv.append(jnp.where(phase, v, v1))
            ne2.append(jnp.where(phase, e2, e2_new))
            nbuf.append(jnp.where(phase, buf_new, bf))
            nstart.append(st | phase)
            # a trigger while in the Adam phase flips every LATER leaf
            new_phase = phase | trigger
            lr_sgd = jnp.where(new_phase & ~phase, corrected, lr_sgd)
            phase = new_phase

        uf = lambda leaves: jax.tree_util.tree_unflatten(treedef, leaves)
        return uf(out), SWATSState(count, phase, lr_sgd, uf(nm), uf(nv),
                                   uf(ne2), uf(nbuf), uf(nstart))

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# AdaBelief / RAdam / Lamb / LARS / NovoGrad / Adafactor — exact ports of
# the reference's vendored torch classes (each deviates from the optax
# built-in; trajectory-tested in tests/test_optim_trajectory_parity.py)
# ---------------------------------------------------------------------------

class AdaBeliefState(NamedTuple):
    count: chex.Array
    m: chex.ArrayTree
    v: chex.ArrayTree


@OPTIMIZERS.register("AdaBelief")
def adabelief(learning_rate, weight_decay=0.0, b1=0.9, b2=0.999, eps=1e-8,
              weight_decouple=False, fixed_decay=False, rectify=False, **kw):
    """AdaBelief with the reference's exact semantics
    (src/optimizer/AdaBelief.py:100-220): COUPLED decay by default
    (``weight_decouple=False``), eps=1e-8, and the in-place
    ``exp_avg_var.add_(eps)`` quirk (line 184) — eps accumulates into the
    variance STATE every step, so v_t = b2*(v_{t-1}+eps) + (1-b2)*r².
    Optional decoupled decay and RAdam-style rectification as in the
    reference ctor flags (lines 54-64)."""
    def init(params):
        return AdaBeliefState(jnp.zeros([], jnp.int32),
                              _tree_zeros_like(params),
                              _tree_zeros_like(params))

    def update(updates, state, params=None):
        count = state.count + 1
        bc1 = 1 - b1 ** count
        bc2 = 1 - b2 ** count
        if not weight_decouple and weight_decay != 0 and params is not None:
            updates = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, updates, params)
        m = jax.tree_util.tree_map(lambda mo, g: b1 * mo + (1 - b1) * g,
                                   state.m, updates)
        # the +eps lands in the stored state (torch in-place add_)
        v = jax.tree_util.tree_map(
            lambda vo, g, mm: b2 * vo + (1 - b2) * (g - mm) ** 2 + eps,
            state.v, updates, m)
        if rectify:
            rho_inf = 2.0 / (1.0 - b2) - 1.0
            rho_t = rho_inf - 2 * count * b2 ** count / bc2
            rt = jnp.sqrt((rho_t - 4.0) * (rho_t - 2.0) * rho_inf
                          / (rho_inf - 4.0) / (rho_inf - 2.0)
                          / jnp.maximum(rho_t, 4.001))
            step_size = jnp.where(rho_t > 4, rt * learning_rate / bc1,
                                  jnp.asarray(learning_rate, jnp.float32))
            use_denom = rho_t > 4
        else:
            step_size = learning_rate / bc1
            use_denom = True

        def leaf(p, mm, vv):
            denom = jnp.sqrt(vv) / jnp.sqrt(bc2) + eps
            upd = jnp.where(use_denom, -step_size * mm / denom,
                            -step_size * mm) if rectify else \
                -step_size * mm / denom
            if weight_decouple:
                factor = (1.0 - weight_decay if fixed_decay
                          else 1.0 - learning_rate * weight_decay)
                upd = upd + (factor - 1.0) * p
            return upd

        out = jax.tree_util.tree_map(
            leaf, params if params is not None else _tree_zeros_like(m),
            m, v)
        return out, AdaBeliefState(count, m, v)

    return optax.GradientTransformation(init, update)


class RAdamState(NamedTuple):
    count: chex.Array
    m: chex.ArrayTree
    v: chex.ArrayTree


@OPTIMIZERS.register("RAdam")
def radam(learning_rate, weight_decay=0.0, b1=0.9, b2=0.999, eps=1e-8, **kw):
    """RAdam with the reference's semantics (src/optimizer/RAdam.py:99-194):
    DECOUPLED ``p -= wd*lr*p`` decay applied in the same step (line 183),
    eps added after sqrt with no denominator bias correction (the
    rectifier term absorbs sqrt(1-b2^t)), SGD-style unrectified branch
    while N_sma < 5."""
    def init(params):
        return RAdamState(jnp.zeros([], jnp.int32),
                          _tree_zeros_like(params), _tree_zeros_like(params))

    def update(updates, state, params=None):
        count = state.count + 1
        m = jax.tree_util.tree_map(lambda mo, g: b1 * mo + (1 - b1) * g,
                                   state.m, updates)
        v = jax.tree_util.tree_map(lambda vo, g: b2 * vo + (1 - b2) * g * g,
                                   state.v, updates)
        bc1 = 1 - b1 ** count
        beta2_t = b2 ** count
        n_sma_max = 2.0 / (1.0 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * count * beta2_t / (1.0 - beta2_t)
        rect = jnp.sqrt(jnp.maximum(
            (1 - beta2_t) * (n_sma - 4) / (n_sma_max - 4)
            * (n_sma - 2) / jnp.maximum(n_sma, 1e-12)
            * n_sma_max / (n_sma_max - 2), 0.0))
        step_adam = learning_rate * rect / bc1
        step_sgd = learning_rate / bc1
        rectified = n_sma >= 5

        def leaf(p, mm, vv):
            upd = jnp.where(rectified,
                            -step_adam * mm / (jnp.sqrt(vv) + eps),
                            -step_sgd * mm)
            if weight_decay != 0 and p is not None:
                upd = upd - weight_decay * learning_rate * p
            return upd

        out = jax.tree_util.tree_map(
            leaf, params if params is not None else _tree_zeros_like(m),
            m, v)
        return out, RAdamState(count, m, v)

    return optax.GradientTransformation(init, update)


class LambState(NamedTuple):
    count: chex.Array
    m: chex.ArrayTree
    v: chex.ArrayTree


@OPTIMIZERS.register("Lamb")
def lamb(learning_rate, weight_decay=0.0, b1=0.9, b2=0.999, eps=1e-6,
         clamp_value=10.0, adam=False, debias=False, **kw):
    """LAMB with the reference's semantics (src/optimizer/Lamb.py:82-158):
    NO debiasing by default (paper v3, line 129-134), weight decay added
    to the ADAM STEP (not the gradient, line 142), weight norm clamped to
    [0, clamp_value], trust ratio forced to 1 when either norm is 0."""
    def init(params):
        return LambState(jnp.zeros([], jnp.int32),
                         _tree_zeros_like(params), _tree_zeros_like(params))

    def update(updates, state, params):
        count = state.count + 1
        m = jax.tree_util.tree_map(lambda mo, g: b1 * mo + (1 - b1) * g,
                                   state.m, updates)
        v = jax.tree_util.tree_map(lambda vo, g: b2 * vo + (1 - b2) * g * g,
                                   state.v, updates)
        if debias:
            step_size = learning_rate * jnp.sqrt(1 - b2 ** count) \
                / (1 - b1 ** count)
        else:
            step_size = learning_rate

        def leaf(p, mm, vv):
            adam_step = mm / (jnp.sqrt(vv) + eps)
            if weight_decay != 0:
                adam_step = adam_step + weight_decay * p
            weight_norm = jnp.clip(jnp.linalg.norm(p), 0, clamp_value)
            adam_norm = jnp.linalg.norm(adam_step)
            trust = jnp.where((weight_norm == 0) | (adam_norm == 0), 1.0,
                              weight_norm / jnp.where(adam_norm == 0, 1.0,
                                                      adam_norm))
            if adam:
                trust = 1.0
            return -step_size * trust * adam_step

        out = jax.tree_util.tree_map(leaf, params, m, v)
        return out, LambState(count, m, v)

    return optax.GradientTransformation(init, update)


class LARSState(NamedTuple):
    count: chex.Array
    buf: chex.ArrayTree


@OPTIMIZERS.register("LARS")
def lars(learning_rate, weight_decay=0.0, momentum=0.0, dampening=0.0,
         nesterov=False, trust_coefficient=0.01, eps=1e-8, **kw):
    """LARS with the reference's semantics (src/optimizer/LARS.py:125-166):
    trust-ratio scaling ONLY when weight_decay != 0 (and both norms are
    nonzero, line 140-148 — otherwise the raw gradient passes through
    without decay), momentum buffer SEEDED from the first d_p (line
    152-158, no (1-dampening) on the first step)."""
    def init(params):
        return LARSState(jnp.zeros([], jnp.int32), _tree_zeros_like(params))

    def update(updates, state, params):
        count = state.count + 1
        first = state.count == 0

        def scaled(g, p):
            if weight_decay == 0:
                return g
            p_norm = jnp.linalg.norm(p)
            g_norm = jnp.linalg.norm(g)
            lars_lr = trust_coefficient * p_norm \
                / (g_norm + p_norm * weight_decay + eps)
            cond = (p_norm != 0) & (g_norm != 0)
            return jnp.where(cond, (g + weight_decay * p) * lars_lr, g)

        d_p = jax.tree_util.tree_map(scaled, updates, params)
        if momentum != 0:
            buf = jax.tree_util.tree_map(
                lambda b, d: jnp.where(first, d,
                                       momentum * b + (1 - dampening) * d),
                state.buf, d_p)
            if nesterov:
                d_p = jax.tree_util.tree_map(
                    lambda d, b: d + momentum * b, d_p, buf)
            else:
                d_p = buf
        else:
            buf = state.buf
        out = jax.tree_util.tree_map(lambda d: -learning_rate * d, d_p)
        return out, LARSState(count, buf)

    return optax.GradientTransformation(init, update)


class NovoGradState(NamedTuple):
    count: chex.Array
    m: chex.ArrayTree
    v: chex.ArrayTree              # per-leaf scalar ||g||² EMA


@OPTIMIZERS.register("NovoGrad")
def novograd(learning_rate, weight_decay=0.0, b1=0.95, b2=0.0, eps=1e-8,
             grad_averaging=False, **kw):
    """NovoGrad with the reference's semantics
    (src/optimizer/NovoGrad.py:86-161): betas default (0.95, 0), the
    per-layer scalar second moment is SEEDED from the first ||g||²
    (line 138-141), decay is added AFTER normalization (line 152-154),
    and the first moment is ``m = b1*m + g`` with no (1-b1) unless
    ``grad_averaging``."""
    def init(params):
        return NovoGradState(
            jnp.zeros([], jnp.int32), _tree_zeros_like(params),
            jax.tree_util.tree_map(lambda p: jnp.zeros([], p.dtype), params))

    def update(updates, state, params):
        count = state.count + 1

        def leaf(g, p, mm, vv):
            norm = jnp.sum(g * g)
            v_new = jnp.where(vv == 0, norm, b2 * vv + (1 - b2) * norm)
            g = g / (jnp.sqrt(v_new) + eps)
            if weight_decay != 0:
                g = g + weight_decay * p
            if grad_averaging:
                g = g * (1 - b1)
            m_new = b1 * mm + g
            return -learning_rate * m_new, m_new, v_new

        flat_g, treedef = jax.tree_util.tree_flatten(updates)
        flat_p = treedef.flatten_up_to(params)
        ms = treedef.flatten_up_to(state.m)
        vs = treedef.flatten_up_to(state.v)
        out, nm, nv = [], [], []
        for g, p, mm, vv in zip(flat_g, flat_p, ms, vs):
            o, m2, v2 = leaf(g, p, mm, vv)
            out.append(o)
            nm.append(m2)
            nv.append(v2)
        uf = lambda ls: jax.tree_util.tree_unflatten(treedef, ls)
        return uf(out), NovoGradState(count, uf(nm), uf(nv))

    return optax.GradientTransformation(init, update)


class AdafactorState(NamedTuple):
    count: chex.Array
    m: chex.ArrayTree              # first moment (zeros when beta1 None)
    vr: chex.ArrayTree             # factored row EMA (or full v when 1-D)
    vc: chex.ArrayTree             # factored col EMA (or dummy when 1-D)


@OPTIMIZERS.register("Adafactor")
def adafactor(learning_rate, weight_decay=0.0, eps2=(1e-30, 1e-3),
              clip_threshold=1.0, decay_rate=-0.8, beta1=None,
              scale_parameter=True, relative_step=True, warmup_init=False,
              **kw):
    """Adafactor with the reference's fairseq semantics
    (src/optimizer/Adafactor.py:85-218): with ``relative_step`` (default)
    the passed lr is IGNORED — rate = min(1e-2, 1/sqrt(t)) scaled by
    max(eps2[1], RMS(p)); every ndim>=2 leaf is factored (no
    min-dim threshold, unlike optax); update clipped by RMS/threshold;
    decoupled ``wd*lr_t`` decay (line 213-214)."""
    def init(params):
        def rows(p):
            return (jnp.zeros(p.shape[:-1], p.dtype) if p.ndim >= 2
                    else jnp.zeros_like(p))

        def cols(p):
            return (jnp.zeros(p.shape[:-2] + p.shape[-1:], p.dtype)
                    if p.ndim >= 2 else jnp.zeros([], p.dtype))

        return AdafactorState(
            jnp.zeros([], jnp.int32),
            _tree_zeros_like(params) if beta1 is not None else
            jax.tree_util.tree_map(lambda p: jnp.zeros([], p.dtype), params),
            jax.tree_util.tree_map(rows, params),
            jax.tree_util.tree_map(cols, params))

    def update(updates, state, params):
        count = state.count + 1
        tf = count.astype(jnp.float32)
        if relative_step:
            min_step = 1e-6 * tf if warmup_init else 1e-2
            rel_step = jnp.minimum(min_step, 1.0 / jnp.sqrt(tf))
        else:
            rel_step = learning_rate
        beta2t = 1.0 - tf ** decay_rate

        def rms(x):
            return jnp.linalg.norm(x) / (x.size ** 0.5)

        def leaf(g, p, mm, vr, vc):
            lr_t = rel_step * (jnp.maximum(eps2[1], rms(p))
                               if scale_parameter else 1.0)
            upd = g * g + eps2[0]
            if g.ndim >= 2:
                vr_new = beta2t * vr + (1 - beta2t) * jnp.mean(upd, axis=-1)
                vc_new = beta2t * vc + (1 - beta2t) * jnp.mean(upd, axis=-2)
                r_factor = jax.lax.rsqrt(
                    vr_new / jnp.mean(vr_new, axis=-1, keepdims=True)
                )[..., None]
                c_factor = jax.lax.rsqrt(vc_new)[..., None, :]
                upd = r_factor * c_factor * g
            else:
                vr_new = beta2t * vr + (1 - beta2t) * upd
                vc_new = vc
                upd = jax.lax.rsqrt(vr_new) * g
            upd = upd / jnp.maximum(1.0, rms(upd) / clip_threshold)
            upd = upd * lr_t
            if beta1 is not None:
                m_new = beta1 * mm + (1 - beta1) * upd
                upd = m_new
            else:
                m_new = mm
            out = -upd
            if weight_decay != 0:
                out = out - weight_decay * lr_t * p
            return out, m_new, vr_new, vc_new

        flat_g, treedef = jax.tree_util.tree_flatten(updates)
        flat_p = treedef.flatten_up_to(params)
        ms = treedef.flatten_up_to(state.m)
        vrs = treedef.flatten_up_to(state.vr)
        vcs = treedef.flatten_up_to(state.vc)
        out, nm, nvr, nvc = [], [], [], []
        for g, p, mm, vr, vc in zip(flat_g, flat_p, ms, vrs, vcs):
            o, m2, r2, c2 = leaf(g, p, mm, vr, vc)
            out.append(o)
            nm.append(m2)
            nvr.append(r2)
            nvc.append(c2)
        uf = lambda ls: jax.tree_util.tree_unflatten(treedef, ls)
        return uf(out), AdafactorState(count, uf(nm), uf(nvr), uf(nvc))

    return optax.GradientTransformation(init, update)
