"""Second-order / quasi-Newton optimizers: Adahessian, Shampoo, Apollo,
A2GradUni.

Parity targets (SURVEY.md §2.6): the reference vendors self-contained
torch implementations of these (src/optimizer/*.py). Here:

* ``Adahessian`` — Adam over a Hutchinson estimate of the Hessian
  diagonal. The diagonal needs a Hessian-vector product, which a plain
  ``GradientTransformation`` cannot compute (it only sees gradients), so
  it ships as (a) ``hutchinson_hessian_diag`` — forward-over-reverse
  hvp with Rademacher probes — and (b) ``scale_by_adahessian`` which
  takes the estimate through ``update(..., hessian=...)``. The
  registered factory falls back to |grad| when no hessian is supplied
  so the standard training loop still works (documented divergence;
  use ``make_adahessian_loss_update`` for the true second-order path).
* ``Shampoo``  — full-matrix Kronecker preconditioning for ≤2-D params
  (inverse 4th root via eigendecomposition, ε-regularized), diagonal
  AdaGrad fallback for higher ranks.
* ``Apollo``   — diagonal quasi-Newton with rectified absolute-Hessian
  (Ma 2020).
* ``A2GradUni``— adaptive accelerated gradient, uniform averaging
  variant (Joulani et al. 2019).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax

from speakerverification_tpu.registry import OPTIMIZERS

__all__ = ["hutchinson_hessian_diag", "make_adahessian_loss_update"]


def _zeros_like(params):
    return jax.tree_util.tree_map(jnp.zeros_like, params)


# ---------------------------------------------------------------------------
# Adahessian
# ---------------------------------------------------------------------------

def hutchinson_hessian_diag(grad_fn: Callable, params, rng: jax.Array,
                            n_probes: int = 1):
    """E[z ⊙ (H z)] with Rademacher z; hvp = jvp of grad_fn (fwd-over-rev)."""
    leaves, treedef = jax.tree_util.tree_flatten(params)

    def one_probe(key):
        keys = jax.random.split(key, len(leaves))
        z = jax.tree_util.tree_unflatten(treedef, [
            jax.random.rademacher(k, l.shape, dtype=l.dtype)
            for k, l in zip(keys, leaves)])
        _, hz = jax.jvp(grad_fn, (params,), (z,))
        return jax.tree_util.tree_map(lambda a, b: a * b, z, hz)

    acc = one_probe(rng)
    for i in range(1, n_probes):
        probe = one_probe(jax.random.fold_in(rng, i))
        acc = jax.tree_util.tree_map(jnp.add, acc, probe)
    return jax.tree_util.tree_map(lambda a: a / n_probes, acc)


class AdahessianState(NamedTuple):
    count: chex.Array
    m: chex.ArrayTree
    v: chex.ArrayTree


@OPTIMIZERS.register("Adahessian")
def adahessian(learning_rate, weight_decay=0.0, b1=0.9, b2=0.999,
               eps=1e-8, hessian_power=1.0, **kw):
    def init(params):
        return AdahessianState(jnp.zeros([], jnp.int32),
                               _zeros_like(params), _zeros_like(params))

    def update(updates, state, params=None, *, hessian=None):
        if weight_decay and params is not None:
            updates = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, updates, params)
        # fall back to |g| as the curvature estimate when no hvp provided
        hess = hessian if hessian is not None else jax.tree_util.tree_map(
            jnp.abs, updates)
        count = state.count + 1
        m = jax.tree_util.tree_map(lambda mo, g: b1 * mo + (1 - b1) * g,
                                   state.m, updates)
        v = jax.tree_util.tree_map(lambda vo, h: b2 * vo + (1 - b2) * h * h,
                                   state.v, hess)
        mc = 1 - b1 ** count
        vc = 1 - b2 ** count
        out = jax.tree_util.tree_map(
            lambda mm, vv: -learning_rate * (mm / mc)
            / (jnp.power(vv / vc, hessian_power / 2) + eps), m, v)
        return out, AdahessianState(count, m, v)

    return optax.GradientTransformationExtraArgs(init, update)


def make_adahessian_loss_update(loss_fn: Callable, tx, n_probes: int = 1):
    """True second-order step: grads + Hutchinson diag → tx.update.

    ``loss_fn(params) -> scalar``; returns
    ``step(params, opt_state, rng) -> (params, opt_state, loss)``.
    """
    grad_fn = jax.grad(loss_fn)

    def step(params, opt_state, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        hess = hutchinson_hessian_diag(grad_fn, params, rng, n_probes)
        updates, opt_state = tx.update(grads, opt_state, params, hessian=hess)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


# ---------------------------------------------------------------------------
# Shampoo
# ---------------------------------------------------------------------------

class ShampooState(NamedTuple):
    count: chex.Array
    stats: chex.ArrayTree          # per-leaf tuple of preconditioner stats


def _inv_pth_root(mat: jax.Array, p: float, eps: float = 1e-6) -> jax.Array:
    w, v = jnp.linalg.eigh(mat + eps * jnp.eye(mat.shape[0], dtype=mat.dtype))
    w = jnp.maximum(w, eps)
    return (v * jnp.power(w, -1.0 / p)) @ v.T


@OPTIMIZERS.register("Shampoo")
def shampoo(learning_rate, weight_decay=0.0, eps=1e-4, momentum=0.9, **kw):
    """Kronecker-factored full-matrix preconditioning for 1-D/2-D params;
    diagonal AdaGrad for higher ranks (keeps memory bounded)."""

    def init(params):
        def leaf_stats(p):
            if p.ndim == 1:
                return (jnp.zeros((p.shape[0], p.shape[0]), p.dtype),)
            if p.ndim == 2 and max(p.shape) <= 2048:
                return (jnp.zeros((p.shape[0], p.shape[0]), p.dtype),
                        jnp.zeros((p.shape[1], p.shape[1]), p.dtype))
            return (jnp.zeros_like(p),)
        return ShampooState(jnp.zeros([], jnp.int32),
                            jax.tree_util.tree_map(
                                leaf_stats, params,
                                is_leaf=lambda x: isinstance(x, jnp.ndarray)))

    def update(updates, state, params=None):
        if weight_decay and params is not None:
            updates = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, updates, params)

        def precondition(g, stats):
            if g.ndim == 1 and len(stats) == 1 and stats[0].ndim == 2:
                l = stats[0] + jnp.outer(g, g)
                return _inv_pth_root(l, 2.0) @ g, (l,)
            if g.ndim == 2 and len(stats) == 2:
                l = stats[0] + g @ g.T
                r = stats[1] + g.T @ g
                pre = _inv_pth_root(l, 4.0) @ g @ _inv_pth_root(r, 4.0)
                return pre, (l, r)
            s = stats[0] + g * g
            return g / (jnp.sqrt(s) + eps), (s,)

        flat_u, treedef = jax.tree_util.tree_flatten(updates)
        flat_s = treedef.flatten_up_to(state.stats)
        out, new_stats = [], []
        for g, st in zip(flat_u, flat_s):
            pg, ns = precondition(g, st)
            out.append(-learning_rate * pg)
            new_stats.append(ns)
        return (jax.tree_util.tree_unflatten(treedef, out),
                ShampooState(state.count + 1,
                             jax.tree_util.tree_unflatten(treedef, new_stats)))

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# Apollo
# ---------------------------------------------------------------------------

class ApolloState(NamedTuple):
    count: chex.Array
    m: chex.ArrayTree          # gradient EMA
    B: chex.ArrayTree          # diagonal Hessian approximation
    d: chex.ArrayTree          # previous update direction


@OPTIMIZERS.register("Apollo")
def apollo(learning_rate, weight_decay=0.0, beta=0.9, eps=1e-4,
           rebound=0.01, warmup=10, init_lr=0.01, **kw):
    def init(params):
        z = _zeros_like(params)
        return ApolloState(jnp.zeros([], jnp.int32), z, z, z)

    def update(updates, state, params=None):
        if weight_decay and params is not None:
            updates = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, updates, params)
        count = state.count + 1
        alpha = (1 - beta) / (1 - beta ** count)

        def per_leaf(g, m, B, d):
            # corrected-rate gradient EMA and its change
            delta_grad = g - m
            m_new = m + alpha * delta_grad
            # normalized previous direction
            denom = jnp.maximum(jnp.sum(d ** 4) ** 0.25, eps)
            d_p = d / denom
            v_sq = d_p * d_p
            # scalar quasi-Newton curvature update
            delta = (-alpha * jnp.sum((delta_grad / denom) * d_p)
                     - jnp.sum(B * v_sq))
            B_new = B + v_sq * delta
            D = jnp.maximum(jnp.abs(B_new), rebound)
            d_new = m_new / D
            return m_new, B_new, d_new

        flat, treedef = jax.tree_util.tree_flatten(updates)
        ms = treedef.flatten_up_to(state.m)
        Bs = treedef.flatten_up_to(state.B)
        ds = treedef.flatten_up_to(state.d)
        new_m, new_B, new_d, out = [], [], [], []
        # lr warmup (Apollo is unstable at full lr from step 1)
        lr_t = jnp.where(count <= warmup,
                         init_lr + (learning_rate - init_lr)
                         * count / max(warmup, 1),
                         learning_rate)
        for g, m, B, d in zip(flat, ms, Bs, ds):
            m2, B2, d2 = per_leaf(g, m, B, d)
            new_m.append(m2)
            new_B.append(B2)
            new_d.append(d2)
            out.append(-lr_t * d2)
        uf = lambda leaves: jax.tree_util.tree_unflatten(treedef, leaves)
        return uf(out), ApolloState(count, uf(new_m), uf(new_B), uf(new_d))

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# A2GradUni
# ---------------------------------------------------------------------------

class A2GradState(NamedTuple):
    count: chex.Array
    avg_grad: chex.ArrayTree
    v: chex.ArrayTree


@OPTIMIZERS.register("A2GradUni")
def a2grad_uni(learning_rate, weight_decay=0.0, beta=10.0, lips=10.0, **kw):
    """A2Grad with uniform moving average of squared gradient deviation."""

    def init(params):
        return A2GradState(jnp.zeros([], jnp.int32), _zeros_like(params),
                           _zeros_like(params))

    def update(updates, state, params=None):
        if weight_decay and params is not None:
            updates = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, updates, params)
        k = state.count
        kf = k.astype(jnp.float32)
        gamma = 2.0 / (kf + 2.0)
        avg = jax.tree_util.tree_map(
            lambda a, g: (1 - gamma) * a + gamma * g, state.avg_grad, updates)
        delta2 = jax.tree_util.tree_map(
            lambda g, a: (g - a) ** 2, updates, avg)
        # uniform averaging of squared deviations
        v = jax.tree_util.tree_map(
            lambda vo, d: (vo * kf + d) / (kf + 1.0), state.v, delta2)
        out = jax.tree_util.tree_map(
            lambda g, vv: -learning_rate * g
            / (lips / (kf + 1.0) + beta * jnp.sqrt((kf + 1.0) * vv) + 1e-12),
            updates, v)
        return out, A2GradState(k + 1, avg, v)

    return optax.GradientTransformation(init, update)
