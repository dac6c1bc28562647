"""Second-order / quasi-Newton optimizers: Adahessian, Shampoo, Apollo,
A2GradUni.

Parity targets (SURVEY.md §2.6): the reference vendors self-contained
torch implementations of these (src/optimizer/*.py). Here:

* ``Adahessian`` — Adam over a Hutchinson estimate of the Hessian
  diagonal, exact port of the reference semantics
  (src/optimizer/Adahessian.py:156-203): m/v moments over (grad,
  trace²), denominator ``v^(k/2) / bc2^(k/2) + eps`` with
  hessian_power k (default 0.5) and eps default 1e-4, and COUPLED
  weight decay inside the lr multiplier (``lr*(m/bc1/denom + wd*p)``,
  line 200-203 — wd never enters the moments). The diagonal needs a
  Hessian-vector product, which a plain ``GradientTransformation``
  cannot compute (it only sees gradients), so it ships as
  (a) ``adahessian_trace`` — the reference's |Hz| estimator with its
  spatial block-averaging for rank-4 kernels (get_trace,
  Adahessian.py:81-130) — and (b) the registered factory, which takes
  the estimate through ``update(..., hessian=...)`` and falls back to
  |grad| when none is supplied so the standard training loop still
  works (documented divergence; use ``make_adahessian_loss_update``
  for the true second-order path). ``hutchinson_hessian_diag`` is the
  textbook unbiased z⊙Hz estimator, kept for general use.
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

__all__ = ["hutchinson_hessian_diag", "adahessian_trace",
           "make_adahessian_loss_update"]


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


def adahessian_trace(grad_fn: Callable, params, z):
    """The reference's Hutchinson trace estimator (Adahessian.py:81-130):
    per-leaf |Hz| (the reference notes |hv·z| == |hv| for Rademacher z),
    with the rank-4 Hessian-diagonal BLOCK average over the kernel's
    spatial axes (torch OIHW dims [2,3], keepdim — here the flax HWIO
    spatial axes [0,1]). ``z`` is the ±1 probe tree, injectable for
    draw-exact parity testing.

    Asserted-broken-upstream divergence: the reference leaves
    ``tmp_output`` unbound for every rank other than {0,1,2,4} and dies
    with UnboundLocalError on rank-3 conv1d kernels
    (tests/test_optim_trajectory_parity.py pins this); we apply plain
    |Hz| to those ranks so Conv-1d speaker models can actually train.
    """
    _, hz = jax.jvp(grad_fn, (params,), (z,))

    def leaf_trace(hv):
        a = jnp.abs(hv)
        if a.ndim == 4:     # conv kernel: average the spatial block
            return jnp.mean(a, axis=(0, 1), keepdims=True)
        return a

    return jax.tree_util.tree_map(leaf_trace, hz)


class AdahessianState(NamedTuple):
    count: chex.Array
    m: chex.ArrayTree
    v: chex.ArrayTree


@OPTIMIZERS.register("Adahessian")
def adahessian(learning_rate, weight_decay=0.0, b1=0.9, b2=0.999,
               eps=1e-4, hessian_power=0.5, **kw):
    """Reference-exact update rule (src/optimizer/Adahessian.py:156-203;
    defaults eps=1e-4, hessian_power=0.5 from lines 49-51). Trajectory
    parity with injected Rademacher draws is pinned in
    tests/test_optim_trajectory_parity.py."""
    def init(params):
        return AdahessianState(jnp.zeros([], jnp.int32),
                               _zeros_like(params), _zeros_like(params))

    def update(updates, state, params=None, *, hessian=None):
        # fall back to |g| as the curvature estimate when no hvp provided
        hess = hessian if hessian is not None else jax.tree_util.tree_map(
            jnp.abs, updates)
        count = state.count + 1
        m = jax.tree_util.tree_map(lambda mo, g: b1 * mo + (1 - b1) * g,
                                   state.m, updates)
        v = jax.tree_util.tree_map(lambda vo, h: b2 * vo + (1 - b2) * h * h,
                                   state.v, hess)
        bc1 = 1 - b1 ** count
        bc2 = 1 - b2 ** count
        k = hessian_power
        # denom = sqrt(v)^k / sqrt(bc2)^k + eps  (Adahessian.py:193-197);
        # wd is coupled INSIDE the lr multiplier and never enters the
        # moments (lines 200-203)
        if params is None:
            ps = jax.tree_util.tree_map(jnp.zeros_like, m)
        else:
            ps = params
        out = jax.tree_util.tree_map(
            lambda mm, vv, p: -learning_rate * (
                (mm / bc1) / (jnp.power(jnp.sqrt(vv), k)
                              / jnp.power(jnp.sqrt(bc2), k) + eps)
                + weight_decay * p), m, v, ps)
        return out, AdahessianState(count, m, v)

    return optax.GradientTransformationExtraArgs(init, update)


def make_adahessian_loss_update(loss_fn: Callable, tx, n_probes: int = 1):
    """True second-order step: grads + reference-semantics Hutchinson
    trace → tx.update.

    ``loss_fn(params) -> scalar``; returns
    ``step(params, opt_state, rng) -> (params, opt_state, loss)``. The
    reference uses a single probe per step (get_trace draws one z);
    ``n_probes > 1`` averages the |Hz| traces for lower variance.
    """
    grad_fn = jax.grad(loss_fn)

    def one_trace(params, key):
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(key, len(leaves))
        z = jax.tree_util.tree_unflatten(treedef, [
            jax.random.rademacher(kk, l.shape, dtype=l.dtype)
            for kk, l in zip(keys, leaves)])
        return adahessian_trace(grad_fn, params, z)

    def step(params, opt_state, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        hess = one_trace(params, rng)
        for i in range(1, n_probes):
            hess = jax.tree_util.tree_map(
                jnp.add, hess, one_trace(params, jax.random.fold_in(rng, i)))
        if n_probes > 1:
            hess = jax.tree_util.tree_map(lambda a: a / n_probes, hess)
        updates, opt_state = tx.update(grads, opt_state, params, hessian=hess)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


# ---------------------------------------------------------------------------
# Shampoo
# ---------------------------------------------------------------------------

class ShampooState(NamedTuple):
    count: chex.Array
    buf: chex.ArrayTree            # momentum buffers (preconditioned grads)
    preconds: chex.ArrayTree       # per-leaf tuple: one dim×dim mat per axis
    inv_preconds: chex.ArrayTree   # cached inverse roots (update_freq > 1)


def _inv_pth_root(mat: jax.Array, p: float) -> jax.Array:
    """mat^(−1/p) via SVD, mirroring the reference route (Shampoo.py:7-12:
    ``u @ s.pow(power).diag() @ v.t()``). mat is symmetric PD by ε·I
    seeding; SVD rather than eigh because the inverse amplifies the
    ~1/ε eigenvalues of unexplored directions and the SVD route tracks
    the reference's float32 trajectory much more closely."""
    u, s, vt = jnp.linalg.svd(mat)
    return (u * jnp.power(jnp.maximum(s, 1e-30), -1.0 / p)) @ vt


@OPTIMIZERS.register("Shampoo")
def shampoo(learning_rate, weight_decay=0.0, momentum=0.0, epsilon=1e-4,
            update_freq=1, **kw):
    """Shampoo, exact port of the reference semantics
    (src/optimizer/Shampoo.py:76-147): full-matrix preconditioner per
    AXIS of every parameter (any rank) with matrix power −1/order,
    sequential per-axis application (each axis preconditions the output
    of the previous), preconditioners seeded at ε·I, momentum buffer
    seeded from the first gradient and storing the PRECONDITIONED
    gradient, coupled weight decay after momentum."""

    def axis_mats(p):
        return tuple(jnp.asarray(epsilon) * jnp.eye(d, dtype=p.dtype)
                     for d in p.shape)

    def init(params):
        tup = lambda fn: jax.tree_util.tree_map(fn, params)
        return ShampooState(
            jnp.zeros([], jnp.int32), _zeros_like(params),
            tup(axis_mats),
            tup(lambda p: tuple(jnp.zeros((d, d), p.dtype)
                                for d in p.shape)))

    def update(updates, state, params=None):
        first = state.count == 0

        def leaf(g, p, bf, pre, inv):
            order = g.ndim
            if momentum > 0:
                bf_in = jnp.where(first, g, bf)
                g = (1 - momentum) * g + momentum * bf_in
            if weight_decay > 0 and p is not None:
                g = g + weight_decay * p
            new_pre, new_inv = [], []
            original_shape = g.shape
            for dim_id in range(order):
                dim = g.shape[0] if dim_id == 0 else None
                # transpose axis dim_id to the front, matricize
                perm = list(range(order))
                perm[0], perm[dim_id] = perm[dim_id], perm[0]
                g = jnp.transpose(g, perm)
                transposed_shape = g.shape
                dim = g.shape[0]
                gm = g.reshape(dim, -1)
                pre_d = pre[dim_id] + gm @ gm.T
                if update_freq == 1:
                    inv_d = _inv_pth_root(pre_d, float(order))
                else:
                    # lax.cond, not jnp.where: where would evaluate the
                    # O(d^3) root EVERY step, making update_freq's whole
                    # purpose (amortizing the SVD) a no-op under jit
                    inv_d = jax.lax.cond(
                        state.count % update_freq == 0,
                        lambda op: _inv_pth_root(op[0], float(order)),
                        lambda op: op[1],
                        (pre_d, inv[dim_id]))
                if dim_id == order - 1:
                    gm = gm.T @ inv_d
                    g = gm.reshape(original_shape)
                else:
                    gm = inv_d @ gm
                    g = gm.reshape(transposed_shape)
                new_pre.append(pre_d)
                new_inv.append(inv_d)
            return -learning_rate * g, g, tuple(new_pre), tuple(new_inv)

        is_tup = lambda x: isinstance(x, tuple)
        flat_g, treedef = jax.tree_util.tree_flatten(updates)
        flat_p = (treedef.flatten_up_to(params) if params is not None
                  else [None] * len(flat_g))
        bufs = treedef.flatten_up_to(state.buf)
        pres = treedef.flatten_up_to(state.preconds)
        invs = treedef.flatten_up_to(state.inv_preconds)
        out, nbuf, npre, ninv = [], [], [], []
        for g, p, bf, pre, inv in zip(flat_g, flat_p, bufs, pres, invs):
            o, b2, p2, i2 = leaf(g, p, bf, pre, inv)
            out.append(o)
            nbuf.append(b2)
            npre.append(p2)
            ninv.append(i2)
        uf = lambda ls: jax.tree_util.tree_unflatten(treedef, ls)
        return uf(out), ShampooState(state.count + 1, uf(nbuf),
                                     uf(npre), uf(ninv))

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
           warmup=0, init_lr=0.01, **kw):
    """Apollo (Ma 2020), exact port of the reference semantics
    (src/optimizer/Apollo.py:76-158): 4-norm-plus-eps normalization of
    the previous direction (``norm + eps``, not max), curvature rebound
    ``clamp(|B|, min=1)`` (line 153), warmup interpolation on the
    PRE-increment step with warmup=0 default, coupled weight decay."""
    def init(params):
        z = _zeros_like(params)
        return ApolloState(jnp.zeros([], jnp.int32), z, z, z)

    def update(updates, state, params=None):
        if weight_decay and params is not None:
            updates = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, updates, params)
        # warmup check uses the step BEFORE increment (Apollo.py:110-115)
        if warmup > 0:
            kf = state.count.astype(jnp.float32)
            lr_t = jnp.where(state.count < warmup,
                             (learning_rate - init_lr) * kf / warmup + init_lr,
                             jnp.asarray(learning_rate, jnp.float32))
        else:
            lr_t = learning_rate
        count = state.count + 1
        alpha = (1 - beta) / (1 - beta ** count)

        def per_leaf(g, m, B, d):
            delta_grad = g - m
            m_new = m + alpha * delta_grad
            # normalized previous direction (norm + eps, Apollo.py:141)
            denom = jnp.sum(d ** 4) ** 0.25 + eps
            d_p = d / denom
            v_sq = d_p * d_p
            # scalar quasi-Newton curvature update
            delta = (-alpha * jnp.sum((delta_grad / denom) * d_p)
                     - jnp.sum(B * v_sq))
            B_new = B + v_sq * delta
            D = jnp.maximum(jnp.abs(B_new), 1.0)
            d_new = m_new / D
            return m_new, B_new, d_new

        flat, treedef = jax.tree_util.tree_flatten(updates)
        ms = treedef.flatten_up_to(state.m)
        Bs = treedef.flatten_up_to(state.B)
        ds = treedef.flatten_up_to(state.d)
        new_m, new_B, new_d, out = [], [], [], []
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
    v: chex.ArrayTree              # per-leaf SCALAR cumulative deviation²
    x: chex.ArrayTree              # auxiliary iterate x_k


@OPTIMIZERS.register("A2GradUni")
def a2grad_uni(learning_rate, weight_decay=0.0, beta=10.0, lips=10.0, **kw):
    """A2Grad, uniform variant — exact port of the reference semantics
    (src/optimizer/A2GradUni.py:58-108): ``lr`` is UNUSED (the rate comes
    from gamma_k/h_k), v_k is a per-parameter scalar CUMULATIVE sum of
    squared deviations from the running-mean gradient, the auxiliary
    iterate x_k is seeded from the initial parameters, and the update
    mixes p, x_{k+1} and the gradient with the PREVIOUS alpha_k."""

    def init(params):
        return A2GradState(
            jnp.zeros([], jnp.int32), _zeros_like(params),
            jax.tree_util.tree_map(lambda p: jnp.zeros([], p.dtype), params),
            params)

    def update(updates, state, params):
        k = state.count
        kf = k.astype(jnp.float32)
        gamma_k = 2.0 * lips / (kf + 1.0)
        alpha_prev = jnp.where(k == 0, 1.0, 2.0 / (kf + 2.0))
        alpha_next = 2.0 / (kf + 3.0)

        def leaf(g, p, avg, v, x):
            avg_new = (avg * kf + g) / (kf + 1.0)
            delta = g - avg_new
            v_new = v + jnp.sum(delta * delta)
            h_k = jnp.sqrt(v_new)
            coef = 1.0 / (gamma_k + beta * h_k)
            x_new = x - coef * g
            p_new = ((1 - alpha_next) * p + alpha_next * x_new
                     - (1 - alpha_next) * alpha_prev * coef * g)
            return p_new - p, avg_new, v_new, x_new

        flat_g, treedef = jax.tree_util.tree_flatten(updates)
        flat_p = treedef.flatten_up_to(params)
        avgs = treedef.flatten_up_to(state.avg_grad)
        vs = treedef.flatten_up_to(state.v)
        xs = treedef.flatten_up_to(state.x)
        out, na, nv, nx = [], [], [], []
        for g, p, a, v, x in zip(flat_g, flat_p, avgs, vs, xs):
            o, a2, v2, x2 = leaf(g, p, a, v, x)
            out.append(o)
            na.append(a2)
            nv.append(v2)
            nx.append(x2)
        uf = lambda ls: jax.tree_util.tree_unflatten(treedef, ls)
        return uf(out), A2GradState(k + 1, uf(na), uf(nv), uf(nx))

    return optax.GradientTransformation(init, update)
