"""Optimizer zoo (optax-based).

Parity with the reference's optimizer plugin protocol
(src/model.py:178-183: ``Optimizer(params, weight_decay=..., lr_decay=...,
**config)``) and its 28-file zoo (SURVEY.md §2.6). Each entry here is a
factory ``fn(learning_rate, weight_decay=..., **kw) ->
optax.GradientTransformation`` registered under the reference's YAML name
(``optimizer.name``). ``build_optimizer`` wraps the factory in
``optax.inject_hyperparams`` so the learning rate lives in the optimizer
state and can be driven per-step by host-side schedules (including
reduce-on-plateau, which torch mutates imperatively).

Torch-style *coupled* L2 weight decay (decay added to the gradient before
the moment updates, as ``torch.optim.Adam(weight_decay=...)`` does) is
used where the reference optimizer couples it; decoupled decay where the
reference decouples (AdaBelief ``weight_decouple``, SGDW, AdamW-style).
"""

from __future__ import annotations

import inspect
from typing import Any, NamedTuple

import optax

from speakerverification_tpu.optim import custom  # noqa: F401  (registers)
from speakerverification_tpu.optim import second_order  # noqa: F401  (registers)
from speakerverification_tpu.optim.schedulers import (  # noqa: F401
    EarlyStopping,
    ReduceOnPlateau,
    build_scheduler,
)
from speakerverification_tpu.registry import OPTIMIZERS

__all__ = ["build_optimizer", "OPTIMIZERS", "build_scheduler",
           "ReduceOnPlateau", "EarlyStopping", "track_ema",
           "get_ema_params"]


class EmaState(NamedTuple):
    """EMA of the post-update parameters (``track_ema``)."""
    ema: Any


def track_ema(decay: float) -> optax.GradientTransformation:
    """Track an exponential moving average of the POST-update params.

    Chain this LAST: at that point ``updates`` are the final deltas
    ``optax.apply_updates`` will add, so ``params + updates`` is the new
    point the EMA should absorb. Riding in ``opt_state`` means the EMA
    is checkpointed, resumed, sharded, and donated with everything else
    for free; ``get_ema_params`` extracts it (serving: ``use_ema``).
    No reference equivalent — standard production trick (Polyak/SWA
    family) the retention policy can't express.
    """
    import jax
    import jax.numpy as jnp

    def init(params):
        # real copies, not aliases: a donating step (donate_argnums=(0,))
        # would otherwise hand XLA the same buffer as both params and
        # ema ("Attempt to donate the same buffer twice")
        return EmaState(ema=jax.tree_util.tree_map(
            lambda p: jnp.array(p, copy=True) if hasattr(p, "dtype") else p,
            params))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("track_ema requires params in tx.update")
        new_p = optax.apply_updates(params, updates)
        # issubdtype, NOT dtype.kind == "f": ml_dtypes' bfloat16 has
        # kind 'V' and would silently skip averaging on bf16 masters
        ema = jax.tree_util.tree_map(
            lambda e, p: e * decay + p * (1.0 - decay)
            if hasattr(p, "dtype")
            and jnp.issubdtype(p.dtype, jnp.floating) else p,
            state.ema, new_p)
        return updates, EmaState(ema=ema)

    return optax.GradientTransformation(init, update)


def get_ema_params(opt_state):
    """Pull the EMA param tree out of an optimizer state, or None."""
    if isinstance(opt_state, EmaState):
        return opt_state.ema
    if isinstance(opt_state, tuple):
        for el in opt_state:
            found = get_ema_params(el)
            if found is not None:
                return found
    inner = getattr(opt_state, "inner_state", None)
    if inner is not None:
        return get_ema_params(inner)
    return None


def _l2(weight_decay: float) -> optax.GradientTransformation:
    """Coupled (torch-style) L2: grad += wd * param, before moments."""
    if weight_decay:
        return optax.add_decayed_weights(weight_decay)
    return optax.identity()


@OPTIMIZERS.register("adam", aliases=("Adam",))
def adam(learning_rate, weight_decay=0.0, b1=0.9, b2=0.999, eps=1e-8, **kw):
    return optax.chain(_l2(weight_decay), optax.scale_by_adam(b1, b2, eps),
                       optax.scale(-learning_rate))


@OPTIMIZERS.register("sgd", aliases=("SGD",))
def sgd(learning_rate, weight_decay=0.0, momentum=0.0, nesterov=False, **kw):
    return optax.chain(
        _l2(weight_decay),
        optax.trace(decay=momentum, nesterov=nesterov) if momentum
        else optax.identity(),
        optax.scale(-learning_rate))


# AdaBelief / RAdam / Lamb / LARS / NovoGrad / Adafactor live in
# optim/custom.py as exact ports of the reference's vendored semantics
# (the optax built-ins diverge in decay coupling, debiasing, or state
# seeding; see tests/test_optim_trajectory_parity.py).


@OPTIMIZERS.register("Yogi")
def yogi(learning_rate, weight_decay=0.0, b1=0.9, b2=0.999, eps=1e-3, **kw):
    return optax.chain(_l2(weight_decay), optax.scale_by_yogi(b1, b2, eps),
                       optax.scale(-learning_rate))


class LookaheadState(NamedTuple):
    inner: Any
    slow: Any
    counter: Any          # int32 scalar, cycles mod k
    has_slow: Any         # bool scalar: slow initialized yet?


def _lookahead(inner: optax.GradientTransformation, k: int,
               alpha: float) -> optax.GradientTransformation:
    """Self-contained Lookahead (reference: src/optimizer/Lookahead.py).

    Unlike ``optax.lookahead`` (which demands a fast/slow
    ``LookaheadParams`` pair threaded through the whole training loop),
    the slow weights live in THIS transformation's state, so the zoo's
    standard ``update(grads, state, params)`` contract holds. Reference
    quirks reproduced exactly: the sync runs when the counter is 0 —
    including the very FIRST step, where it initializes the slow params
    from the post-inner-step fast params (a no-op interpolation) — and
    the interpolation is ``alpha*fast + (1-alpha)*slow`` with the slow
    side overwritten by the result (Lookahead.py:58-80).
    """
    import jax
    import jax.numpy as jnp

    def init(params):
        return LookaheadState(
            inner=inner.init(params),
            slow=jax.tree_util.tree_map(jnp.zeros_like, params),
            counter=jnp.zeros([], jnp.int32),
            has_slow=jnp.zeros([], jnp.bool_))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("Lookahead requires params in tx.update")
        u, inner_state = inner.update(updates, state.inner, params)
        fast = optax.apply_updates(params, u)
        sync = state.counter == 0
        tmap = jax.tree_util.tree_map
        slow0 = tmap(lambda s, f: jnp.where(state.has_slow, s, f),
                     state.slow, fast)
        out = tmap(lambda f, s: jnp.where(sync, alpha * f + (1 - alpha) * s,
                                          f), fast, slow0)
        new_slow = tmap(lambda o, s: jnp.where(sync, o, s), out, slow0)
        final = tmap(lambda o, p: o - p, out, params)
        return final, LookaheadState(
            inner=inner_state, slow=new_slow,
            counter=(state.counter + 1) % k,
            has_slow=jnp.ones([], jnp.bool_))

    return optax.GradientTransformation(init, update)


@OPTIMIZERS.register("Lookahead")
def lookahead(learning_rate, weight_decay=0.0, k=5, alpha=0.5,
              inner: str = "adam", inner_kwargs=None, **kw):
    """Lookahead wrapper (reference: src/optimizer/Lookahead.py) around an
    inner optimizer (default adam, matching the common usage).

    Inner hyperparameters go through ``inner_kwargs`` — a NAMED param,
    because build_optimizer filters config keys to the factory's
    signature, so a bare ``**kw`` passthrough would be unreachable from
    YAML: ``optimizer: {name: Lookahead, inner: sgd,
    inner_kwargs: {momentum: 0.9}}``.
    """
    fast = OPTIMIZERS.get(inner)(learning_rate, weight_decay,
                                 **dict(inner_kwargs or {}))
    return _lookahead(fast, k=int(k), alpha=float(alpha))


def build_optimizer(name: str, learning_rate: float, weight_decay: float = 0.0,
                    lr_decay: float | None = None, ema_decay: float = 0.0,
                    **kwargs):
    """Build an optimizer with an injectable ``learning_rate`` hyperparam.

    ``lr_decay`` is accepted for config parity (the reference passes it to
    every optimizer, src/model.py:180-183) but is consumed by schedulers.
    ``ema_decay > 0`` appends ``track_ema`` so an EMA of the weights rides
    in the optimizer state (``optimizer: {ema_decay: 0.999}`` in YAML;
    serve it with ``use_ema: true``).
    """
    factory = OPTIMIZERS.get(name)
    accepted = set(inspect.signature(factory).parameters)
    clean = {k: v for k, v in kwargs.items()
             if k in accepted and k not in ("learning_rate", "weight_decay")}
    dropped = set(kwargs) - set(clean) - {"learning_rate", "weight_decay"}
    if dropped:
        # a typo'd hyperparameter silently running at its default is a
        # training-behavior landmine — surface it (the reference's own
        # classes mostly crash on unknown kwargs, src/model.py:180-183)
        import warnings
        warnings.warn(f"optimizer {name!r} ignores config key(s) "
                      f"{sorted(dropped)}; accepted: "
                      f"{sorted(accepted - {'kw', 'kwargs'})}",
                      stacklevel=2)
    # Only the learning rate is a dynamic hyperparameter (driven by
    # host-side schedules); everything else — including defaulted numeric
    # args, which inject_hyperparams would otherwise trace — stays static
    # so factories can branch on it in Python.
    static = tuple(p for p in accepted
                   if p not in ("learning_rate", "kw"))
    tx = optax.inject_hyperparams(factory, static_args=static)(
        learning_rate=learning_rate, weight_decay=weight_decay, **clean)
    if ema_decay:
        if not 0.0 < float(ema_decay) < 1.0:
            raise ValueError(f"ema_decay must be in (0, 1), got {ema_decay}")
        tx = optax.chain(tx, track_ema(float(ema_decay)))
    return tx


def set_learning_rate(opt_state, lr):
    """Functionally set the injected learning rate (works inside jit).

    Handles both a bare ``InjectHyperparamsState`` and the
    ``optax.chain`` tuple produced when ``ema_decay`` appends the EMA
    tracker (the inject state is then the first element)."""
    if hasattr(opt_state, "hyperparams"):
        hp = dict(opt_state.hyperparams)
        hp["learning_rate"] = lr
        return opt_state._replace(hyperparams=hp)
    inner = opt_state[0]
    hp = dict(inner.hyperparams)
    hp["learning_rate"] = lr
    return (inner._replace(hyperparams=hp),) + tuple(opt_state[1:])
