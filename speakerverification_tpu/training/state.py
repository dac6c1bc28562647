"""Train state pytree: params + batch stats + optimizer state."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

__all__ = ["TrainState", "create_train_state"]


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(model, tx: optax.GradientTransformation,
                       rng: jax.Array, example_batch, example_label=None,
                       ) -> TrainState:
    """Initialize model variables and optimizer state.

    ``example_batch`` must carry the static shapes used in training
    (XLA compiles one program per shape).
    """
    init_rngs = {"params": rng, "specaug": jax.random.fold_in(rng, 1),
                 "dropout": jax.random.fold_in(rng, 2)}
    variables = model.init(init_rngs, example_batch, example_label, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )
