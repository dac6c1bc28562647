"""Data × tensor (class-sharded classifier) parallel training.

2-D mesh ``(data, model)``: the batch is sharded over ``data`` exactly
as in parallel/dp.py, while the classifier head's weight — and its
optimizer moments — are sharded row-wise over ``model``
(losses/sharded.py::ShardedAAmSoftmax). The backbone stays replicated
across ``model`` (it is ≤ ~20 M parameters in every reference config;
the classifier is what grows with the speaker inventory). Collectives:

* gradient/metric/batch-stat ``pmean`` over ``data`` (as DP);
* ``pmax``/``psum`` over ``model`` inside the loss forward, with the
  matching backward collectives emitted by autodiff — replicated
  parameters therefore receive identical gradients on every model
  shard and need no extra synchronization.

The reference has no tensor parallelism at all (SURVEY.md §2.8: DDP
only, src/trainer.py:292-299); this is the TPU-native headroom for
10^5-10^6-speaker classifier heads.

Multi-host: works across processes as long as the model axis stays
inside each process (``shard_state_tp_global`` builds the global sharded
state from per-process host copies; batches ride
``multihost.global_batch``). Data-axis collectives then cross DCN while
the class-shard psums stay on ICI — the layout the scaling-book recipe
prescribes for a small replicated backbone with a fat sharded head.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from speakerverification_tpu.training.train_step import make_train_step

__all__ = ["tp_state_specs", "shard_state_tp",
           "shard_state_tp_global", "make_dp_tp_train_step"]


def _path_keys(path) -> list:
    keys = []
    for p in path:
        keys.append(getattr(p, "key", getattr(p, "name", None)))
    return keys


def tp_state_specs(state, model_axis: str = "model", n_model: int = 1):
    """PartitionSpec pytree for a TrainState: the loss head's 2-D
    ``weight`` (and its mirrored optimizer moments) sharded row-wise on
    ``model_axis``; everything else replicated.

    ``n_model`` guards divisibility: a weight is only sharded when its
    class dimension divides evenly."""

    def spec(path, leaf):
        keys = _path_keys(path)
        if (getattr(leaf, "ndim", 0) == 2 and keys and keys[-1] == "weight"
                and "loss" in keys and leaf.shape[0] % max(n_model, 1) == 0):
            return P(model_axis, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec, state)


def shard_state_tp(state, mesh: Mesh, model_axis: str = "model"):
    """Place a train state on the 2-D mesh with the classifier weight
    (and optimizer moments) sharded over ``model_axis``."""
    n_model = mesh.shape[model_axis]
    specs = tp_state_specs(state, model_axis, n_model)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs)


def shard_state_tp_global(state_host, mesh: Mesh,
                          model_axis: str = "model"):
    """Multi-process variant of :func:`shard_state_tp`: build GLOBAL
    arrays from per-process host copies.

    Every process passes the identical full host-side state (same init
    seed everywhere); the model axis must lie within each process (every
    process's devices cover all class shards), so the process-local data
    for every leaf is simply the full array. Requires the mesh's model
    axis to not cross process boundaries — asserted.
    """
    if mesh.axis_names[-1] != model_axis:
        raise ValueError(
            "shard_state_tp_global assumes the model axis is the minor "
            f"mesh axis, got {mesh.axis_names}")
    for row in mesh.devices.reshape(-1, mesh.shape[model_axis]):
        procs = {d.process_index for d in row}
        if len(procs) != 1:
            raise ValueError(
                f"model axis crosses processes ({procs}); model_parallel "
                "must divide the per-process device count")
    n_model = mesh.shape[model_axis]
    specs = tp_state_specs(state_host, model_axis, n_model)

    def put(x, s):
        import numpy as np
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, s), np.asarray(x))

    return jax.tree_util.tree_map(put, state_host, specs)


def make_dp_tp_train_step(model, tx, mesh: Mesh, state_template,
                          data_axis: str = "data", model_axis: str = "model",
                          donate: bool = True, compute_dtype=None,
                          augment_fn=None, n_aug_args: int = 0,
                          accum_steps: int = 1) -> Callable:
    """Build the 2-D-sharded ``step(state, wave, label, rng, lr)``.

    ``state_template`` provides the pytree structure for the per-leaf
    partition specs (pass the actual initial state). The model's loss
    head must be model-axis-aware (ShardedAAmSoftmax); batches are
    globally-shaped and sharded on ``data_axis`` (replicated across the
    model axis). ``n_aug_args`` extra trailing step arguments
    (replicated pytrees, e.g. refreshable noise/RIR banks) are
    forwarded to ``augment_fn``.
    """
    n_model = mesh.shape[model_axis]
    # the library API must not silently shard a non-shard-aware head:
    # tp_state_specs shards any 2-D 'weight' under a 'loss' path, which
    # computes wrong math for a head that never psums over model_axis
    loss_mod = getattr(model, "loss", None)
    if getattr(loss_mod, "model_axis", None) != model_axis:
        raise ValueError(
            "make_dp_tp_train_step requires a model-axis-aware loss head "
            f"(got {type(loss_mod).__name__} with model_axis="
            f"{getattr(loss_mod, 'model_axis', None)!r}, expected "
            f"{model_axis!r}); use ShardedAAmSoftmax or set model_parallel=1")
    state_specs = tp_state_specs(state_template, model_axis, n_model)
    if not any(s == P(model_axis, None)
               for s in jax.tree_util.tree_leaves(
                   state_specs, is_leaf=lambda x: isinstance(x, P))):
        # grad_scale below compensates the model-axis psum transpose; if
        # no leaf actually sharded (e.g. nClasses not divisible by
        # n_model) the loss takes its unsharded path and the scale would
        # silently halve every update — fail loudly instead
        raise ValueError(
            f"no 2-D loss weight is sharded over '{model_axis}' "
            f"(nClasses must be divisible by model_parallel={n_model}); "
            "pad the class count or lower model_parallel")
    inner = make_train_step(model, tx, axis_name=data_axis,
                            compute_dtype=compute_dtype,
                            grad_scale=1.0 / n_model,
                            augment_fn=augment_fn,
                            accum_steps=accum_steps)

    def per_shard(state, wave, label, rng, lr, *aug):
        # fold the DATA index only: model shards must draw identical
        # augmentation randomness or the replicated backbone diverges
        rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        return inner(state, wave, label, rng, lr, *aug)
    smapped = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(state_specs, P(data_axis), P(data_axis), P(), P())
        + (P(),) * n_aug_args,
        out_specs=(state_specs, P()),
        check_vma=False)
    return jax.jit(smapped, donate_argnums=(0,) if donate else ())
