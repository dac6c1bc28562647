"""shard_map data-parallel training over a device mesh.

TPU-native replacement for torch DDP (src/trainer.py:100-101
``DistributedDataParallel`` + implicit NCCL gradient allreduce):

* the train step runs SPMD under ``jax.shard_map`` over the ``data``
  mesh axis;
* each replica computes gradients on its batch shard, and a single
  ``pmean`` (XLA all-reduce over ICI) averages gradients, loss, metrics
  and batch stats;
* parameters/optimizer state are replicated (out_specs ``P()``), so
  every replica applies the identical update — the invariant DDP
  maintains by construction.

Per-replica SpecAugment randomness folds the replica index into the
step RNG (the reference gets this from per-worker numpy reseeding,
src/dataloader.py:26-27).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from speakerverification_tpu.training.train_step import make_train_step

__all__ = ["make_dp_train_step", "replicate_state", "shard_batch"]


def make_dp_train_step(model, tx, mesh: Mesh, axis: str = "data",
                       donate: bool = True, compute_dtype=None,
                       augment_fn=None, n_aug_args: int = 0,
                       accum_steps: int = 1) -> Callable:
    """Build ``step(state, wave, label, rng, lr) -> (state, metrics)``
    where wave/label are globally-shaped arrays sharded on ``axis``.

    ``compute_dtype`` forwards the bf16 mixed-precision policy to the
    inner step (same semantics as the single-device path);
    ``augment_fn`` the on-device augmentation hook (runs per shard with
    the per-replica folded rng, so shards draw independent corruption).
    ``n_aug_args`` extra trailing step arguments (replicated pytrees,
    e.g. refreshable noise/RIR banks) are forwarded to ``augment_fn``."""
    inner = make_train_step(model, tx, axis_name=axis,
                            compute_dtype=compute_dtype,
                            augment_fn=augment_fn,
                            accum_steps=accum_steps)

    def per_replica(state, wave, label, rng, lr, *aug):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        return inner(state, wave, label, rng, lr, *aug)

    smapped = jax.shard_map(
        per_replica, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(), P()) + (P(),) * n_aug_args,
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(smapped, donate_argnums=(0,) if donate else ())


def replicate_state(state, mesh: Mesh):
    """Place a train state fully-replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(state, sharding)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place host arrays batch-sharded over the mesh's data axis."""
    def put(x):
        x = jnp.asarray(x)
        return jax.device_put(x, NamedSharding(mesh, P(axis)))
    return jax.tree_util.tree_map(put, batch)
