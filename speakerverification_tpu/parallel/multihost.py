"""Multi-host (multi-process) data parallelism.

TPU-native replacement for the reference's DDP process management
(src/trainer.py:268-299: ``mp.spawn`` one process per GPU + NCCL/Gloo/MPI
``init_process_group`` over a localhost TCP rendezvous):

* one process per HOST (not per chip) — each process drives all of its
  local TPU devices; ``jax.distributed.initialize`` wires the coordinator
  (on TPU pods it auto-detects everything from the environment);
* the train step is the SAME ``shard_map`` program as single-host DP
  (parallel/dp.py) over a mesh spanning every device of every process —
  gradient psums ride ICI within a slice and DCN across slices, chosen
  by XLA rather than a backend flag (reference main.py:71-74);
* per-process input shards are built by the speaker-balanced sampler's
  rank sharding (the reference's TrainSampler rank slicing,
  src/dataloader.py:219-227) and assembled into global arrays with
  ``jax.make_array_from_process_local_data``;
* eval embeddings cross the process boundary via ``process_allgather``
  (replacing torch ``all_gather_object`` of feature dicts,
  src/model.py:400-411).

Launch (2 hosts):
    SVTPU_NUM_PROCESSES=2 SVTPU_PROCESS_ID=0 \
        SVTPU_COORDINATOR=host0:9876 python -m ... --do_train --distributed
    SVTPU_NUM_PROCESSES=2 SVTPU_PROCESS_ID=1 \
        SVTPU_COORDINATOR=host0:9876 python -m ... --do_train --distributed
On a real TPU pod slice none of the env vars are needed.
"""

from __future__ import annotations

import os
from typing import Mapping, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["maybe_initialize_distributed", "is_multiprocess",
           "global_batch", "replicate_global", "process_allgather"]

_initialized = False


def maybe_initialize_distributed(hparams: Optional[Mapping] = None) -> bool:
    """Call ``jax.distributed.initialize`` when a multi-process run is
    configured; safe to call repeatedly.

    Configuration sources, in priority order:

    1. hparams keys ``coordinator_address`` / ``num_processes`` /
       ``process_id`` (the CLI's ``--port`` feeds the coordinator port);
    2. env vars ``SVTPU_COORDINATOR`` / ``SVTPU_NUM_PROCESSES`` /
       ``SVTPU_PROCESS_ID``;
    3. TPU-pod auto-detection (zero-config ``initialize()``) when the
       environment advertises a multi-host slice.

    Returns True when running multi-process after the call.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1

    h = dict(hparams or {})
    num = h.get("num_processes", os.environ.get("SVTPU_NUM_PROCESSES"))
    pid = h.get("process_id", os.environ.get("SVTPU_PROCESS_ID"))
    coord = h.get("coordinator_address", os.environ.get("SVTPU_COORDINATOR"))
    if coord is None and h.get("port"):
        coord = f"localhost:{h['port']}"

    if num is None or pid is None or coord is None:
        # single-process, or a TPU pod where initialize() auto-detects —
        # NOTE: don't touch jax.devices()/process_count() before deciding,
        # initialize() must precede any backend use
        _initialized = True
        return jax.process_count() > 1

    # CPU cross-process collectives need gloo (no-op on TPU backends)
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(coordinator_address=str(coord),
                               num_processes=int(num),
                               process_id=int(pid))
    _initialized = True
    return jax.process_count() > 1


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def global_batch(batch, mesh: Mesh, axis: str = "data"):
    """Assemble per-process local batches into global batch-sharded arrays.

    Each process passes its LOCAL shard ``[B_local, ...]``; the result is
    the global ``[B_local * num_processes, ...]`` array sharded on
    ``axis`` (single-process: equivalent to parallel/dp.py shard_batch).
    """
    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))), x)
    return jax.tree_util.tree_map(put, batch)


def replicate_global(tree, mesh: Mesh):
    """Place a host pytree fully-replicated on a (possibly multi-process)
    mesh. Every process must hold the same values — true here because
    every process seeds model init with the same PRNGKey."""
    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P()), x)
    return jax.tree_util.tree_map(put, tree)


def process_allgather(x):
    """Gather a per-process array across processes (eval embeddings;
    replaces torch dist.all_gather_object, src/model.py:400-411)."""
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(x)
