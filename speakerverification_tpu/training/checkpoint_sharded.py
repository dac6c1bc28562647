"""Sharded checkpointing via orbax: no host gather, optional async.

The msgpack path (training/checkpoint.py) reassembles every array on
the host before writing — fine at the reference's ≤20 M-param scale
(src/trainer.py:143-232 writes whole .pt state dicts the same way),
but the tensor-parallel classifier head this framework adds
(losses/sharded.py) exists precisely for 10^5-10^6-speaker heads whose
weight + optimizer moments run to gigabytes: gathering those to one
host per epoch costs time and host RAM, and restoring re-shards from a
single blob.

This module keeps arrays where they live:

* ``save_sharded`` writes each device shard in parallel through orbax's
  OCDBT store (every process writes only its addressable shards — the
  natural fit for the multi-host DP×TP meshes of parallel/tp.py).
* ``async_save_sharded`` returns immediately after snapshotting device
  buffers and serializes in a background thread — the next training
  step overlaps the write (call ``wait`` before exiting).
* ``restore_sharded`` restores directly INTO the target's shardings:
  each process reads only the bytes its shards need.

Retention/rotation stays in CheckpointManager; pass
``backend="sharded"`` to it (or ``sharded_checkpoints: true`` in the
training YAML) to store every checkpoint this way.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Optional

import jax

__all__ = ["save_sharded", "async_save_sharded", "restore_sharded",
           "wait", "is_sharded_checkpoint"]

_ASYNC: dict = {}      # final path -> (AsyncCheckpointer, tmp path)


def _checkpointer(async_: bool = False):
    import orbax.checkpoint as ocp
    if async_:
        return ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return ocp.StandardCheckpointer()


def is_sharded_checkpoint(path: str | Path) -> bool:
    """True when ``path`` is an orbax checkpoint directory."""
    if str(Path(path)) in _ASYNC:      # finalize a pending async save
        wait(path)
    p = Path(path)
    return p.is_dir() and ((p / "_CHECKPOINT_METADATA").exists()
                           or (p / "manifest.ocdbt").exists()
                           or any(p.glob("*.orbax-checkpoint*")))


def save_sharded(path: str | Path, state, meta: Optional[dict] = None,
                 async_: bool = False) -> Path:
    """Write ``state`` (a pytree of jax.Arrays) as an orbax directory.

    Every process writes its own shards; nothing is gathered. ``meta``
    lands in the same JSON sidecar the msgpack path uses, so
    CheckpointManager's best-loss seeding and resume records work
    unchanged. With ``async_=True`` the call returns as soon as device
    buffers are snapshotted; ``wait(path)`` (or the next save to the
    same path) blocks until the bytes are durable.
    """
    path = Path(path)
    wait(path)                        # finalize any in-flight async save
    # Crash safety: never delete the previous checkpoint before its
    # replacement is durable (a preemption mid-overwrite of last_state
    # must not lose the only copy). Write to a hidden tmp sibling, then
    # swap — the leading dot keeps every retention glob away from it.
    tmp = path.parent / f".{path.name}.tmp-save"
    if tmp.exists():
        shutil.rmtree(tmp)
    ckpt = _checkpointer(async_)
    ckpt.save(tmp.resolve(), state)
    if async_:
        _ASYNC[str(path)] = (ckpt, tmp)   # swap happens in wait()
    else:
        ckpt.close()
        _swap_into_place(tmp, path)
    if meta is not None and jax.process_index() == 0:
        Path(str(path) + ".json").write_text(json.dumps(meta))
    return path


def _swap_into_place(tmp: Path, path: Path) -> None:
    old = path.parent / f".{path.name}.tmp-old"
    if old.exists():
        shutil.rmtree(old)
    if path.exists():
        path.replace(old)
    tmp.replace(path)
    if old.exists():
        shutil.rmtree(old)


def async_save_sharded(path: str | Path, state,
                       meta: Optional[dict] = None) -> Path:
    """``save_sharded`` overlapping serialization with training."""
    return save_sharded(path, state, meta, async_=True)


def wait(path: str | Path | None = None) -> None:
    """Block until async save(s) are durable and swapped into place
    (all pending saves if ``path`` is None)."""
    keys = [str(Path(path))] if path is not None else list(_ASYNC)
    for k in keys:
        entry = _ASYNC.pop(k, None)
        if entry is not None:
            ckpt, tmp = entry
            ckpt.wait_until_finished()
            ckpt.close()
            _swap_into_place(tmp, Path(k))


def restore_sharded(path: str | Path, target) -> Any:
    """Restore into ``target``'s structure, dtypes and SHARDINGS.

    Each leaf comes back placed exactly like the corresponding leaf of
    ``target`` (e.g. the TP head's ``P('model', None)``), each process
    reading only the byte ranges its shards cover.
    """
    import orbax.checkpoint as ocp

    if str(Path(path)) in _ASYNC:      # finalize a pending async save
        wait(path)

    def abstract(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                        sharding=x.sharding)
        return x

    tpl = jax.tree_util.tree_map(abstract, target)
    ckpt = ocp.StandardCheckpointer()
    try:
        return ckpt.restore(Path(path).resolve(), tpl)
    finally:
        ckpt.close()
