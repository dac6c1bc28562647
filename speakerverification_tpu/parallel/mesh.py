"""Device mesh construction.

TPU-native replacement for the reference's process-group setup
(src/trainer.py:292-303 ``dist.init_process_group`` over NCCL/Gloo/MPI
with TCP rendezvous): a ``jax.sharding.Mesh`` over the visible devices.
Collectives ride ICI within a slice and DCN across slices — XLA picks
the transport, so there is no backend-selection flag
(reference main.py:71-74 becomes unnecessary by design).

The default mesh is 1-D over a ``data`` axis (the reference's only
production parallelism is DDP data-parallel, SURVEY.md §2.8); a ``model``
axis can be added for future tensor parallelism without changing the
step code.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(axes: Tuple[str, ...] = ("data",),
              shape: Optional[Sequence[int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh over ``devices`` (default: all of ``jax.devices()``).

    ``shape`` defaults to all devices on the first axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = [len(devices)] + [1] * (len(axes) - 1)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)
