"""Device mesh and sharding helpers.

The reference is single-process/single-GPU (SURVEY.md §2.9); the TPU build's
parallel axes are:

- ``data``: frames (batch prediction / segmentation training batch)
- ``model``: candidate axis for sharded lookup stacks and intra-model
  sharding of large dense layers in the segmentation net

Collectives ride ICI via jax.sharding — no custom transport.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(
    n_devices: Optional[int] = None, axes: Sequence[str] = ("data", "model")
) -> Mesh:
    """Build a mesh over available devices.

    Default layout puts all devices on ``data`` (the only large-degree
    parallel axis in this workload) with ``model`` = 1; callers can reshape.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if len(axes) == 2:
        arr = np.array(devs).reshape(n, 1)
    else:
        arr = np.array(devs).reshape((n,) + (1,) * (len(axes) - 1))
    return Mesh(arr, axes)


def shard_batch(x, mesh: Mesh, axis: str = "data"):
    """Place an array with its leading dim sharded over ``axis``."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicated(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
