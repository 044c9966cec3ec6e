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


_GLOBAL_MESH: Optional[Mesh] = None


def global_mesh() -> Mesh:
    """Process-wide 1-D mesh over all devices, axis name 'data'.

    Shared by every data-sharded resident array (lookup stacks on the
    candidate axis, frame batches on the frame axis) so they can coexist in
    one jitted program.
    """
    global _GLOBAL_MESH
    if _GLOBAL_MESH is None:
        _GLOBAL_MESH = Mesh(np.array(jax.devices()), ("data",))
    return _GLOBAL_MESH


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


def shard_lookup_stack(stack, angles):
    """Shard a lookup depth stack over all devices along the candidate axis.

    The reference sizes its lookup to one GPU's VRAM (SURVEY.md §2.9); here
    the HBM budget scales with the device count: the [N, ch, cw] stack is
    laid out candidate-sharded and the argmin reduction's collectives ride
    ICI.  Pads N to a device-count multiple with +inf-error sentinel rows
    (zero depth never wins the sqrt-domain mean*std argmin against real
    rows only if padded rows duplicate row 0 — so padding repeats row 0,
    which can only tie, never corrupt, the argmin).
    Returns (sharded_stack, sharded_angles, mesh) or inputs unchanged on a
    single device.
    """
    import jax.numpy as jnp

    devs = jax.devices()
    if len(devs) <= 1:
        return stack, angles, None
    n = len(devs)
    pad = (-stack.shape[0]) % n
    if pad:
        stack = jnp.concatenate([stack, jnp.repeat(stack[:1], pad, 0)], 0)
        angles = jnp.concatenate([angles, jnp.repeat(angles[:1], pad, 0)], 0)
    mesh = global_mesh()
    sh = NamedSharding(mesh, P("data"))
    return jax.device_put(stack, sh), jax.device_put(angles, sh), mesh
