"""Forward kinematics as a pure JAX function.

Replaces the reference's Klamp't C++ FK (``robotpose/simulation/kinematics.py:
17-55``) with a traced kinematic chain: ``fk(angles[..., 6]) ->
link_poses[..., 7, 4, 4]``.  Differentiable, jittable, and vmappable over
candidate batches — the property the whole TPU candidate-search engine is
built on (SURVEY.md §7).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .urdf import KinematicChain, URDFReader


def _rot_rpy(rpy: np.ndarray) -> np.ndarray:
    """Fixed URDF origin rotation: R = Rz(yaw) @ Ry(pitch) @ Rx(roll)."""
    r, p, y = rpy
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def _axis_rotation(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues rotation about a unit axis; angle may be traced."""
    x, y, z = axis
    K = jnp.array([[0.0, -z, y], [z, 0.0, -x], [-y, x, 0.0]], dtype=angle.dtype)
    c, s = jnp.cos(angle), jnp.sin(angle)
    eye = jnp.eye(3, dtype=angle.dtype)
    return eye + s * K + (1.0 - c) * (K @ K)


def fk_from_chain(chain: KinematicChain, dtype=jnp.float32) -> Callable:
    """Build ``fk(angles[6]) -> poses[J+1, 4, 4]`` for a parsed chain.

    The returned function composes, per joint ``i``:
    ``T_{i+1} = T_i @ Trans(origin_i) @ R_rpy_i @ R(axis_i, angle_i)``
    with link 0 (base) at identity.  Unrolled over the (static) joint count
    so XLA sees a flat graph of 3x3 matmuls.
    """
    J = chain.num_joints
    # Precompute the static part of each joint transform: Trans @ Rrpy.
    fixed = np.tile(np.eye(4, dtype=np.float64), (J, 1, 1))
    for i in range(J):
        fixed[i, :3, :3] = _rot_rpy(chain.joint_rpys[i])
        fixed[i, :3, 3] = chain.joint_origins[i]
    fixed = jnp.asarray(fixed, dtype=dtype)
    axes = jnp.asarray(
        chain.joint_axes / np.linalg.norm(chain.joint_axes, axis=1, keepdims=True),
        dtype=dtype,
    )

    def fk(angles: jnp.ndarray) -> jnp.ndarray:
        angles = jnp.asarray(angles, dtype=dtype)
        poses = [jnp.eye(4, dtype=dtype)]
        T = poses[0]
        for i in range(J):
            R = _axis_rotation(axes[i], angles[i])
            joint_T = fixed[i].at[:3, :3].set(fixed[i, :3, :3] @ R)
            T = T @ joint_T
            poses.append(T)
        return jnp.stack(poses)

    return fk


def make_fk(urdf: URDFReader = None, dtype=jnp.float32) -> Callable:
    """FK for the active URDF; batched: ``fk_batch(angles[..., 6])``."""
    urdf = urdf or URDFReader()
    fk = fk_from_chain(urdf.chain, dtype=dtype)

    def fk_any(angles):
        angles = jnp.asarray(angles, dtype=dtype)
        flat = angles.reshape(-1, angles.shape[-1])
        out = jax.vmap(fk)(flat)
        return out.reshape(*angles.shape[:-1], out.shape[-3], 4, 4)

    return fk_any


class ForwardKinematics:
    """Drop-in object API mirroring the reference class (kinematics.py:17-55).

    ``calc(angles[6]) -> (7, 4, 4)`` numpy array of link poses; also exposes
    the raw jitted batch function for engine use.
    """

    def __init__(self, urdf: URDFReader = None):
        self.u_reader = urdf or URDFReader()
        self.load()

    def load(self) -> None:
        self._fk = jax.jit(make_fk(self.u_reader))
        self.link_names = list(self.u_reader.mesh_names)

    def calc(self, angles) -> np.ndarray:
        return np.asarray(self._fk(jnp.asarray(angles, jnp.float32)))

    @property
    def batch_fn(self) -> Callable:
        return self._fk
