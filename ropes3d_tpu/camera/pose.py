"""Pose math and the camera-pose convention.

Mirrors the reference's Euler conventions exactly so camera poses stored in
datasets stay meaningful:

- ``make_pose(x, y, z, pitch, roll, yaw)`` builds a 4x4 with
  ``R = Rz(yaw) @ Ry(pitch) @ Rx(roll)`` (reference
  ``robotpose/simulation/render_utils.py:56-108``).
- Camera poses are 6-vectors ``[x, y, z, p3, p4, p5]``; the renderer applies
  ``p4 += pi/2`` before building the camera frame (reference
  ``render.py:107-111``), which with all-zero angles yields a camera at
  ``[x, y, z]`` looking along world +Y with +Z up.
- The camera frame follows OpenGL convention: looks along local -Z, +Y up.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _rot_zyx(yaw, pitch, roll, xp=np):
    """R = Rz(yaw) @ Ry(pitch) @ Rx(roll), batched-scalar friendly."""
    c = xp.cos(xp.stack([yaw, pitch, roll])) if xp is jnp else np.cos([yaw, pitch, roll])
    s = xp.sin(xp.stack([yaw, pitch, roll])) if xp is jnp else np.sin([yaw, pitch, roll])
    r00 = c[0] * c[1]
    r10 = c[1] * s[0]
    r20 = -s[1]
    r01 = c[0] * s[1] * s[2] - c[2] * s[0]
    r11 = c[0] * c[2] + s[0] * s[1] * s[2]
    r21 = c[1] * s[2]
    r02 = s[0] * s[2] + c[0] * c[2] * s[1]
    r12 = c[2] * s[0] * s[1] - c[0] * s[2]
    r22 = c[1] * c[2]
    if xp is jnp:
        return jnp.stack(
            [
                jnp.stack([r00, r01, r02]),
                jnp.stack([r10, r11, r12]),
                jnp.stack([r20, r21, r22]),
            ]
        )
    return np.array([[r00, r01, r02], [r10, r11, r12], [r20, r21, r22]])


def make_pose(x, y, z, pitch, roll, yaw, xp=np):
    """4x4 pose from position + ZYX Euler angles (reference makePose)."""
    R = _rot_zyx(yaw, pitch, roll, xp=xp)
    if xp is jnp:
        T = jnp.eye(4, dtype=R.dtype)
        T = T.at[:3, :3].set(R)
        return T.at[:3, 3].set(jnp.stack([x, y, z]))
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = [x, y, z]
    return T


def pose_to_camera_matrix(camera_pose, xp=np):
    """6-vector camera pose -> 4x4 camera-to-world matrix.

    Applies the reference's +pi/2 pitch convention (render.py:107-111).
    Note the reference calls ``makePose(*pose)`` whose signature is
    ``(x, y, z, pitch, roll, yaw)``, so pose[3] is pitch, pose[4] (+pi/2) is
    roll, pose[5] is yaw.
    """
    if xp is jnp:
        p = jnp.asarray(camera_pose, jnp.float32)
        return make_pose(p[0], p[1], p[2], p[3], p[4] + jnp.pi / 2, p[5], xp=jnp)
    p = np.asarray(camera_pose, float)
    return make_pose(p[0], p[1], p[2], p[3], p[4] + np.pi / 2, p[5], xp=np)


def camera_matrices(camera_pose, xp=np):
    """Return (camera_to_world, world_to_camera) 4x4 matrices."""
    c2w = pose_to_camera_matrix(camera_pose, xp=xp)
    R = c2w[:3, :3]
    t = c2w[:3, 3]
    if xp is jnp:
        w2c = jnp.eye(4, dtype=c2w.dtype)
        w2c = w2c.at[:3, :3].set(R.T)
        w2c = w2c.at[:3, 3].set(-R.T @ t)
        return c2w, w2c
    w2c = np.eye(4)
    w2c[:3, :3] = R.T
    w2c[:3, 3] = -R.T @ t
    return c2w, w2c
