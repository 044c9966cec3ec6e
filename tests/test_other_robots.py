"""Generality: the framework must work with every shipped robot model
(reference supports mh5 / mh5l / mh5l_limited / mh50 URDF packages)."""

import os

import numpy as np
import pytest

ROBOTS = [
    "urdfs/motoman_mh5_support/urdf/mh5.urdf",
    "urdfs/motoman_mh5_support/urdf/mh5l.urdf",
    "urdfs/motoman_mh50_support/urdf/mh50.urdf",
]


@pytest.mark.parametrize("rel", ROBOTS)
def test_robot_loads_and_renders(rel):
    from ropes3d_tpu.camera import camera_matrices
    from ropes3d_tpu.ops.rasterizer import render_batch
    from ropes3d_tpu.robot import MeshLoader, URDFReader
    from ropes3d_tpu.robot.kinematics import make_fk

    import jax.numpy as jnp

    path = os.path.join(os.environ["ROPES3D_ROOT"], rel)
    if not os.path.isfile(path):
        pytest.skip(f"{rel} not present")
    urdf = URDFReader(path=path)
    assert urdf.chain.num_joints == 6
    assert len(urdf.mesh_names) == 7
    for p in urdf.mesh_paths:
        assert os.path.isfile(p), p

    fk = make_fk(urdf)
    poses = np.asarray(fk(np.zeros((1, 6), np.float32)))[0]
    assert poses.shape == (7, 4, 4)
    # Wrist must sit above the floor and within arm's reach.
    tcp = poses[-1][:3, 3]
    assert 0.0 < tcp[2] < 3.0
    reach = float(np.linalg.norm(tcp))

    ml = MeshLoader(max_tris_per_link=128, urdf=urdf)
    v, ids, valid = ml.scene.flat()
    # Camera distance scales with the arm's reach (mh50 is much larger).
    cam_dist = max(1.5, 2.2 * reach)
    _, w2c = camera_matrices([0, -cam_dist, reach, 0, 0, 0])
    intr = jnp.array([80.0, 80.0, 40.0, 30.0])
    mid = np.zeros((1, 6), np.float32)
    link_poses = jnp.asarray(fk(mid))[:, :6]
    depth, lid = render_batch(
        link_poses, jnp.ones(6, bool), jnp.asarray(v), jnp.asarray(ids),
        jnp.asarray(valid), jnp.asarray(w2c, jnp.float32), intr, 60, 80,
    )
    l = np.asarray(lid[0])
    cov = (l >= 0).mean()
    assert cov > 0.01, f"robot not visible (coverage {cov})"
    # Base can fall out of frame depending on arm proportions; the moving
    # links must be visible.
    assert set(np.unique(l[l >= 0])) >= {1, 2}
