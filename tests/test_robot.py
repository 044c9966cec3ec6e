"""URDF parsing, mesh loading, and forward-kinematics golden tests.

FK goldens are derived analytically from the MH5L URDF joint origins/axes
(urdfs/motoman_mh5_support_limited/urdf/mh5l_limited.urdf) — the TPU FK must
reproduce the chain the reference delegated to Klamp't
(reference robotpose/simulation/kinematics.py:36-55).
"""

import numpy as np
import pytest

from ropes3d_tpu.robot import ForwardKinematics, MeshLoader, URDFReader, load_stl, decimate
from ropes3d_tpu.robot.kinematics import make_fk


@pytest.fixture(scope="module")
def urdf():
    return URDFReader()


def test_urdf_links_and_limits(urdf):
    assert urdf.mesh_names == [
        "base_link",
        "link_1_s",
        "link_2_l",
        "link_3_u",
        "link_4_r",
        "link_5_b",
        "link_6_t",
    ]
    assert urdf.joint_limits.shape == (6, 2)
    # S-axis limits narrowed in the _limited variant.
    np.testing.assert_allclose(urdf.joint_limits[0], [-0.78539816339, 1.57079632679])
    np.testing.assert_allclose(urdf.joint_limits[5], [-6.28318530718, 6.28318530718])
    assert urdf.chain.num_joints == 6
    np.testing.assert_allclose(urdf.chain.joint_axes[0], [0, 0, 1])
    np.testing.assert_allclose(urdf.chain.joint_axes[2], [0, -1, 0])


def test_mesh_paths_exist(urdf):
    import os

    for p in urdf.mesh_paths:
        assert os.path.isfile(p), p


def test_stl_load_and_decimate(urdf):
    tris = load_stl(urdf.mesh_paths[0])
    assert tris.ndim == 3 and tris.shape[1:] == (3, 3)
    assert tris.shape[0] > 1000
    # Bounding box roughly sane for a robot base (metres).
    assert np.abs(tris).max() < 2.0
    dec = decimate(tris, 256)
    assert 0 < dec.shape[0] <= 256
    # Decimated bbox stays close to the original.
    np.testing.assert_allclose(
        dec.reshape(-1, 3).min(0), tris.reshape(-1, 3).min(0), atol=0.03
    )
    np.testing.assert_allclose(
        dec.reshape(-1, 3).max(0), tris.reshape(-1, 3).max(0), atol=0.03
    )


def test_mesh_loader_packs(urdf):
    ml = MeshLoader(max_tris_per_link=128)
    scene = ml.scene
    assert scene.num_links == 6  # T link excluded by default
    assert scene.tris_per_link % 64 == 0
    v, ids, valid = scene.flat(4)
    assert v.shape[0] == 4 * scene.tris_per_link
    assert ids.max() == 3


def test_fk_zero_pose(urdf):
    """At zero angles every joint frame is a pure translation stack."""
    fk = ForwardKinematics(urdf)
    poses = fk.calc(np.zeros(6))
    assert poses.shape == (7, 4, 4)
    np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-6)
    # Cumulative translations from the URDF origins:
    # S: z+0.330 ; L: x+0.088 ; U: z+0.400 ; R: z+0.040 ; B: x+0.405 ; T: x+0.080
    np.testing.assert_allclose(poses[1][:3, 3], [0, 0, 0.330], atol=1e-6)
    np.testing.assert_allclose(poses[2][:3, 3], [0.088, 0, 0.330], atol=1e-6)
    np.testing.assert_allclose(poses[3][:3, 3], [0.088, 0, 0.730], atol=1e-6)
    np.testing.assert_allclose(poses[4][:3, 3], [0.088, 0, 0.770], atol=1e-6)
    np.testing.assert_allclose(poses[5][:3, 3], [0.493, 0, 0.770], atol=1e-6)
    np.testing.assert_allclose(poses[6][:3, 3], [0.573, 0, 0.770], atol=1e-6)
    for i in range(7):
        np.testing.assert_allclose(poses[i][:3, :3], np.eye(3), atol=1e-6)


def test_fk_s_rotation(urdf):
    """S joint (axis +Z) rotates everything downstream about the base z."""
    fk = ForwardKinematics(urdf)
    ang = np.zeros(6)
    ang[0] = np.pi / 2
    poses = fk.calc(ang)
    # L-joint origin (0.088, 0, 0.330) rotates to (0, 0.088, 0.330).
    np.testing.assert_allclose(poses[2][:3, 3], [0, 0.088, 0.330], atol=1e-6)
    np.testing.assert_allclose(poses[6][:3, 3], [0, 0.573, 0.770], atol=1e-6)


def test_fk_l_rotation(urdf):
    """L joint (axis +Y) pitches the upper arm forward."""
    fk = ForwardKinematics(urdf)
    ang = np.zeros(6)
    ang[1] = np.pi / 2
    poses = fk.calc(ang)
    # U origin is 0.4 above L along +z; rotating +90deg about +Y maps
    # (0,0,0.4) -> (0.4,0,0): U lands at L_pos + (0.4, 0, 0).
    np.testing.assert_allclose(poses[3][:3, 3], [0.488, 0, 0.330], atol=1e-6)


def test_fk_u_axis_sign(urdf):
    """U joint axis is -Y: positive angle pitches the forearm *up*."""
    fk = ForwardKinematics(urdf)
    ang = np.zeros(6)
    ang[2] = np.pi / 2
    poses = fk.calc(ang)
    # B origin is 0.405 along +x from R; chain above U rotated -90deg about Y
    # maps +x -> -(-z)... verify via rotation matrix directly:
    R = poses[3][:3, :3]
    # Rot(-Y, pi/2) == Ry(-pi/2): x-axis maps to (0, 0, +1).
    np.testing.assert_allclose(R @ np.array([1, 0, 0]), [0, 0, 1], atol=1e-6)


def test_fk_batched_matches_single(urdf):
    fk_b = make_fk(urdf)
    rng = np.random.default_rng(0)
    angles = rng.uniform(-1, 1, size=(5, 6)).astype(np.float32)
    batched = np.asarray(fk_b(angles))
    fk = ForwardKinematics(urdf)
    for i in range(5):
        np.testing.assert_allclose(batched[i], fk.calc(angles[i]), atol=1e-5)


def test_fk_composition_property(urdf):
    """Link i pose must equal parent pose composed with local joint motion."""
    fk = ForwardKinematics(urdf)
    rng = np.random.default_rng(1)
    ang = rng.uniform(-0.7, 0.7, 6)
    poses = fk.calc(ang)
    # Orthonormality of all rotations.
    for i in range(7):
        R = poses[i][:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(R) > 0.99


def test_flat_packed_renders_identically(urdf):
    """Compacted + Morton-sorted triangle soup must rasterize bit-identically
    to the padded layout (rasterization is order-independent: the z-buffer
    max-reduction commutes)."""
    import jax.numpy as jnp

    from ropes3d_tpu.camera import Intrinsics, camera_matrices
    from ropes3d_tpu.ops.rasterizer import render_batch

    ml = MeshLoader(max_tris_per_link=128)
    intr = Intrinsics("640_480_color_16")
    _, w2c = camera_matrices([0, -1.5, 0.75, 0, 0, 0])
    K = jnp.array([intr.f[0], intr.f[1], intr.pp[0], intr.pp[1]])
    fk = make_fk(urdf)
    poses = jnp.asarray(fk(np.array([[0.4, 0.1, 0.6, 0, 0, 0]], np.float32)))[:, :6]

    outs = []
    for v, ids, valid in (ml.scene.flat(), ml.scene.flat_packed()):
        d, l = render_batch(
            poses, jnp.ones(6, bool), jnp.asarray(v), jnp.asarray(ids),
            jnp.asarray(valid), jnp.asarray(w2c, jnp.float32), K,
            intr.height, intr.width,
        )
        outs.append((np.asarray(d), np.asarray(l)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
    v, ids, _ = ml.scene.flat_packed()
    assert v.shape[0] < ml.scene.flat()[0].shape[0]  # padding really removed
    assert np.all(np.diff(ids) >= 0)  # ascending link ids (static slicing)
