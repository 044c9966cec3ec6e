"""Native C++ runtime tests (skipped when csrc/build/libropes3d.so absent)."""

import numpy as np
import pytest

from ropes3d_tpu.native import lib, mesh_ops, stl as native_stl


pytestmark = pytest.mark.skipif(
    lib.get() is None, reason="native library not built (csrc/build.sh)"
)


def test_native_stl_matches_numpy():
    from ropes3d_tpu.robot import URDFReader
    from ropes3d_tpu.robot.mesh import _load_stl_numpy

    urdf = URDFReader()
    path = urdf.mesh_paths[1]
    ref = _load_stl_numpy(path)
    nat = native_stl.load_stl(path)
    assert nat.shape == ref.shape
    np.testing.assert_array_equal(nat, ref)


def test_native_decimate():
    from ropes3d_tpu.robot import URDFReader
    from ropes3d_tpu.robot.mesh import _load_stl_numpy

    urdf = URDFReader()
    tris = _load_stl_numpy(urdf.mesh_paths[0])
    out = mesh_ops.decimate(tris, 256)
    assert 0 < out.shape[0] <= 256
    np.testing.assert_allclose(
        out.reshape(-1, 3).min(0), tris.reshape(-1, 3).min(0), atol=0.03
    )
    np.testing.assert_allclose(
        out.reshape(-1, 3).max(0), tris.reshape(-1, 3).max(0), atol=0.03
    )


def test_native_golden_rasterizer_vs_xla():
    """The scalar C++ rasterizer is an independent oracle: the XLA/TPU
    rasterizer must agree on the full robot scene (boundary pixels may
    differ by float associativity; require >=99.5% link-id agreement and
    matching depths on agreeing pixels)."""
    import jax.numpy as jnp

    from ropes3d_tpu.camera import Intrinsics, camera_matrices
    from ropes3d_tpu.ops.rasterizer import (
        rasterize,
        transform_vertices,
        triangle_setup,
    )
    from ropes3d_tpu.robot import MeshLoader, URDFReader
    from ropes3d_tpu.robot.kinematics import make_fk

    urdf = URDFReader()
    ml = MeshLoader(max_tris_per_link=128, urdf=urdf)
    v, ids, valid = ml.scene.flat()
    intr = Intrinsics("640_480_color_8")
    _, w2c = camera_matrices([0, -1.5, 0.75, 0, 0, 0])
    fk = make_fk(urdf)
    poses = np.asarray(fk(np.array([[0.3, 0.2, 0.5, 0, 0, 0]], np.float32)))[0][:6]

    cam = transform_vertices(
        jnp.asarray(v), jnp.asarray(ids), jnp.asarray(poses),
        jnp.asarray(w2c, jnp.float32),
    )
    fx, fy = intr.f
    cx, cy = intr.pp
    coeffs, qrange, vrange, _ = triangle_setup(
        cam, jnp.asarray(valid), fx, fy, cx, cy
    )
    h, w = intr.height, intr.width
    d_xla, l_xla = rasterize(coeffs, qrange, jnp.asarray(ids), h, w)
    d_xla, l_xla = np.asarray(d_xla), np.asarray(l_xla)

    cam_np = np.asarray(cam)
    cam_np = cam_np[np.asarray(valid)]
    ids_np = np.asarray(ids)[np.asarray(valid)]
    d_ref, l_ref = mesh_ops.raster_reference(cam_np, ids_np, fx, fy, cx, cy, h, w)

    agree = l_xla == l_ref
    assert agree.mean() > 0.995, f"link-id agreement {agree.mean()}"
    both = agree & (l_xla >= 0)
    np.testing.assert_allclose(d_xla[both], d_ref[both], rtol=1e-3)
    # Coverage is meaningfully nonzero.
    assert (l_ref >= 0).mean() > 0.03
