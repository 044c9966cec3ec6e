"""Rasterizer golden tests.

Validates the matmul-form rasterizer (ropes3d_tpu/ops/rasterizer.py) against
analytically-computed projections and depths — the TPU stand-in for the
reference's OpenGL SEG-mode renders (robotpose/simulation/render.py:92-98).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ropes3d_tpu.camera import camera_matrices
from ropes3d_tpu.ops.rasterizer import (
    rasterize,
    render_batch,
    transform_vertices,
    triangle_setup,
)


def _raster_single(tris, link_ids, valid, w2c, fx, fy, cx, cy, h, w):
    cam = transform_vertices(
        jnp.asarray(tris, jnp.float32),
        jnp.asarray(link_ids, jnp.int32),
        jnp.eye(4)[None],
        jnp.asarray(w2c, jnp.float32),
    )
    coeffs, qrange, _, _ = triangle_setup(cam, jnp.asarray(valid), fx, fy, cx, cy)
    return rasterize(coeffs, qrange, jnp.asarray(link_ids, jnp.int32), h, w)


def test_single_triangle_coverage_and_depth():
    """A z=2 plane triangle seen head-on: exact coverage + exact depth."""
    h, w = 64, 64
    fx = fy = 64.0
    cx = cy = 32.0
    # Camera at origin looking along -Z (identity w2c); triangle at Z = -2.
    z = -2.0
    tris = np.array(
        [[[-1.0, -1.0, z], [1.0, -1.0, z], [0.0, 1.0, z]]], np.float32
    )
    depth, lid = _raster_single(
        tris, np.array([0]), np.array([True]), np.eye(4), fx, fy, cx, cy, h, w
    )
    depth = np.asarray(depth)
    lid = np.asarray(lid)
    # All covered pixels have depth exactly 2.
    assert (depth > 0).sum() > 100
    np.testing.assert_allclose(depth[depth > 0], 2.0, rtol=1e-5)
    assert set(np.unique(lid)) == {-1, 0}
    # Projected vertex locations: u = fx*x/2 + 32 -> x=±1 maps to u=0/64,
    # y=-1 maps to v = 32 + 32 = 64 (bottom), y=+1 to v=0 (top).
    # Centroid pixel must be covered:
    assert depth[32, 32] == pytest.approx(2.0, rel=1e-5)
    # Top corners outside the triangle are background:
    assert depth[2, 2] == 0 and lid[2, 2] == -1
    assert depth[2, 61] == 0
    # Bottom-center row near v=63, u=32 is inside:
    assert depth[60, 32] > 0


def test_winding_invariance():
    h, w = 32, 32
    tri = np.array([[[-1, -1, -2], [1, -1, -2], [0, 1, -2]]], np.float32)
    tri_rev = tri[:, ::-1, :]
    d1, _ = _raster_single(tri, [0], [True], np.eye(4), 32, 32, 16, 16, h, w)
    d2, _ = _raster_single(tri_rev, [0], [True], np.eye(4), 32, 32, 16, 16, h, w)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_occlusion_nearest_wins():
    h, w = 32, 32
    big_far = [[-2, -2, -4.0], [2, -2, -4.0], [0, 3, -4.0]]
    small_near = [[-0.5, -0.5, -2.0], [0.5, -0.5, -2.0], [0, 0.7, -2.0]]
    tris = np.array([big_far, small_near], np.float32)
    depth, lid = _raster_single(
        tris, [0, 1], [True, True], np.eye(4), 32, 32, 16, 16, h, w
    )
    depth = np.asarray(depth)
    lid = np.asarray(lid)
    assert depth[16, 16] == pytest.approx(2.0, rel=1e-5)
    assert lid[16, 16] == 1
    # A pixel covered only by the far triangle:
    assert depth[20, 5] == pytest.approx(4.0, rel=1e-5)
    assert lid[20, 5] == 0


def test_perspective_correct_depth_interpolation():
    """A slanted quad's rasterized depth must equal the analytic plane depth."""
    h, w = 64, 64
    fx = fy = 64.0
    cx = cy = 32.0
    # Plane z = -(2 + x): two triangles forming a quad over x,y in [-0.8, 0.8].
    def pz(x):
        return -(2.0 + x)

    c = [
        [-0.8, -0.8, pz(-0.8)],
        [0.8, -0.8, pz(0.8)],
        [0.8, 0.8, pz(0.8)],
        [-0.8, 0.8, pz(-0.8)],
    ]
    tris = np.array([[c[0], c[1], c[2]], [c[0], c[2], c[3]]], np.float32)
    depth, _ = _raster_single(
        tris, [0, 0], [True, True], np.eye(4), fx, fy, cx, cy, h, w
    )
    depth = np.asarray(depth)
    cov = depth > 0
    assert cov.sum() > 500
    # Invert the projection at each covered pixel to get the analytic depth:
    # u = fx * x / z + cx  and  z = 2 + x  =>  x = 2(u-cx)/(fx-(u-cx))
    rr, cc = np.where(cov)
    u = cc + 0.5
    x = 2 * (u - cx) / (fx - (u - cx))
    z_true = 2.0 + x
    np.testing.assert_allclose(depth[rr, cc], z_true, rtol=2e-3)


def test_degenerate_and_invalid_triangles_ignored():
    h, w = 16, 16
    tris = np.array(
        [
            [[0, 0, -2], [0, 0, -2], [0, 0, -2]],  # degenerate
            [[-1, -1, -2], [1, -1, -2], [0, 1, -2]],  # masked out
            [[-1, -1, 1.0], [1, -1, 1.0], [0, 1, 1.0]],  # behind camera
        ],
        np.float32,
    )
    depth, lid = _raster_single(
        tris, [0, 1, 2], [True, False, True], np.eye(4), 16, 16, 8, 8, h, w
    )
    assert np.asarray(depth).max() == 0
    assert np.asarray(lid).max() == -1


def test_render_batch_link_mask_and_poses():
    """render_batch: per-candidate link poses + runtime link masking."""
    h, w = 32, 32
    intrin = jnp.array([32.0, 32.0, 16.0, 16.0])
    tri = np.array([[[-0.5, -0.5, 0], [0.5, -0.5, 0], [0, 0.7, 0]]], np.float32)
    # Two links, one triangle each; link 1's triangle offset in model space.
    verts = np.concatenate([tri, tri + np.array([1.2, 0, 0])], 0)
    link_ids = np.array([0, 1], np.int32)
    valid = np.array([True, True])
    # Camera looks along -Z from origin; push links to z=-3 via link poses.
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -3.0
    poses = jnp.asarray(np.stack([np.stack([pose, pose])] * 2))  # [B=2, L=2]
    depth, lid = render_batch(
        poses,
        jnp.array([True, True]),
        jnp.asarray(verts),
        jnp.asarray(link_ids),
        jnp.asarray(valid),
        jnp.eye(4),
        intrin,
        h,
        w,
    )
    assert depth.shape == (2, h, w)
    assert set(np.unique(np.asarray(lid))) == {-1, 0, 1}
    # Mask out link 1 at runtime:
    depth2, lid2 = render_batch(
        poses,
        jnp.array([True, False]),
        jnp.asarray(verts),
        jnp.asarray(link_ids),
        jnp.asarray(valid),
        jnp.eye(4),
        intrin,
        h,
        w,
    )
    assert set(np.unique(np.asarray(lid2))) == {-1, 0}
    # Link-0 pixels identical between the two renders.
    l0 = np.asarray(lid)[0] == 0
    np.testing.assert_array_equal(np.asarray(depth)[0][l0], np.asarray(depth2)[0][l0])


def test_pallas_backend_matches_xla_interpret():
    """The fused Pallas kernel (interpret mode on CPU) must agree with the
    XLA backend bit-for-bit."""
    import jax

    from ropes3d_tpu.ops.rasterizer import triangle_setup
    from ropes3d_tpu.ops.rasterizer_pallas import rasterize_pallas

    h, w = 32, 48
    tris = np.array(
        [
            [[-1, -1, -2], [1, -1, -2], [0, 1, -2]],
            [[-0.5, -0.5, -1.5], [0.5, -0.5, -1.5], [0, 0.7, -1.5]],
        ],
        np.float32,
    )
    link_ids = jnp.array([0, 1], jnp.int32)
    cam = transform_vertices(
        jnp.asarray(tris), link_ids, jnp.eye(4)[None], jnp.eye(4)
    )
    coeffs, qrange, vrange, _ = triangle_setup(
        cam, jnp.array([True, True]), 32.0, 32.0, 24.0, 16.0
    )
    d_x, l_x = rasterize(coeffs, qrange, link_ids, h, w)
    d_p, l_p = rasterize_pallas(
        coeffs, qrange, vrange, link_ids, h, w, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(l_x), np.asarray(l_p))
    np.testing.assert_array_equal(np.asarray(d_x), np.asarray(d_p))


def test_shaded_raster_consistent_with_plain():
    """'real'-mode shaded raster: same coverage/depth (to the stolen mantissa
    bits), plus sensible shade values."""
    from ropes3d_tpu.ops.rasterizer import rasterize_shaded, triangle_shade
    from ropes3d_tpu.ops.rasterizer import triangle_setup

    h, w = 32, 32
    tris = np.array(
        [[[-1, -1, -2], [1, -1, -2], [0, 1, -2]]], np.float32
    )
    lids = jnp.array([0], jnp.int32)
    cam = transform_vertices(jnp.asarray(tris), lids, jnp.eye(4)[None], jnp.eye(4))
    coeffs, qrange, _, _ = triangle_setup(cam, jnp.array([True]), 32.0, 32.0, 16.0, 16.0)
    shade = triangle_shade(cam)
    assert int(shade[0]) == 255  # face-on triangle, headlight shading
    d0, l0 = rasterize(coeffs, qrange, lids, h, w)
    d1, l1, smap = rasterize_shaded(coeffs, qrange, lids, shade, h, w)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    cov = np.asarray(l0) >= 0
    np.testing.assert_allclose(np.asarray(d1)[cov], np.asarray(d0)[cov], rtol=1e-3)
    assert (np.asarray(smap)[cov] == 255).all()
    assert (np.asarray(smap)[~cov] == 0).all()


def test_camera_pose_projection_consistency():
    """Project a known world point through camera_matrices and check the
    rasterized blob lands at the predicted pixel."""
    h, w = 96, 96
    fx = fy = 120.0
    cx = cy = 48.0
    cam_pose = [0.0, -1.5, 0.75, 0, 0, 0]  # default: looking along +Y
    c2w, w2c = camera_matrices(cam_pose)
    # Small triangle around world point (0.1, 0, 0.8).
    p = np.array([0.1, 0.0, 0.8])
    r = 0.02
    tris = np.array(
        [[p + [-r, 0, -r], p + [r, 0, -r], p + [0, 0, r]]], np.float32
    )
    depth, _ = _raster_single(tris, [0], [True], w2c, fx, fy, cx, cy, h, w)
    depth = np.asarray(depth)
    # Analytic projection.
    pc = (w2c @ np.append(p, 1.0))[:3]
    zc = -pc[2]
    u = fx * pc[0] / zc + cx
    v = cy - fy * pc[1] / zc
    rr, cc = np.where(depth > 0)
    assert len(rr) > 0
    assert abs(cc.mean() - u) < 2.0
    assert abs(rr.mean() - v) < 2.0
    np.testing.assert_allclose(depth[depth > 0].mean(), zc, rtol=0.02)


def test_pallas_batch_kernel_matches_xla_interpret():
    """Candidate-batched kernel (grid carries B) must agree with the XLA
    backend per candidate."""
    import jax

    from ropes3d_tpu.ops.rasterizer import triangle_setup
    from ropes3d_tpu.ops.rasterizer_pallas import rasterize_pallas_batch

    h, w = 32, 48
    tris = np.array(
        [
            [[-1, -1, -2], [1, -1, -2], [0, 1, -2]],
            [[-0.5, -0.5, -1.5], [0.5, -0.5, -1.5], [0, 0.7, -1.5]],
        ],
        np.float32,
    )
    link_ids = jnp.array([0, 1], jnp.int32)
    # Two candidates: identity pose and a small translation of link poses.
    shift = jnp.eye(4).at[0, 3].set(0.2)
    keep = []
    for pose in (jnp.eye(4), shift):
        cam = transform_vertices(
            jnp.asarray(tris), link_ids, jnp.stack([pose, pose]), jnp.eye(4)
        )
        keep.append(
            triangle_setup(cam, jnp.array([True, True]), 32.0, 32.0, 24.0, 16.0)
        )
    coeffs = jnp.stack([k[0] for k in keep])
    qrange = jnp.stack([k[1] for k in keep])
    vrange = jnp.stack([k[2] for k in keep])
    d_b, l_b = rasterize_pallas_batch(
        coeffs, qrange, vrange, link_ids, h, w, interpret=True
    )
    for b in range(2):
        d_x, l_x = rasterize(keep[b][0], keep[b][1], link_ids, h, w)
        np.testing.assert_array_equal(np.asarray(l_x), np.asarray(l_b[b]))
        np.testing.assert_array_equal(np.asarray(d_x), np.asarray(d_b[b]))


def test_fused_error_kernel_matches_link_error_interpret():
    """rasterize_error_pallas + link_error_from_parts == render + link_error
    (the exact reference formula) on a synthetic target."""
    import jax

    from ropes3d_tpu.ops.error import (
        TargetBundle,
        link_error,
        link_error_from_parts,
    )
    from ropes3d_tpu.ops.rasterizer import triangle_setup
    from ropes3d_tpu.ops.rasterizer_pallas import rasterize_error_pallas

    h, w = 24, 40
    tris = np.array(
        [
            [[-1, -1, -2], [1, -1, -2], [0, 1, -2]],
            [[-0.5, -0.5, -1.5], [0.5, -0.5, -1.5], [0, 0.7, -1.5]],
            [[-0.2, -0.8, -1.2], [0.8, -0.6, -1.3], [0.2, 0.5, -1.2]],
        ],
        np.float32,
    )
    link_ids = jnp.array([1, 2, 3], jnp.int32)
    valid = jnp.array([True, True, True])
    fx = fy = 20.0
    cx, cy = 20.0, 12.0

    # Target from one configuration; candidates from two others.
    def setup(scale):
        cam = transform_vertices(
            jnp.asarray(tris) * scale, link_ids, jnp.stack([jnp.eye(4)] * 4),
            jnp.eye(4),
        )
        return triangle_setup(cam, valid, fx, fy, cx, cy)

    t_coeffs, t_qrange, _, _ = setup(1.0)
    t_depth, t_lid = rasterize(t_coeffs, t_qrange, link_ids, h, w)
    masks = jnp.stack([t_lid == i for i in range(6)])
    target = TargetBundle(
        masks,
        (masks * t_depth[None]).astype(jnp.float32),
        masks.any(axis=(1, 2)),
        t_depth.astype(jnp.float32),
    )

    cands = [setup(0.9), setup(1.1)]
    coeffs = jnp.stack([c[0] for c in cands])
    qrange = jnp.stack([c[1] for c in cands])
    vrange = jnp.stack([c[2] for c in cands])
    parts = rasterize_error_pallas(
        coeffs, qrange, vrange, link_ids,
        target.masks, target.masked_depth, target.depth, h, w, interpret=True,
    )
    la = jnp.asarray((np.arange(6) >= 1) & (np.arange(6) < 6))
    e_fused = np.asarray(link_error_from_parts(parts, target, la, h * w))
    for b in range(2):
        d, l = rasterize(cands[b][0], cands[b][1], link_ids, h, w)
        e_ref = float(link_error(target, d, l, la))
        np.testing.assert_allclose(e_fused[b], e_ref, rtol=1e-5)

    # Robust truncation mode: kernel tau == XLA-fallback tau, and a finite
    # tau must actually change the result on a target with large residuals
    # (otherwise the threading is dead code).
    tau = 0.05
    parts_t = rasterize_error_pallas(
        coeffs, qrange, vrange, link_ids,
        target.masks, target.masked_depth, target.depth, h, w, tau=tau,
        interpret=True,
    )
    e_fused_t = np.asarray(
        link_error_from_parts(parts_t, target, la, h * w, tau)
    )
    changed = False
    for b in range(2):
        d, l = rasterize(cands[b][0], cands[b][1], link_ids, h, w)
        e_ref_t = float(link_error(target, d, l, la, tau))
        np.testing.assert_allclose(e_fused_t[b], e_ref_t, rtol=1e-5)
        changed |= abs(e_ref_t - e_fused[b]) > 1e-6
    assert changed, "tau=0.05 should alter the error on mismatched scales"
    # tau=inf is bit-identical to the parity (tau=None) path.
    parts_inf = rasterize_error_pallas(
        coeffs, qrange, vrange, link_ids,
        target.masks, target.masked_depth, target.depth, h, w,
        tau=float("inf"), interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(parts_inf), np.asarray(parts))


def test_fused_error_kernel_streaming_matches_link_error_interpret():
    """The high-resolution streaming variant (padded width > 512: target
    maps in HBM, per-tile DMA) must produce the same partials/error as the
    two-step reference formula.  640-wide frame forces the HBM route."""
    from ropes3d_tpu.ops.error import (
        TargetBundle,
        link_error,
        link_error_from_parts,
    )
    from ropes3d_tpu.ops.rasterizer import triangle_setup
    from ropes3d_tpu.ops.rasterizer_pallas import rasterize_error_pallas

    h, w = 368, 640
    tris = np.array(
        [
            [[-1, -1, -2], [1, -1, -2], [0, 1, -2]],
            [[-0.5, -0.5, -1.5], [0.5, -0.5, -1.5], [0, 0.7, -1.5]],
            [[-0.2, -0.8, -1.2], [0.8, -0.6, -1.3], [0.2, 0.5, -1.2]],
        ],
        np.float32,
    )
    link_ids = jnp.array([1, 2, 3], jnp.int32)
    valid = jnp.array([True, True, True])
    # fx sets silhouette size and thus visited-tile count — 150 keeps the
    # interpret-mode run ~10 s while still spanning many row tiles.
    fx = fy = 150.0
    cx, cy = 320.0, 184.0

    def setup(scale):
        cam = transform_vertices(
            jnp.asarray(tris) * scale, link_ids, jnp.stack([jnp.eye(4)] * 4),
            jnp.eye(4),
        )
        return triangle_setup(cam, valid, fx, fy, cx, cy)

    t_coeffs, t_qrange, _, _ = setup(1.0)
    t_depth, t_lid = rasterize(t_coeffs, t_qrange, link_ids, h, w)
    masks = jnp.stack([t_lid == i for i in range(6)])
    target = TargetBundle(
        masks,
        (masks * t_depth[None]).astype(jnp.float32),
        masks.any(axis=(1, 2)),
        t_depth.astype(jnp.float32),
    )

    cands = [setup(0.9), setup(1.1)]
    coeffs = jnp.stack([c[0] for c in cands])
    qrange = jnp.stack([c[1] for c in cands])
    vrange = jnp.stack([c[2] for c in cands])
    la = jnp.asarray((np.arange(6) >= 1) & (np.arange(6) < 6))
    for tau in (None, 0.05):
        parts = rasterize_error_pallas(
            coeffs, qrange, vrange, link_ids,
            target.masks, target.masked_depth, target.depth, h, w, tau=tau,
            interpret=True,
        )
        e_fused = np.asarray(link_error_from_parts(parts, target, la, h * w, tau))
        for b in range(2):
            d, l = rasterize(cands[b][0], cands[b][1], link_ids, h, w)
            e_ref = float(link_error(target, d, l, la, tau))
            np.testing.assert_allclose(e_fused[b], e_ref, rtol=1e-5)


def test_fused_error_kernel_vmap_batched_target_interpret():
    """rasterize_error_pallas must vmap over a BATCHED TargetBundle.

    The hypothesis-batched stepwise search and frame-batched prediction
    vmap the eval over (candidates, target) together; with the frame
    totals as a kernel operand this failed TPU lowering (Squeezed leading
    SMEM block).  Guard the shape contract in interpret mode."""
    import jax

    from ropes3d_tpu.ops.error import TargetBundle
    from ropes3d_tpu.ops.rasterizer import triangle_setup
    from ropes3d_tpu.ops.rasterizer_pallas import rasterize_error_pallas

    h, w = 24, 40
    tris = np.array(
        [
            [[-1, -1, -2], [1, -1, -2], [0, 1, -2]],
            [[-0.5, -0.5, -1.5], [0.5, -0.5, -1.5], [0, 0.7, -1.5]],
        ],
        np.float32,
    )
    link_ids = jnp.array([1, 2], jnp.int32)
    valid = jnp.array([True, True])
    fx = fy = 20.0
    cx, cy = 20.0, 12.0

    def setup(scale):
        cam = transform_vertices(
            jnp.asarray(tris) * scale, link_ids, jnp.stack([jnp.eye(4)] * 3),
            jnp.eye(4),
        )
        return triangle_setup(cam, valid, fx, fy, cx, cy)

    def make_target(scale):
        c, q, _, _ = setup(scale)
        d, l = rasterize(c, q, link_ids, h, w)
        masks = jnp.stack([l == i for i in range(6)])
        return TargetBundle(
            masks,
            (masks * d[None]).astype(jnp.float32),
            masks.any(axis=(1, 2)),
            d.astype(jnp.float32),
        )

    K = 3
    targets = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[make_target(s) for s in (0.95, 1.0, 1.05)]
    )
    cands = [setup(s) for s in (0.9, 1.0, 1.1)]
    coeffs = jnp.stack([c[0] for c in cands])  # [K, N, 4, 3]
    qrange = jnp.stack([c[1] for c in cands])
    vrange = jnp.stack([c[2] for c in cands])

    def one(co, qr, vr, tgt):
        return rasterize_error_pallas(
            co[None], qr[None], vr[None], link_ids,
            tgt.masks, tgt.masked_depth, tgt.depth, h, w, interpret=True,
        )[0]

    batched = jax.vmap(one)(coeffs, qrange, vrange, targets)
    for k in range(K):
        ref = one(coeffs[k], qrange[k], vrange[k],
                  jax.tree.map(lambda x: x[k], targets))
        np.testing.assert_allclose(np.asarray(batched[k]), np.asarray(ref),
                                   rtol=1e-6)

def test_fused_error_kernel_occlusion_matches_link_error_interpret():
    """Occlusion-aware robust mode (TargetBundle.occ + finite tau): the
    fused kernel's graded render-only charges must match the XLA
    link_error branch, in both the VMEM-resident and streaming variants,
    and the occ plane must actually change the result vs plain robust."""
    from ropes3d_tpu.ops.error import (
        TargetBundle,
        link_error,
        link_error_from_parts,
    )
    from ropes3d_tpu.ops.rasterizer import triangle_setup
    from ropes3d_tpu.ops.rasterizer_pallas import rasterize_error_pallas

    tris = np.array(
        [
            [[-1, -1, -2], [1, -1, -2], [0, 1, -2]],
            [[-0.5, -0.5, -1.5], [0.5, -0.5, -1.5], [0, 0.7, -1.5]],
            [[-0.2, -0.8, -1.2], [0.8, -0.6, -1.3], [0.2, 0.5, -1.2]],
        ],
        np.float32,
    )
    link_ids = jnp.array([1, 2, 3], jnp.int32)
    valid = jnp.array([True, True, True])
    tau = 0.05

    for h, w, f in ((24, 40, 20.0), (368, 640, 150.0)):  # resident / stream
        cx, cy = w / 2.0, h / 2.0

        def setup(scale):
            # Scale x/y only: a uniform scale preserves the projected
            # silhouette (x/z invariant) — the candidates must SPILL
            # outside the detected masks to exercise the occ grading.
            sc = jnp.asarray([scale, scale, 1.0], jnp.float32)
            cam = transform_vertices(
                jnp.asarray(tris) * sc, link_ids,
                jnp.stack([jnp.eye(4)] * 4), jnp.eye(4),
            )
            return triangle_setup(cam, valid, f, f, cx, cy)

        t_coeffs, t_qrange, _, _ = setup(1.0)
        t_depth, t_lid = rasterize(t_coeffs, t_qrange, link_ids, h, w)
        masks = jnp.stack([t_lid == i for i in range(6)])
        # Mixed-evidence occ plane: detected (-1) on mask pixels, a sensor
        # hole band (0), an occluder in front (0.8 m), and far background
        # (3.0 m) elsewhere — exercises every branch of the graded charge.
        # Occluder (0.8 m, in front of the ~1.2-2 m renders) over most of
        # the frame so the 1.1-scale candidate's spill outside the detected
        # mask is forgiven; hole band on top, far background on the right.
        occ_np = np.full((h, w), 0.8, np.float32)
        occ_np[: h // 5] = 0.0
        occ_np[:, 3 * w // 4 :] = 3.0
        occ_np[np.asarray(masks.any(axis=0))] = -1.0
        occ = jnp.asarray(occ_np)
        target = TargetBundle(
            masks,
            (masks * t_depth[None]).astype(jnp.float32),
            masks.any(axis=(1, 2)),
            t_depth.astype(jnp.float32),
            occ,
        )

        cands = [setup(0.9), setup(1.1)]
        coeffs = jnp.stack([c[0] for c in cands])
        qrange = jnp.stack([c[1] for c in cands])
        vrange = jnp.stack([c[2] for c in cands])
        la = jnp.asarray((np.arange(6) >= 1) & (np.arange(6) < 6))
        parts = rasterize_error_pallas(
            coeffs, qrange, vrange, link_ids,
            target.masks, target.masked_depth, target.depth, h, w, tau=tau,
            tocc=occ, interpret=True,
        )
        e_fused = np.asarray(
            link_error_from_parts(parts, target, la, h * w, tau)
        )
        plain = target._replace(occ=None)
        for b in range(2):
            d, l = rasterize(cands[b][0], cands[b][1], link_ids, h, w)
            e_ref = float(link_error(target, d, l, la, tau))
            # rtol 5e-5: the graded charge's /tau adds one f32 rounding per
            # pixel and the kernel sums per-tile (different add order).
            np.testing.assert_allclose(e_fused[b], e_ref, rtol=5e-5)
            # occ must matter: plain robust differs on these scenes.
            assert abs(float(link_error(plain, d, l, la, tau)) - e_ref) > 1e-6


def test_link_error_occlusion_ranks_occluded_truth_first():
    """Semantic guard for the occlusion-aware final error: a TRUE pose
    whose lower links are hidden behind an occluder must outrank a small
    'hiding' pose under the occ-aware robust error, while plain robust
    prefers the hiding pose (the round-4 cluttered misrank mode)."""
    from ropes3d_tpu.ops.error import TargetBundle, link_error

    h, w = 16, 16
    tau = 0.1
    la = jnp.asarray((np.arange(6) >= 1) & (np.arange(6) < 6))

    # True robot: link 1 occupies cols 0-7, depth 1.5 m.  The segmenter
    # detected only rows 12-15 (the rest hidden behind a 0.5 m occluder).
    det = np.zeros((h, w), bool)
    det[12:16, 0:8] = True
    tgt_depth = np.where(det, 1.5, 0.0).astype(np.float32)
    masks = np.zeros((6, h, w), bool)
    masks[1] = det
    occ_np = np.full((h, w), 4.0, np.float32)  # background behind
    occ_np[0:12, 0:8] = 0.5  # occluder hides the upper robot
    occ_np[det] = -1.0
    target = TargetBundle(
        jnp.asarray(masks),
        jnp.asarray(masks * tgt_depth[None], np.float32),
        jnp.asarray(masks.any(axis=(1, 2))),
        jnp.asarray(tgt_depth),
        jnp.asarray(occ_np),
    )

    # Render A = true pose (full column strip at 1.5 m), B = hiding pose
    # (covers only the detected fragment, plus a sliver into free space).
    lid_A = np.where(
        np.zeros((h, w), bool) | (np.arange(w)[None, :] < 8), 1, -1
    ).astype(np.int32)
    d_A = np.where(lid_A == 1, 1.5, 0.0).astype(np.float32)
    lid_B = np.full((h, w), -1, np.int32)
    lid_B[12:16, 0:10] = 1  # fragment + 2 cols sticking into background
    d_B = np.where(lid_B == 1, 1.5, 0.0).astype(np.float32)

    e_occ = [
        float(link_error(target, jnp.asarray(d), jnp.asarray(l), la, tau))
        for d, l in ((d_A, lid_A), (d_B, lid_B))
    ]
    plain = target._replace(occ=None)
    e_plain = [
        float(link_error(plain, jnp.asarray(d), jnp.asarray(l), la, tau))
        for d, l in ((d_A, lid_A), (d_B, lid_B))
    ]
    assert e_plain[1] < e_plain[0], "plain robust should prefer hiding pose"
    assert e_occ[0] < e_occ[1], "occ-aware must rank the occluded truth first"
