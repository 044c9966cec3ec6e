"""Error-function and interpolation parity tests.

The numpy oracles below transcribe the reference formulas
(robotpose/prediction/predict.py:475-509, 167-171, 363-369) and the jnp
implementations must match them numerically.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ropes3d_tpu.ops.error import TargetBundle, link_error, lookup_error, tensor_sweep_error
from ropes3d_tpu.ops.interp import cubic_spline_uniform
from ropes3d_tpu.ops.image import downsample, dilate, erode


def _oracle_link_error(masks, masked_depth, present, tgt_depth, rdepth, rlid, num_joints):
    """Direct transcription of Predictor._error (predict.py:475-509)."""
    err = 0.0
    for li in range(1, num_joints):
        if not present[li]:
            continue
        joint_mask = masks[li]
        target_masked = masked_depth[li]
        render_mask = rlid == li
        render_masked = rdepth * render_mask
        err += np.mean(joint_mask != render_mask) * 5
        if np.sum(target_masked != 0) > 0.05 * np.sum(joint_mask):
            diff = np.abs(target_masked - render_masked)
            if diff[diff != 0].size > 0:
                err += np.mean(diff[diff != 0]) * 10
    diff = np.abs(tgt_depth - rdepth)
    if diff[diff != 0].size > 0:
        err += np.mean(diff[diff != 0]) * np.std(diff)
    return err


@pytest.mark.parametrize("num_joints", [4, 6])
def test_link_error_matches_oracle(num_joints):
    rng = np.random.default_rng(3)
    h, w = 24, 32
    masks = rng.random((6, h, w)) < 0.15
    depth_field = rng.uniform(0.5, 2.0, (h, w))
    masked_depth = masks * depth_field
    present = np.array([True, True, True, False, True, True])
    masks[3] = 0
    masked_depth[3] = 0
    tgt_depth = depth_field * (rng.random((h, w)) < 0.4)
    rlid = rng.integers(-1, 6, (h, w))
    rdepth = np.where(rlid >= 0, rng.uniform(0.5, 2.0, (h, w)), 0.0)

    oracle = _oracle_link_error(
        masks, masked_depth, present, tgt_depth, rdepth, rlid, num_joints
    )
    bundle = TargetBundle(
        jnp.asarray(masks),
        jnp.asarray(masked_depth, jnp.float32),
        jnp.asarray(present),
        jnp.asarray(tgt_depth, jnp.float32),
    )
    link_active = (jnp.arange(6) >= 1) & (jnp.arange(6) < num_joints)
    ours = float(
        link_error(
            bundle,
            jnp.asarray(rdepth, jnp.float32),
            jnp.asarray(rlid, jnp.int32),
            link_active,
        )
    )
    np.testing.assert_allclose(ours, oracle, rtol=1e-5)


def test_lookup_error_matches_oracle():
    rng = np.random.default_rng(4)
    tgt = rng.uniform(0, 2, (10, 12)).astype(np.float32)
    stack = rng.uniform(0, 2, (7, 10, 12)).astype(np.float32)
    diff = np.abs(tgt[None] - stack)
    oracle = diff.mean(axis=(1, 2)) * diff.std(axis=(1, 2))
    ours = np.asarray(lookup_error(jnp.asarray(tgt), jnp.asarray(stack)))
    np.testing.assert_allclose(ours, oracle, rtol=1e-5)
    oracle_t = diff.mean(axis=(1, 2)) * -diff.std(axis=(1, 2))
    ours_t = np.asarray(tensor_sweep_error(jnp.asarray(tgt), jnp.asarray(stack)))
    np.testing.assert_allclose(ours_t, oracle_t, rtol=1e-5)


def test_occlusion_aware_lookup_ranks_occluded_truth_first():
    """The 2-channel robust lookup metric (engine._lookup_err) must rank a
    mostly-occluded TRUE pose above a small "hiding" pose that plain
    truncated L1 prefers (round-4 cluttered failure mode: the within-3-deg
    stack entry ranked 137-10792 because every occluded robot pixel cost
    tau under the seg-only metric)."""
    from ropes3d_tpu.prediction.engine import CandidateEvaluator

    tau = 0.25
    ch, cw = 8, 8
    # Candidate A (true pose): silhouette cols 0-3 at depth 1.0 (sqrt 1.0).
    A = np.zeros((ch, cw), np.float32)
    A[:, 0:4] = 1.0
    # Candidate B (wrong pose): covers only the detected fragment plus 4
    # pixels sticking into observed free space.
    B = np.zeros((ch, cw), np.float32)
    B[6:8, 0:4] = 1.0
    B[6:8, 4:6] = 1.0
    stack_sqrt = jnp.asarray(np.stack([A, B]))  # already sqrt-domain

    # Observed scene: occluder (raw 0.25 m) hides rows 0-5 of the robot;
    # rows 6-7 detected at raw 1.0 m; background raw 4.0 m elsewhere.
    seg = np.zeros((ch, cw), np.float32)
    seg[6:8, 0:4] = 1.0
    raw = np.full((ch, cw), 4.0, np.float32)
    raw[0:6, 0:4] = 0.25
    raw[6:8, 0:4] = 1.0

    # Legacy single-channel robust: the truth pays tau for all 24 occluded
    # pixels and loses to the hiding pose.
    legacy = np.asarray(
        CandidateEvaluator._lookup_err(jnp.asarray(seg), stack_sqrt, tau)
    )
    assert legacy[1] < legacy[0]

    # Occlusion-aware 2-channel: occluded pixels are free (nearer surface),
    # free-space violations cost tau -> the truth wins.
    occ = np.asarray(
        CandidateEvaluator._lookup_err(
            jnp.asarray(np.stack([seg, raw])), stack_sqrt, tau
        )
    )
    assert occ[0] < occ[1]
    np.testing.assert_allclose(occ[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(occ[1], 4 * tau, rtol=1e-5)


def test_topk_diverse_spans_basins():
    """Diversity-enforced top-k must return one seed per angle basin, not k
    near-copies of the best basin (round-4 diag_misrank2: the true basin
    ranked 137-10792 behind thousands of wrong-basin grid neighbours, so
    plain top-k bought no recall)."""
    from ropes3d_tpu.prediction.engine import CandidateEvaluator

    # Two basins 0.5 rad apart in joint 0; basin A has 50 entries with the
    # 50 lowest errors, basin B's best entry ranks 51st.
    angles = np.zeros((60, 6), np.float32)
    angles[:50, 0] = np.linspace(0.0, 0.05, 50)  # basin A (within NMS sep)
    angles[50:, 0] = 0.5 + np.linspace(0.0, 0.05, 10)  # basin B
    err = np.arange(60, dtype=np.float32)

    plain = angles[np.argsort(err)[:3]]
    assert np.all(plain[:, 0] < 0.1)  # plain: all three from basin A

    div = np.asarray(
        CandidateEvaluator._topk_diverse(
            jnp.asarray(err), jnp.asarray(angles), 3, 0.2
        )
    )
    assert div[0, 0] == angles[0, 0]  # best overall first
    assert np.any(div[:, 0] > 0.4)  # basin B represented
    # and picks stay sorted by error within the constraint
    assert div[1, 0] == angles[50, 0]


def test_cubic_spline_matches_scipy():
    from scipy.interpolate import interp1d

    rng = np.random.default_rng(5)
    for n in (10, 25):
        x = np.linspace(-1.3, 2.1, n)
        y = rng.normal(size=n)
        t = np.linspace(-1.3, 2.1, n * 5)
        ref = interp1d(x, y, kind="cubic")(t)
        ours = np.asarray(
            cubic_spline_uniform(x[0], x[-1], jnp.asarray(y, jnp.float64), jnp.asarray(t, jnp.float64))
        )
        # Exact to 1e-15 under x64 (verified); default-f32 jax gives ~1e-5.
        np.testing.assert_allclose(ours, ref, atol=3e-5)


def test_downsample_cv2_semantics():
    """Point-sampled 2x2 bilinear: flat color regions survive exactly."""
    img = np.zeros((32, 32, 3), np.uint8)
    img[8:24, 8:24] = [7, 0, 241]
    out = np.asarray(downsample(jnp.asarray(img), 8))
    assert out.shape == (4, 4, 3)
    np.testing.assert_array_equal(out[1:3, 1:3], np.broadcast_to([7, 0, 241], (2, 2, 3)))
    np.testing.assert_array_equal(out[0, 0], [0, 0, 0])
    # Odd factor picks exact pixels.
    out3 = np.asarray(downsample(jnp.asarray(img), 3))
    assert out3.shape == (10, 10, 3)


def test_morphology():
    m = np.zeros((16, 16), np.float32)
    m[8, 8] = 1.0
    d = np.asarray(dilate(jnp.asarray(m), 3))
    assert d.sum() == 9
    e = np.asarray(erode(jnp.asarray(d), 3))
    assert e.sum() == 1 and e[8, 8] == 1
