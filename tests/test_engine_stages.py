"""Direct engine stage tests: TensorSweep, Jacobi descent, SFlip program."""

import numpy as np
import pytest


CAM = [0, -1.5, 0.75, 0, 0, 0]


@pytest.fixture(scope="module")
def setup():
    import jax.numpy as jnp

    from ropes3d_tpu.camera import Intrinsics
    from ropes3d_tpu.ops.error import TargetBundle
    from ropes3d_tpu.prediction.engine import CandidateEvaluator, SearchState
    from ropes3d_tpu.robot import URDFReader
    from ropes3d_tpu.simulation.renderer import Renderer

    intr = Intrinsics("640_480_color_16")
    urdf = URDFReader()
    engine = CandidateEvaluator(CAM, intr, urdf=urdf)
    rend = Renderer("seg", CAM, intr)
    true_pose = np.array([0.4, 0.1, 0.6, 0, 0, 0], np.float32)
    rend.setJointAngles(true_pose)
    depth, lid = rend.render_ids()
    masks = np.stack([lid == i for i in range(6)])
    target = TargetBundle(
        jnp.asarray(masks),
        jnp.asarray(masks * depth[None], jnp.float32),
        jnp.asarray(masks.any((1, 2))),
        jnp.asarray(depth, jnp.float32),
    )
    return engine, target, true_pose


def test_tensor_sweep_formula_parity(setup):
    """TensorSweep must select the argmin of the reference's sqrt-domain
    ``mean(|diff|) * -std(|diff|)`` over the swept grid (predict.py:340-373).

    NOTE: that metric prefers *bimodal* diff distributions and does not
    reliably move toward the truth on body-masked targets — which is why
    the reference's own recipes use InterpolativeSweep instead
    (stages.py:71-90 docstring); we reproduce the formula exactly.
    """
    import jax.numpy as jnp

    from ropes3d_tpu.prediction.engine import SearchState
    from ropes3d_tpu.prediction.stages import TensorSweep

    engine, target, true_pose = setup
    state = SearchState.fresh()
    start = true_pose.copy()
    start[2] -= 0.4
    state = state._replace(angles=jnp.asarray(start))
    stage = TensorSweep(6, 15, "U", 0.6)
    out = engine.tensor_sweep(state, target.depth, stage, 2)

    # Oracle: render the same grid, apply the reference formula.
    lim = np.asarray(engine.u_reader.joint_limits)
    lo = max(start[2] - 0.6, lim[2, 0])
    hi = min(start[2] + 0.6, lim[2, 1])
    space = np.tile(start, (15, 1))
    space[:, 2] = lo + (hi - lo) * np.arange(15) / 14
    depth, _ = engine._render_fn(6)(jnp.asarray(space, jnp.float32), engine._w2c)
    diff = np.abs(
        np.sqrt(np.asarray(target.depth))[None] - np.sqrt(np.asarray(depth))
    )
    errs = diff.mean(axis=(1, 2)) * -diff.std(axis=(1, 2))
    np.testing.assert_allclose(
        np.asarray(out.angles), space[errs.argmin()], atol=1e-5
    )


def test_jacobi_descent_converges(setup):
    from ropes3d_tpu.prediction.engine import SearchState
    from ropes3d_tpu.prediction.stages import Descent

    engine, target, true_pose = setup
    state = SearchState.fresh()
    start = true_pose + np.array([0.06, -0.05, 0.08, 0, 0, 0], np.float32)
    state = state._replace(angles=np.asarray(start, np.float32))
    stage = Descent(6, 15, "SLU", [0.04] * 6, early_stop_thresh=0.001)
    state = engine.descent(state, target, stage, jacobi=True)
    err = np.degrees(np.abs(np.asarray(state.angles) - true_pose))[:3]
    start_err = np.degrees(np.abs(start - true_pose))[:3]
    assert np.median(err) < np.median(start_err) / 2, (start_err, err)


def test_sflip_program_keeps_better(setup):
    """The device SFlip must never make the error worse."""
    from ropes3d_tpu.prediction.engine import SearchState
    from ropes3d_tpu.prediction.stages import SFlip

    engine, target, true_pose = setup
    state = SearchState.fresh()
    state = state._replace(angles=np.asarray(true_pose, np.float32))
    err_before = engine.evaluate(true_pose[None], target, 6)[0]
    state2 = engine.sflip(state, target, SFlip(6))
    err_after = engine.evaluate(np.asarray(state2.angles)[None], target, 6)[0]
    assert err_after <= err_before + 1e-5


def test_robust_early_stop_scaled(setup):
    """In robust mode the descent's relative-improvement early stop is
    scaled by config.ROBUST_EARLY_STOP_SCALE: the cluttered error floor
    inflates its denominator and would halt descent mid-progress (see
    config.py).  Parity evaluators (tau=None) must pass thresholds
    through unchanged."""
    from ropes3d_tpu.camera import Intrinsics
    from ropes3d_tpu.config import ROBUST_EARLY_STOP_SCALE
    from ropes3d_tpu.prediction.engine import CandidateEvaluator
    from ropes3d_tpu.robot import URDFReader

    engine, _, _ = setup
    assert engine.robust_tau is None
    assert engine._early_stop(0.1) == 0.1
    robust = CandidateEvaluator(
        CAM, Intrinsics("640_480_color_16"), urdf=URDFReader(), robust_tau=0.1
    )
    assert robust._early_stop(0.1) == 0.1 * ROBUST_EARLY_STOP_SCALE


def test_grid_sweep_finds_coupled_wrist(setup):
    """GridSweep over (R, B) recovers a wrist pose a 1-D R sweep cannot:
    starting from R=B=0, R's error landscape is flat (the forearm is
    near-symmetric about its roll axis at B=0), but the R x B grid scores
    R jointly with B and lands in the true basin."""
    import jax.numpy as jnp

    from ropes3d_tpu.prediction.engine import SearchState
    from ropes3d_tpu.prediction.stages import GridSweep

    engine, target, true_pose = setup
    # Re-target: a pose with a pronounced wrist bend + roll.
    from ropes3d_tpu.camera import Intrinsics
    from ropes3d_tpu.ops.error import TargetBundle
    from ropes3d_tpu.simulation.renderer import Renderer

    wrist_pose = np.array([0.4, 0.1, 0.6, 1.2, 1.0, 0], np.float32)
    rend = Renderer("seg", CAM, Intrinsics("640_480_color_16"))
    rend.setJointAngles(wrist_pose)
    depth, lid = rend.render_ids()
    masks = np.stack([lid == i for i in range(6)])
    tgt = TargetBundle(
        jnp.asarray(masks),
        jnp.asarray(masks * depth[None], jnp.float32),
        jnp.asarray(masks.any((1, 2))),
        jnp.asarray(depth, jnp.float32),
    )
    start = wrist_pose.copy()
    start[3] = start[4] = 0.0
    state = SearchState.fresh()._replace(angles=jnp.asarray(start))
    out = engine.grid_sweep(state, tgt, GridSweep(6, (13, 13), "RB"))
    got = np.asarray(out.angles)
    # Grid resolution bounds the residual: limits span / 12 per axis.
    lim = np.asarray(engine.u_reader.joint_limits)
    res_r = (lim[3, 1] - lim[3, 0]) / 12
    res_b = (lim[4, 1] - lim[4, 0]) / 12
    assert abs(got[3] - wrist_pose[3]) <= res_r
    assert abs(got[4] - wrist_pose[4]) <= res_b
    # S, L, U untouched.
    np.testing.assert_allclose(got[:3], start[:3], atol=1e-6)


def test_descent_monotone_holds_truth(setup):
    """A descent seeded AT the true pose must stay there.  The reference's
    always-step rule (predict.py:188-221) walks out of sharp minima (both
    probes worse -> still moves); monotone acceptance rejects such moves.
    Regression for the round-5 wrist-drift finding (descent-from-truth
    drifted up to 17 deg in B before the fix)."""
    import jax.numpy as jnp

    from ropes3d_tpu.prediction.engine import SearchState
    from ropes3d_tpu.prediction.stages import Descent

    engine, target, true_pose = setup
    for jacobi in (False, True):
        state = SearchState.fresh()._replace(angles=jnp.asarray(true_pose))
        out = engine.descent(
            state, target, Descent(6, 20, "SLU", early_stop_thresh=0.0),
            jacobi=jacobi,
        )
        drift = np.abs(np.asarray(out.angles) - true_pose)
        min_inc = float(np.max(np.asarray(engine.min_ang_inc)))
        assert drift.max() <= min_inc + 1e-6, (jacobi, drift)
