"""Camera-pose predictor tests (abbreviated recipes, CPU-starved config)."""

import numpy as np
import pytest

TRUE_CAM = [0.05, -1.45, 0.8, 0, 0.02, -0.03]
BASE_CAM = [0, -1.5, 0.75, 0, 0, 0]


@pytest.fixture(scope="module")
def frames():
    from ropes3d_tpu.simulation.renderer import Renderer

    rend = Renderer(camera_pose=TRUE_CAM, camera_intrin="640_480_color")
    robot_poses = np.array(
        [[0.3, 0.2, 0.5, 0, 0, 0], [0.8, -0.4, 1.2, 0, 0, 0]]
    )
    colors, depths = [], []
    for p in robot_poses:
        rend.setJointAngles(p)
        c, d = rend.render()
        colors.append(c)
        depths.append(d)
    return rend, robot_poses, np.stack(colors), np.stack(depths)


def test_modeless_error_ordering(frames):
    import jax.numpy as jnp

    from ropes3d_tpu.prediction.camera_pose import ModellessCameraPredictor

    _, robot_poses, colors, depths = frames
    d = depths.copy()
    d[d == 0] = 3.0  # scene background — the modeless metric needs one
    mp = ModellessCameraPredictor(
        base_pose=BASE_CAM, ds_factor=16, base_intrinsics="640_480_color"
    )
    mp.engine.set_robot_poses(robot_poses)
    mp._tgt = jnp.asarray(mp._batch_downsample(d, 16), jnp.float32)
    e_true = mp.error_at(TRUE_CAM)
    e_base = mp.error_at(BASE_CAM)
    e_far = mp.error_at([0.4, -1.2, 1.1, 0, 0.2, 0.2])
    assert e_true < e_base < e_far


@pytest.mark.slow
def test_seg_camera_predictor_converges(frames):
    from ropes3d_tpu.prediction.camera_pose import CameraPredictor

    rend, robot_poses, colors, depths = frames
    cp = CameraPredictor(
        base_pose=BASE_CAM,
        ds_factor=16,
        base_intrinsics="640_480_color",
        color_dict=rend.color_dict,
    )
    # Abbreviated recipe to keep CPU runtime bounded.
    cp._setStages = lambda: setattr(
        cp,
        "stages",
        [
            ["tensorsweep", 10, 0.1, [True, True, True, False, False, False]],
            ["zp_sweep", 10, 0.05],
            ["xya_sweep", 10, 0.05],
            ["smartsweep", 6, 0.05, [False, False, False, True, True, True]],
            ["descent", 8, 0.5, 0.001, [True] * 6, [0.03] * 6],
        ],
    )
    est = cp.run(colors, depths, robot_poses)
    err = np.abs(est - np.array(TRUE_CAM))
    assert np.all(err[:3] < 0.08), f"translation err {err[:3]}"
    assert np.all(err[3:] < 0.08), f"rotation err {err[3:]}"
    assert cp.error_at(TRUE_CAM) < cp.error_at(BASE_CAM)


def test_pair_sweep_and_refine_metric(frames):
    """pair_sweep stage finds the joint (x, yaw) minimum; the truncated-L1
    refine metric must prefer the true pose over perturbed ones (unlike the
    parity heuristic, whose landscape is degenerate in coupled directions)."""
    import jax.numpy as jnp

    from ropes3d_tpu.prediction.camera_pose import _ModellessRefinePredictor

    _, robot_poses, colors, depths = frames
    d = depths.copy()
    d[d == 0] = 2.5
    mp = _ModellessRefinePredictor(
        base_pose=TRUE_CAM, ds_factor=16, base_intrinsics="640_480_color"
    )
    mp.engine.set_robot_poses(robot_poses)
    mp._tgt = jnp.asarray(mp._batch_downsample(d, 16), jnp.float32)
    e_true = mp.error_at(TRUE_CAM)
    # Orbit-coupled perturbation (x shift + compensating yaw) and plain shifts.
    assert e_true < mp.error_at(np.add(TRUE_CAM, [0.08, 0, 0, 0, 0, -0.053]))
    assert e_true < mp.error_at(np.add(TRUE_CAM, [0, 0.05, 0, 0, 0, 0]))
    assert e_true < mp.error_at(np.add(TRUE_CAM, [0, 0, 0.05, -0.03, 0, 0]))

    # pair_sweep stage recovers a coupled offset in one dispatch.
    start = np.add(TRUE_CAM, [0.04, 0, 0, 0, 0, -0.027])
    core = mp.engine._pair_sweep_core("modeless_refine", 9, 0.06, 0.04, 0, 5)
    pose, *_ = core(
        jnp.asarray(start, jnp.float32), jnp.zeros(6), jnp.zeros((5, 6)),
        jnp.zeros(5), mp.engine.link_poses, mp._tgt,
    )
    err0 = np.abs(np.asarray(start) - TRUE_CAM)[[0, 5]]
    err1 = np.abs(np.asarray(pose) - TRUE_CAM)[[0, 5]]
    assert err1.sum() < err0.sum()


@pytest.mark.slow
def test_refine_pass_pulls_toward_truth(frames):
    """A short truncated-L1 refine pass (pair sweep + position block) must
    reduce a coupled x-yaw offset.  (The full-recipe solve measures <2 cm
    translation on TPU at 320x180 — too slow for the 1-core CPU suite.)"""
    import jax.numpy as jnp

    from ropes3d_tpu.prediction.camera_pose import _ModellessRefinePredictor

    _, robot_poses, colors, depths = frames
    d = depths.copy()
    d[d == 0] = 2.5
    start = np.add(TRUE_CAM, [0.06, 0.02, -0.02, 0, 0, -0.04])
    fine = _ModellessRefinePredictor(
        base_pose=start, ds_factor=8, base_intrinsics="640_480_color"
    )
    fine._setStages = lambda: setattr(
        fine,
        "stages",
        [
            ["pair_sweep", 11, 0.08, 0.05, 0, 5],
            ["descent", 8, 0.5, 1e-3, [True, True, True, False, False, False],
             [0.01, 0.01, 0.01, 0, 0, 0]],
        ],
    )
    est = fine.run(colors, depths, robot_poses, starting_camera_pose=start)
    err0 = np.abs(np.asarray(start) - TRUE_CAM)
    err1 = np.abs(np.asarray(est) - TRUE_CAM)
    assert err1[:3].sum() < err0[:3].sum(), (err0, err1)
    assert err1[5] < err0[5]
