"""Tests for analysis, coupling, feeds, planning, camera-pose search, CLI."""

import json
import os
import threading
import time

import numpy as np
import pytest


def test_grapher_b_correction():
    from ropes3d_tpu.prediction.analysis import Grapher

    actual = np.zeros((3, 6))
    actual[:, 4] = np.radians([170, -170, 10])
    pred = np.zeros((3, 6))
    pred[:, 4] = np.radians([-185, 185, 12])  # wrapped by ±360-ish
    g = Grapher("SLURB", pred, actual)
    # After correction predictions land near actual (degrees domain).
    err = np.abs(g.predictions[:, 4] - g.true[:, 4])
    assert np.all(err < 20)


def test_joint_distance_zero_for_equal_poses():
    from ropes3d_tpu.prediction.analysis import JointDistance

    jd = JointDistance()
    poses = np.zeros((2, 6))
    d = jd.distance(poses, poses)
    np.testing.assert_allclose(d, 0, atol=1e-5)
    # A 90-degree S rotation moves the wrist far from its zero-pose location.
    a = np.zeros((1, 6))
    b = np.zeros((1, 6))
    b[0, 0] = np.pi / 2
    d = jd.distance(a, b)
    assert d[0, -1] > 0.3


def test_error_stats():
    from ropes3d_tpu.prediction.analysis import error_stats

    err = np.array([[1.0, -2.0], [3.0, 2.0], [1.0, 2.0], [-1.0, -2.0]])
    s = error_stats(err)
    np.testing.assert_allclose(s["mean"], [1.5, 2.0])
    np.testing.assert_allclose(s["max"], [3.0, 2.0])


def test_json_coupling(tmp_path):
    from ropes3d_tpu.prediction.coupling import JSONCoupling

    path = str(tmp_path / "joint_states.json")
    link = JSONCoupling(path, poll_interval=0.01)
    payload = {"objects": [{"joints": [{"angle": 0.1 * i} for i in range(6)]}]}

    def writer():
        time.sleep(0.1)
        with open(path, "w") as f:
            json.dump(payload, f)

    t = threading.Thread(target=writer)
    t.start()
    pose = link.get_pose(timeout=5)
    t.join()
    np.testing.assert_allclose(pose, [0, 0.1, 0.2, 0.3, 0.4, 0.5], atol=1e-9)
    link.reset()
    assert not os.path.isfile(path)
    with pytest.raises(TimeoutError):
        JSONCoupling(str(tmp_path / "missing.json"), poll_interval=0.01).get_pose(
            timeout=0.05
        )


def test_array_feed():
    from ropes3d_tpu.prediction.feed import ArrayFeed

    colors = np.zeros((3, 4, 4, 3), np.uint8)
    depths = np.ones((3, 4, 4))
    f = ArrayFeed(colors, depths)
    c, d = f.get_average(4)
    assert d.shape == (4, 4)
    np.testing.assert_allclose(d, 1.0)


def test_planner_boustrophedon():
    from ropes3d_tpu.training.planning import Planner

    p = Planner()
    grid = p.basicGrid(np.array([3, 3, 1, 1, 1, 1]))
    assert grid.shape == (9, 6)
    # Consecutive poses differ in at most one joint step (travel-minimal).
    diffs = np.abs(np.diff(grid, axis=0))
    assert np.all((diffs > 1e-9).sum(axis=1) == 1)
    lim = p.u_reader.joint_limits
    assert grid[:, 0].min() == pytest.approx(lim[0, 0])
    assert grid[:, 0].max() == pytest.approx(lim[0, 1])
    noisy = p.noisyGrid(np.array([3, 3, 1, 1, 1, 1]))
    assert np.all(noisy[:, 0] >= lim[0, 0]) and np.all(noisy[:, 0] <= lim[0, 1])


def test_spiral_candidates():
    from ropes3d_tpu.prediction.camera_pose import SpiralRenderer

    sp = SpiralRenderer(lambda poses: np.linalg.norm(poses[:, :3] - [1.5, 0, 0.5], axis=1))
    c = sp.candidates()
    assert c.shape == (25 * 10 * 75, 6)
    r = np.sqrt(c[:, 0] ** 2 + c[:, 1] ** 2)
    assert r.min() == pytest.approx(1.0, abs=1e-6)
    assert r.max() == pytest.approx(3.0, abs=1e-6)
    best = sp.run()
    # Minimum of the toy objective is near (1.5, 0, 0.5).
    assert np.linalg.norm(best[:3] - [1.5, 0, 0.5]) < 0.3


def test_w2c_from_pose_matches_host():
    import jax.numpy as jnp

    from ropes3d_tpu.camera import camera_matrices
    from ropes3d_tpu.prediction.camera_pose import w2c_from_pose_jnp

    pose = [0.2, -1.3, 0.9, 0.05, -0.1, 0.3]
    _, w2c_host = camera_matrices(pose)
    w2c_dev = np.asarray(w2c_from_pose_jnp(jnp.asarray(pose, jnp.float32)))
    np.testing.assert_allclose(w2c_dev, w2c_host, atol=1e-5)


def test_collection_planner_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from ropes3d_tpu.cli.collection_planner import run

    grid = run(num=16, file=str(tmp_path / "plan"), angs="SL")
    assert os.path.isfile(tmp_path / "plan.npy")
    assert grid.shape[1] == 6
    assert np.all(grid[:, 2:] == 0)


def test_noise_maker_drops_depth():
    from ropes3d_tpu.simulation.noise import NoiseMaker

    rng = np.random.default_rng(0)
    depth = np.ones((64, 64))
    out = NoiseMaker(rng).holes(depth)
    assert out.shape == depth.shape
    dropped = (out == 0).mean()
    assert 0.0 < dropped < 0.9  # some but not all pixels dropped
