"""Intrinsics, pose-convention, and config-layer tests."""

import json
import os

import numpy as np

from ropes3d_tpu.camera import Intrinsics, camera_matrices, make_pose, pose_to_camera_matrix
from ropes3d_tpu.compact_json import CompactJSONEncoder
from ropes3d_tpu.config import DEFAULT_RENDER_COLORS, Paths, default_render_color_maker
from ropes3d_tpu.utils import str_to_arr, get_extremes


def test_intrinsics_presets():
    i = Intrinsics("1280_720_color")
    assert i.resolution == (1280, 720)
    assert i.pp == (638.391, 361.493)
    assert i.f == (905.23, 904.858)
    assert i.width == 1280 and i.height == 720
    assert i.size == 1280 * 720


def test_intrinsics_downscale_preset_suffix():
    i = Intrinsics("1280_720_color_8")
    assert i.resolution == (160, 90)
    np.testing.assert_allclose(i.pp, (638.391 / 8, 361.493 / 8))
    j = Intrinsics("1280_720_color")
    j.downscale(8)
    assert i == j


def test_intrinsics_string_roundtrip():
    i = Intrinsics("640_480_depth")
    s = str(i)
    j = Intrinsics(s)
    assert i.resolution == j.resolution
    np.testing.assert_allclose(i.pp, j.pp)
    np.testing.assert_allclose(i.f, j.f)
    assert i.model == j.model
    assert str(j) == s


def test_intrinsics_parses_dataset_json_format():
    # Format stored in recorded dataset JSONs (reference examples/).
    s = "[ 640x480  p[308.101 241.419]  f[614.685 614.807]  Inverse Brown Conrady [0 0 0 0 0] ]"
    i = Intrinsics(s)
    assert i.resolution == (640, 480)
    np.testing.assert_allclose(i.pp, (308.101, 241.419))
    np.testing.assert_allclose(i.f, (614.685, 614.807))
    assert i.model == "Inverse Brown Conrady"


def test_make_pose_zyx_convention():
    # Pure yaw rotates x toward y (reference render_utils.py:56-83).
    T = make_pose(1, 2, 3, 0, 0, np.pi / 2)
    np.testing.assert_allclose(T[:3, 3], [1, 2, 3], atol=1e-12)
    np.testing.assert_allclose(T[:3, :3] @ [1, 0, 0], [0, 1, 0], atol=1e-12)


def test_default_camera_convention():
    """Default pose [0,-1.5,.75,0,0,0] looks along world +Y with +Z up."""
    c2w = pose_to_camera_matrix([0, -1.5, 0.75, 0, 0, 0])
    view_dir = c2w[:3, :3] @ [0, 0, -1]  # camera looks along local -Z
    np.testing.assert_allclose(view_dir, [0, 1, 0], atol=1e-9)
    up = c2w[:3, :3] @ [0, 1, 0]
    np.testing.assert_allclose(up, [0, 0, 1], atol=1e-9)
    np.testing.assert_allclose(c2w[:3, 3], [0, -1.5, 0.75])


def test_world_to_camera_inverse():
    pose = [0.2, -1.3, 0.9, 0.05, -0.1, 0.3]
    c2w, w2c = camera_matrices(pose)
    np.testing.assert_allclose(w2c @ c2w, np.eye(4), atol=1e-10)
    # A world point straight ahead of the camera maps to -Z in camera frame.
    p_w = c2w @ np.array([0, 0, -1.0, 1])
    p_c = w2c @ p_w
    np.testing.assert_allclose(p_c[:3], [0, 0, -1.0], atol=1e-10)


def test_render_colors_unique_blue():
    colors = default_render_color_maker(7)
    blues = [c[0] for c in colors]
    assert len(set(blues)) == 7
    assert DEFAULT_RENDER_COLORS == colors


def test_str_to_arr():
    np.testing.assert_array_equal(str_to_arr("SLU"), [1, 1, 1, 0, 0, 0])
    np.testing.assert_array_equal(str_to_arr("t"), [0, 0, 0, 0, 0, 1])


def test_get_extremes():
    m = np.zeros((10, 12), bool)
    m[2:5, 3:9] = True
    assert get_extremes(m) == [2, 4, 3, 8]


def test_paths_registry(tmp_path):
    p = Paths(root=str(tmp_path))
    p.create()
    assert os.path.isdir(os.path.join(str(tmp_path), "data"))
    p.set("URDF", "urdfs/foo.urdf")
    q = Paths(root=str(tmp_path))
    assert q.URDF.endswith("urdfs/foo.urdf")
    with open(os.path.join(str(tmp_path), "data", "paths.json")) as f:
        assert json.load(f)["URDF"] == "urdfs/foo.urdf"


def test_compact_json():
    enc = CompactJSONEncoder(max_width=90, indent=4)
    out = enc.encode({"a": [1, 2, 3], "b": {"c": np.float64(1.5), "d": np.arange(3)}})
    parsed = json.loads(out)
    assert parsed == {"a": [1, 2, 3], "b": {"c": 1.5, "d": [0, 1, 2]}}
    assert '"a": [1, 2, 3]' in out  # small containers on one line
