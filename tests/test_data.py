"""Data pipeline tests: raw capture -> zip -> h5 dataset -> annotation."""

import json
import os
import zipfile

import numpy as np
import pytest


INTRIN_COLOR = "[ 640x480  p[308.101 241.419]  f[614.685 614.807]  Inverse Brown Conrady [0 0 0 0 0] ]"
INTRIN_DEPTH = "[ 640x480  p[317.351 234.187]  f[384.446 384.446]  Brown Conrady [0 0 0 0 0] ]"
N_FRAMES = 6


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    """A fake capture zip in a fresh ROPES3D_ROOT."""
    import cv2

    root = tmp_path_factory.mktemp("data_root")
    (root / "data").mkdir()
    with open(root / "data" / "paths.json", "w") as f:
        json.dump(
            {
                "URDFS": os.path.join(os.environ["ROPES3D_REPO"], "urdfs/"),
                "URDF": os.path.join(
                    os.environ["ROPES3D_REPO"],
                    "urdfs/motoman_mh5_support_limited/urdf/mh5l_limited.urdf",
                ),
            },
            f,
        )
    raw = root / "capture"
    raw.mkdir()
    rng = np.random.default_rng(0)
    for i in range(N_FRAMES):
        ang = rng.uniform(-0.5, 0.5, 6)
        frame = {
            "objects": [
                {
                    "joints": [
                        {"angle": float(ang[j]), "name": f"link_{j}",
                         "position": [float(j), 0.0, 0.0]}
                        for j in range(6)
                    ]
                }
            ],
            "realsense_info": [
                {
                    "depth_scale": 0.001,
                    "intrin_color": INTRIN_COLOR,
                    "intrin_depth": INTRIN_DEPTH,
                }
            ],
        }
        with open(raw / f"{i:04d}.json", "w") as f:
            json.dump(frame, f)
        np.save(raw / f"{i:04d}.npy", rng.integers(0, 3000, (48, 64)).astype(np.uint16))
        cv2.imwrite(str(raw / f"{i:04d}.png"), rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))

    raw_dir = root / "data" / "raw"
    raw_dir.mkdir(parents=True, exist_ok=True)
    zip_path = raw_dir / "testset.zip"
    with zipfile.ZipFile(zip_path, "w") as z:
        for f in sorted(os.listdir(raw)):
            z.write(raw / f, f)

    old = os.environ["ROPES3D_ROOT"]
    os.environ["ROPES3D_ROOT"] = str(root)
    yield str(root)
    os.environ["ROPES3D_ROOT"] = old


def test_dataset_build_and_load(data_root):
    from ropes3d_tpu.data import Dataset, DatasetInfo

    info = DatasetInfo()
    assert "testset" in info.unique_sets
    ds = Dataset("testset")
    assert len(ds) == N_FRAMES
    assert ds.angles.shape == (N_FRAMES, 6)
    assert ds.depthmaps.shape == (N_FRAMES, 48, 64)
    assert ds.og_img.shape == (N_FRAMES, 48, 64, 3)
    assert ds.attrs["color_intrinsics"] == INTRIN_COLOR
    # Depth scaled by depth_scale.
    assert float(np.max(ds.depthmaps)) < 3.1
    assert ds.camera_pose.shape == (N_FRAMES, 6)
    ds.close()


def test_dataset_name_prefix_match(data_root):
    from ropes3d_tpu.data import Dataset

    ds = Dataset("test")  # prefix resolves uniquely
    assert ds.attrs["name"] == "testset"
    ds.close()


def test_camera_pose_roundtrip_and_rebuild(data_root):
    from ropes3d_tpu.data import Dataset

    ds = Dataset("testset", permissions="a")
    new_pose = [0.1, -1.2, 0.9, 0, 0, 0.05]
    ds.setCameraPose(0, new_pose)
    p = ds.exportCameraPose()
    ds.close()
    # Rebuild from zip must preserve the stored camera poses.
    ds2 = Dataset("testset", rebuild=True)
    np.testing.assert_allclose(ds2.camera_pose[0], new_pose, atol=1e-6)
    ds2.close()
    ds3 = Dataset("testset", permissions="a")
    ds3.importCameraPose(p)
    np.testing.assert_allclose(ds3.camera_pose[0], new_pose, atol=1e-6)
    ds3.close()


def test_remove_idxs(data_root):
    from ropes3d_tpu.data import Builder, Dataset

    ds = Dataset("testset")
    path = ds.path
    angles0 = np.copy(ds.angles)
    ds.close()
    Builder().remove_idxs(path, [1, 3])
    ds2 = Dataset("testset")
    assert len(ds2) == N_FRAMES - 2
    np.testing.assert_allclose(ds2.angles[1], angles0[2], atol=1e-12)
    ds2.close()


def test_annotator_writes_labelme_json(data_root, tmp_path):
    from ropes3d_tpu.data.annotation import Annotator

    render = np.zeros((48, 64, 3), np.uint8)
    render[10:40, 10:50] = [42, 0, 171]  # one link color blob
    image = np.full((48, 64, 3), 128, np.uint8)
    ann = Annotator({"link_1_s": [42, 0, 171]})
    stem = str(tmp_path / "00000")
    ann.annotate(image, render, stem)
    with open(stem + ".json") as f:
        data = json.load(f)
    assert data["shapes"], "no polygons emitted"
    assert data["shapes"][0]["label"] == "link_1_s"
    pts = np.array(data["shapes"][0]["points"])
    assert pts.shape[1] == 2 and pts.shape[0] >= 20
    assert os.path.isfile(stem + ".png")


def test_verifier_remove(data_root):
    """Headless Verifier: frame deletion through Builder.remove_idxs."""
    from ropes3d_tpu.data import Dataset
    from ropes3d_tpu.data.verification import Verifier

    n_before = len(Dataset("testset"))
    v = Verifier("testset")
    v.remove([0])
    assert len(v.ds) == n_before - 1
    v.remove([])  # no-op
    assert len(v.ds) == n_before - 1


def test_aligner_sections_and_moves(data_root):
    """Headless Aligner core: section detection, keyboard moves, per-section
    pose write-back, step ladder."""
    from ropes3d_tpu.simulation.aligner import Aligner

    a = Aligner("testset")
    n = len(a.ds)
    for i in range(n):  # earlier tests may have perturbed frame poses
        a.ds.setCameraPose(i, [0, -1.5, 0.75, 0, 0, 0])
    assert a.sections == [(0, n)]  # uniform poses -> one section
    p0 = a.pose.copy()
    a.move("w")  # +y by current step
    assert a.pose[1] == pytest.approx(p0[1] + a.step)
    # Whole section updated.
    for i in range(n):
        np.testing.assert_allclose(a.ds.camera_pose[i], a.pose, atol=1e-9)
    # Step ladder.
    s = a.step
    a.move("+")
    assert a.step > s
    a.move("-")
    assert a.step == s
    # Distinct pose on frame 0 splits sections.
    a.ds.setCameraPose(0, p0 + 0.5)
    assert len(a.sections) == 2
    a.ds.close()


def test_splitter(data_root, tmp_path):
    from ropes3d_tpu.data.annotation import Splitter

    base = tmp_path / "anno"
    base.mkdir()
    for i in range(10):
        (base / f"{i:05d}.json").write_text("{}")
        (base / f"{i:05d}.png").write_text("x")
    sp = Splitter(str(base))
    sp.split(0.6, 0.2)
    r = sp.ratios
    assert abs(r["train"] - 0.6) < 0.11
    assert abs(r["test"] - 0.2) < 0.11
    # Files physically moved.
    assert len(os.listdir(base / "train")) == round(r["train"] * 10) * 2
    # Resplit with same ratios no-ops.
    manifest_before = dict(sp.manifest)
    sp.resplit(0.6, 0.2)
    assert sp.manifest == manifest_before
