"""Segmentation-loop integration: renders -> dataset -> annotate -> train ->
inference -> full Predictor real-data path (_segmentLoad).

Uses a starved config (tiny model, few steps); the point is the plumbing,
not accuracy — accuracy comes from real training budgets on TPU.
"""

import json
import os
import zipfile

import numpy as np
import pytest

INTRIN = "640_480_color_4"
DS = 4
CAM = [0, -1.5, 0.75, 0, 0, 0]


@pytest.fixture(scope="module")
def seg_root(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("seg_root")
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
    old = os.environ["ROPES3D_ROOT"]
    os.environ["ROPES3D_ROOT"] = str(root)
    import ropes3d_tpu.simulation.crop_cache as cc

    old_budget = cc.CROP_SEC_ALLOTTED_APPROX
    cc.CROP_SEC_ALLOTTED_APPROX = 0.02
    from ropes3d_tpu.config import Paths

    Paths(str(root)).create()

    # --- Fake captures: shaded renders + depth at known poses.
    from ropes3d_tpu.simulation.renderer import Renderer

    rend = Renderer("real", CAM, INTRIN)
    rng = np.random.default_rng(0)
    lim_root = root / "capture"
    lim_root.mkdir()
    from ropes3d_tpu.robot import URDFReader

    lim = URDFReader().joint_limits
    poses = rng.uniform(lim[:, 0], lim[:, 1], (6, 6)) * [1, 1, 1, 0, 0, 0]
    for i, p in enumerate(poses):
        rend.setJointAngles(p)
        color, depth = rend.render()
        frame = {
            "objects": [
                {"joints": [{"angle": float(p[j]), "name": f"j{j}"} for j in range(6)]}
            ],
            "realsense_info": [
                {
                    "depth_scale": 0.001,
                    "intrin_color": str(rend.intrinsics),
                    "intrin_depth": str(rend.intrinsics),
                }
            ],
        }
        with open(lim_root / f"{i:04d}.json", "w") as f:
            json.dump(frame, f)
        np.save(lim_root / f"{i:04d}.npy", (depth * 1000).astype(np.uint16))
        cv2.imwrite(str(lim_root / f"{i:04d}.png"), color)
    (root / "data" / "raw").mkdir(exist_ok=True)
    with zipfile.ZipFile(root / "data" / "raw" / "segset.zip", "w") as z:
        for f in sorted(os.listdir(lim_root)):
            z.write(lim_root / f, f)

    # Pre-create a small lookup so the Predictor doesn't auto-build an
    # HBM-budget-sized one on CPU.
    from ropes3d_tpu.camera import Intrinsics
    from ropes3d_tpu.simulation.lookup import RobotLookupManager

    intr = Intrinsics(INTRIN)
    intr.downscale(DS)
    RobotLookupManager().get(
        str(intr), CAM, 6, "SLU", divisions=np.array([6, 6, 6, 1, 1, 1])
    )

    yield str(root)
    cc.CROP_SEC_ALLOTTED_APPROX = old_budget
    os.environ["ROPES3D_ROOT"] = old


@pytest.mark.slow
def test_full_segmentation_loop(seg_root):
    from ropes3d_tpu.data import Dataset
    from ropes3d_tpu.data.annotation import AutomaticAnnotator

    ds = Dataset("segset")
    assert len(ds) == 6
    ds.close()

    # Annotate from renders.
    anno_dir = AutomaticAnnotator("segset", preview=False).run(
        train_split=0.7, test_split=0.3
    )
    train_dir = os.path.join(anno_dir, "train")
    jsons = [f for f in os.listdir(train_dir) if f.endswith(".json")]
    assert len(jsons) >= 3

    # Train a tiny model for a handful of steps.
    from ropes3d_tpu.training.train_entry import train

    model_dir = train(
        "segset", batch_size=2, num_epochs=1, tiny=True, use_mesh=False, lr=1e-3
    )
    assert os.path.isfile(os.path.join(model_dir, "ModelData.json"))
    ckpts = [d for d in os.listdir(model_dir) if d.startswith("ckpt_")]
    assert ckpts

    # dynamicLoad finds it.
    from ropes3d_tpu.training.model_registry import ModelManager

    ckpt = ModelManager().dynamicLoad(dataset="segset")
    assert ckpt is not None

    # Inference wrapper round-trips the checkpoint.
    from ropes3d_tpu.models.inference import Segmenter
    from ropes3d_tpu.robot import URDFReader

    classes = ["BG"] + URDFReader().mesh_names[:6]
    seg = Segmenter(ckpt, classes)
    ds = Dataset("segset")
    per_link, vis = seg.segment(np.asarray(ds.og_img[0]))
    assert isinstance(per_link, dict)  # contents depend on training quality
    for v in per_link.values():
        assert v["mask"].shape == ds.og_img[0].shape[:2]

    # Full real-data Predictor path (_segmentLoad) executes end to end.
    from ropes3d_tpu.prediction.predictor import Predictor

    pred = Predictor(
        camera_pose=np.asarray(ds.camera_pose[0]),
        ds_factor=DS,
        do_angles="SL",
        base_intrin=ds.attrs["color_intrinsics"],
        model_ds="segset",
        lookup_topk=1,  # single-seed: smallest compile surface (suite budget)
    )
    angles = pred.run(np.asarray(ds.og_img[0]), np.asarray(ds.depthmaps[0]))
    assert angles.shape == (6,)
    assert np.all(np.isfinite(angles))
    ds.close()


def test_bootstrap_base_model(seg_root):
    from ropes3d_tpu.config import Paths
    from ropes3d_tpu.models import MaskRCNNConfig
    from ropes3d_tpu.training.bootstrap import bootstrap_base_model

    path = bootstrap_base_model(
        num_steps=1, batch=2, cfg=MaskRCNNConfig.tiny(),
        intrinsics="640_480_color_8", log_every=1,
    )
    assert os.path.isdir(path)
    assert os.path.lexists(Paths().BASE_MODEL)
    # Loss sanity: the default lane's only exercise of the loss/grad path
    # (the long training loops are slow-lane) — a NaN/inf loss must fail
    # here, not silently ship a broken base model.
    with open(os.path.join(os.path.dirname(path), "metrics.json")) as f:
        metrics = json.load(f)
    losses = {k: v for k, v in metrics.items() if k != "step"}
    assert losses, "bootstrap wrote no loss metrics"
    assert all(np.isfinite(v) for v in losses.values()), losses
