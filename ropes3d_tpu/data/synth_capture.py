"""Synthetic capture recorder: render a pose sweep into a raw capture zip.

The reference collects real RGBD captures with a planned pose grid
(``collection_planner.py``, ``robotpose/training/planning.py``) and compiles
them via Builder.  This module simulates that collection against the
device renderer, producing a byte-format-identical raw zip (per-frame
``NNNN.json``/``.npy``/``.png`` triplets, reference building.py:128-161) so
the entire downstream pipeline — Builder, Dataset, annotation, training,
batch prediction — can be exercised at dataset scale without a robot.
"""

from __future__ import annotations

import json
import os
import zipfile
from typing import Optional

import numpy as np

from ..config import DEFAULT_CAMERA_POSE, Paths
from ..robot import URDFReader

_JOINT_NAMES = ["joint_1_s", "joint_2_l", "joint_3_u", "joint_4_r",
                "joint_5_b", "joint_6_t"]


def record_synthetic_dataset(
    name: str,
    n_frames: int = 240,
    camera_pose=DEFAULT_CAMERA_POSE,
    base_intrin: str = "640_480_color",
    do_angles: str = "SLU",
    mode: str = "seg",
    depth_scale: float = 0.0001,
    noisy_grid: bool = True,
    seed: int = 0,
    build: bool = True,
) -> str:
    """Render ``n_frames`` planned poses into ``data/raw/<name>.zip``.

    ``mode='seg'`` gives exact-palette frames (color_dict prediction path);
    ``mode='real'`` gives shaded renders for the neural path.  Returns the
    zip path; with ``build`` the compiled h5 dataset is produced too.
    """
    from ..camera import Intrinsics
    from ..simulation.renderer import Renderer
    from ..training.planning import Planner
    from ..utils import str_to_arr

    urdf = URDFReader()
    intr = Intrinsics(base_intrin)
    rend = Renderer(mode, np.asarray(camera_pose, float), intr)

    planner = Planner()
    sel = str_to_arr(do_angles)
    per_joint = max(2, int(np.ceil(n_frames ** (1 / max(sel.sum(), 1)))))
    divisions = np.where(sel, per_joint, 1)
    np.random.seed(seed)
    grid = planner.noisyGrid(divisions) if noisy_grid else planner.basicGrid(divisions)
    reps = -(-n_frames // len(grid))
    poses = np.tile(grid, (reps, 1))[:n_frames]

    # Depth intrinsics string: reuse the color string (synthetic capture has
    # aligned depth by construction).
    intrin_str = str(intr)

    p = Paths()
    p.create()
    raw_dir = p.RAW_DATA
    os.makedirs(raw_dir, exist_ok=True)
    zip_path = os.path.join(raw_dir, f"{name}.zip")

    import cv2

    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        for i, ang in enumerate(poses):
            rend.setJointAngles(ang)
            color, depth = rend.render()
            depth_u16 = np.clip(depth / depth_scale, 0, 65535).astype(np.uint16)
            frame = {
                "objects": [
                    {
                        "joints": [
                            {
                                "angle": float(ang[j]),
                                "name": _JOINT_NAMES[j],
                                "position": [0.0, 0.0, 0.0],
                            }
                            for j in range(6)
                        ]
                    }
                ],
                "realsense_info": [
                    {
                        "depth_scale": depth_scale,
                        "intrin_color": intrin_str,
                        "intrin_depth": intrin_str,
                    }
                ],
            }
            z.writestr(f"{i:05d}.json", json.dumps(frame))
            import io

            buf = io.BytesIO()
            np.save(buf, depth_u16)
            z.writestr(f"{i:05d}.npy", buf.getvalue())
            ok, png = cv2.imencode(".png", color)
            assert ok
            z.writestr(f"{i:05d}.png", png.tobytes())
            if (i + 1) % 50 == 0:
                print(f"recorded {i + 1}/{n_frames}", flush=True)

    if build:
        from .dataset import Dataset

        Dataset(name, rebuild=True)
    return zip_path
