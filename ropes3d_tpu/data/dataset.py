"""Dataset registry and h5-backed dataset access.

Parity port of ``robotpose/data/dataset.py:27-246``: ``DatasetInfo`` scans
raw zips and compiled h5 files into ``data/datasets.json``;  ``Dataset``
exposes the compiled arrays, (re)builds from zip with camera-pose
preservation, and round-trips camera poses through npy files.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
import zipfile
from typing import List, Optional

import h5py
import numpy as np

from ..compact_json import CompactJSONEncoder
from ..config import Paths
from .building import Builder


class DatasetInfo:
    """Scans for datasets and maintains data/datasets.json."""

    def __init__(self):
        self._update()

    def _update(self) -> None:
        p = Paths()
        os.makedirs(p.RAW_DATA, exist_ok=True)
        os.makedirs(p.DATASETS, exist_ok=True)
        uncompiled = [
            os.path.join(p.RAW_DATA, x)
            for x in os.listdir(p.RAW_DATA)
            if x.endswith(".zip")
        ]
        compiled = [
            os.path.join(r, x)
            for r, _, files in os.walk(p.DATASETS)
            for x in files
            if x.endswith(".h5") and "crop" not in x
        ]
        self.data = {
            "uncompiled": {
                os.path.basename(x).replace(".zip", ""): x for x in uncompiled
            },
            "compiled": {
                os.path.basename(x).replace(".h5", ""): x for x in compiled
            },
        }
        self._write()

    def _write(self) -> None:
        # Retry on transient file contention (reference dataset.py:55-61).
        for _ in range(10):
            try:
                with open(Paths().DATASET_INFO_JSON, "w") as f:
                    f.write(CompactJSONEncoder(indent=4).encode(self.data))
                return
            except PermissionError:
                time.sleep(0.2)

    @property
    def unique_sets(self) -> List[str]:
        names = set(self.data["uncompiled"]) | set(self.data["compiled"])
        return sorted(names)

    @property
    def compiled_sets(self) -> List[str]:
        return sorted(self.data["compiled"])

    def __str__(self):
        return json.dumps(self.data, indent=2)


class Dataset:
    """h5-backed dataset with lazy array access.

    Arrays: angles [N,6], positions [N,6,3], depthmaps [N,H,W],
    og_img [N,H,W,3], preview_img, camera_pose [N,6]; attrs include
    intrinsics strings and depth_scale (schema per building.py).
    """

    def __init__(self, name: str, rebuild: bool = False, permissions: str = "r"):
        self.name = name
        self.permissions = permissions
        info = DatasetInfo()
        compiled = info.data["compiled"]
        uncompiled = info.data["uncompiled"]

        if name in compiled and not rebuild:
            self.path = compiled[name]
        elif name in uncompiled:
            self.path = self.build_from_zip(uncompiled[name], name)
        elif name in compiled:
            # rebuild requested but no zip: keep existing
            self.path = compiled[name]
        else:
            matches = [n for n in info.unique_sets if n.startswith(name)]
            if len(matches) == 1:
                return self.__init__(matches[0], rebuild, permissions)
            raise KeyError(
                f"Dataset {name!r} not found; available: {info.unique_sets}"
            )
        self.load()

    # ------------------------------------------------------------ build
    def build_from_zip(self, zip_path: str, name: str) -> str:
        """Extract + compile, preserving camera poses across rebuilds
        (reference dataset.py:141-174 keeps the old h5 until success)."""
        dest_dir = os.path.join(Paths().DATASETS, name)
        old_h5 = os.path.join(dest_dir, name + ".h5")
        old_poses = None
        backup = None
        if os.path.isfile(old_h5):
            with h5py.File(old_h5, "r") as f:
                old_poses = np.copy(f["images/camera_poses"])
            backup = old_h5.replace(".h5", "_old.h5")
            os.replace(old_h5, backup)
        try:
            with tempfile.TemporaryDirectory() as tmp:
                with zipfile.ZipFile(zip_path) as z:
                    z.extractall(tmp)
                path = Builder().build_full(tmp, name)
            if old_poses is not None:
                with h5py.File(path, "a") as f:
                    n = min(len(old_poses), f["images/camera_poses"].shape[0])
                    f["images/camera_poses"][:n] = old_poses[:n]
        except Exception:
            if backup:
                os.replace(backup, old_h5)
            raise
        if backup and os.path.isfile(backup):
            os.remove(backup)
        return path

    # ------------------------------------------------------------ access
    def load(self) -> None:
        self.file = h5py.File(self.path, self.permissions)
        self.attrs = dict(self.file.attrs)
        self.length = int(self.attrs["length"])
        self.angles = self.file["angles"]
        self.positions = self.file["positions"]
        self.depthmaps = self.file["coordinates/depthmaps"]
        self.og_img = self.file["images/original"]
        self.preview_img = self.file["images/preview"]
        self.camera_pose = self.file["images/camera_poses"]
        self.depth_scale = self.attrs["depth_scale"]

    @property
    def intrinsics(self) -> str:
        return self.attrs["color_intrinsics"]

    @property
    def link_anno_path(self) -> str:
        return os.path.join(os.path.dirname(self.path), "link_annotations")

    def __len__(self) -> int:
        return self.length

    def close(self) -> None:
        if hasattr(self, "file") and self.file:
            try:
                self.file.close()
            except Exception:
                pass
            self.file = None

    def __del__(self):
        self.close()

    # ------------------------------------------------------------ poses
    def setCameraPose(self, idx, pose) -> None:
        assert self.permissions in ("a", "r+", "w"), "Dataset opened read-only"
        self.camera_pose[idx] = pose

    def exportCameraPose(self, path: str = None) -> str:
        path = path or os.path.join(
            os.path.dirname(self.path), f"{self.name}_camera_poses.npy"
        )
        np.save(path, np.asarray(self.camera_pose))
        return path

    def importCameraPose(self, path: str) -> None:
        poses = np.load(path)
        assert self.permissions in ("a", "r+", "w"), "Dataset opened read-only"
        n = min(len(poses), self.length)
        self.camera_pose[:n] = poses[:n]
