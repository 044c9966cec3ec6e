"""Reachable-silhouette crop computation.

Parity port of the reference ``robotpose/crop.py:27-178``: for each
number-of-rendered-links n, render a weighted grid of poses over the
``CROP_VARYING`` joints, accumulate coverage, and store the padded bounding
box in ``lookup/crop_data.h5`` keyed ``urdf/pose/intrinsics`` (same schema,
so keys are content-addressed identically).

TPU difference: the grid is rendered in large device batches through the
batched rasterizer instead of one OpenGL render per pose — the whole crop
calibration takes seconds.  The pose-count budget keeps the reference's
GTX-1070-calibrated formula (crop.py:122-123) purely for grid-size parity.
"""

from __future__ import annotations

from typing import List, Union

import h5py
import numpy as np

from ..config import (
    CROP_MAX_PER_JOINT,
    CROP_PADDING,
    CROP_RENDER_WEIGHTING,
    CROP_SEC_ALLOTTED_APPROX,
    CROP_VARYING,
    MAX_LINKS,
    Paths,
)
from ..camera import Intrinsics
from ..robot import URDFReader
from ..utils import str_to_arr
from .renderer import Renderer

_RENDER_BATCH = 512


def list_to_str(lst) -> str:
    """Uniform list formatting for cache keys (crop.py:90-95)."""
    return "[" + "".join(f" {float(x):.4f}" for x in lst) + " ]"


class Crop:
    """Image-space crop bounds of the robot per rendered-link count.

    ``crop[n] -> [min_r, max_r, min_c, max_c]`` (index 0 = overall max).
    """

    def __init__(self, camera_pose: np.ndarray, intrinsics: Union[str, Intrinsics]):
        self.u_reader = URDFReader()
        self.camera_pose = np.asarray(camera_pose, float)
        self.intrinsics = Intrinsics(intrinsics)
        import os

        os.makedirs(os.path.dirname(Paths().CROP_DATA), exist_ok=True)
        # Keyed by urdf/pose/intrinsics (reference crop.py:30-48 parity) plus
        # the scene tag — crops are rendered from the packed scene, so a
        # mesh-pipeline change must invalidate them (see default_scene_tag).
        from ..robot.mesh import default_scene_tag

        name = (
            f"{self.u_reader.name}/{list_to_str(camera_pose)}/"
            f"{self.intrinsics}/{default_scene_tag()}"
        )
        create = False
        with h5py.File(Paths().CROP_DATA, "a") as f:
            if name not in f:
                f.create_dataset(name, shape=(MAX_LINKS, 4), dtype=int)
                create = True
            elif not np.any(f[name]):
                create = True
        if create:
            self._create(name)
        self.load(name)

    # ------------------------------------------------------------ creation
    def _create(self, name: str) -> None:
        renderer = Renderer("seg", self.camera_pose, self.intrinsics)
        data = np.zeros((MAX_LINKS, 4), int)

        # Base link alone (crop.py:54-58).
        renderer.setMaxParts(1)
        depth, _ = renderer.render_batch_angles(np.zeros((1, 6)))
        data[1] = self._calculate_crop(np.asarray(depth[0]) != 0)

        for num_links in range(2, MAX_LINKS):
            renderer.setMaxParts(num_links)
            angles = self._generate_angles(num_links)
            any_cov = np.zeros(renderer.resolution, bool)
            for i in range(0, len(angles), _RENDER_BATCH):
                d, _ = renderer.render_batch_angles(angles[i : i + _RENDER_BATCH])
                any_cov |= np.asarray((d != 0).any(axis=0))
            data[num_links] = self._calculate_crop(any_cov)

        data[0] = data[-1]
        with h5py.File(Paths().CROP_DATA, "a") as f:
            f[name][:] = data

    def _calculate_crop(self, covered: np.ndarray) -> List[int]:
        """Bounding box of coverage + padding, clamped to the image."""
        r, c = np.where(covered)
        out = np.zeros(4, int)
        out[0] = max(r.min() - CROP_PADDING, 0)
        out[1] = min(r.max() + CROP_PADDING, self.intrinsics.height - 1)
        out[2] = max(c.min() - CROP_PADDING, 0)
        out[3] = min(c.max() + CROP_PADDING, self.intrinsics.width - 1)
        return out

    def _generate_angles(self, num_links: int) -> np.ndarray:
        """Weighted pose grid (identical scheme to crop.py:115-146)."""
        div_weighting = np.array(CROP_RENDER_WEIGHTING[: num_links - 1], float)
        div_weighting = div_weighting / np.sum(div_weighting)

        num_poses = CROP_SEC_ALLOTTED_APPROX / (
            self.intrinsics.size * 1.2e-8 + 0.002
        )
        nz = div_weighting[div_weighting != 0]
        base_div = div_weighting * ((num_poses / np.prod(nz)) ** (1 / len(nz)))
        base_div[base_div < 1] = 1
        base_div[base_div > CROP_MAX_PER_JOINT] = CROP_MAX_PER_JOINT
        base_div = base_div.astype(int)

        divisions = np.ones(6, int)
        divisions[: num_links - 1] = base_div
        num = int(np.prod(divisions))
        angles = np.zeros((num, 6))
        for idx in np.where(str_to_arr(CROP_VARYING))[0]:
            rng = np.linspace(
                self.u_reader.joint_limits[idx, 0],
                self.u_reader.joint_limits[idx, 1],
                divisions[idx],
            )
            repeat = int(np.prod(divisions[:idx]))
            tile = num // (repeat * divisions[idx])
            angles[:, idx] = np.tile(np.repeat(rng, repeat), tile)
        return angles

    # ------------------------------------------------------------ access
    def load(self, name: str) -> None:
        with h5py.File(Paths().CROP_DATA, "r") as f:
            self.data = np.copy(f[name])

    def __getitem__(self, key: int) -> np.ndarray:
        if key is None:
            key = 0
        return self.data[key]

    def size(self, n: int) -> int:
        crop = self.data[n]
        return int((crop[1] - crop[0]) * (crop[3] - crop[2]))

    def shape(self, n: int):
        """(rows, cols) of the cropped image for n links."""
        crop = self.data[n]
        return (int(crop[1] - crop[0] + 1), int(crop[3] - crop[2] + 1))


def applyCrop(mat: np.ndarray, crop) -> np.ndarray:
    """Apply a crop to a single image (crop.py:172-174)."""
    return mat[crop[0] : crop[1] + 1, crop[2] : crop[3] + 1]


def applyBatchCrop(mat: np.ndarray, crop) -> np.ndarray:
    """Apply a crop to an array of images (crop.py:176-178)."""
    return mat[:, crop[0] : crop[1] + 1, crop[2] : crop[3] + 1]
