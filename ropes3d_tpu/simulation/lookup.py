"""Pre-rendered depth lookup tables for coarse pose initialisation.

Parity port of ``robotpose/simulation/lookup.py:30-316`` with TPU-native
generation and budgeting:

- ``RobotLookupCreator`` renders the joint grid *directly into the crop
  window* in large device batches (vs one OpenGL render per pose), writing
  the same ``.h5`` schema (attrs: pose/intrinsics/num_links_rendered/
  angles_changed/divisions/urdf; datasets: angles, gzip'd depth).
- ``RobotLookupInfo`` maintains the ``lookup/lookups.json`` registry with
  intrinsics/pose shortnames.
- ``RobotLookupManager.get`` finds a compatible table or auto-creates one,
  sizing divisions from TPU **HBM** (``parallel/memory.py``) instead of
  nvidia-smi VRAM (reference lookup.py:225, utils.py:21-37).
"""

from __future__ import annotations

import os
import random
import string
from typing import List, Union

import h5py
import numpy as np

from ..compact_json import CompactJSONEncoder
from ..config import (
    LOOKUP_MAX_DIV_PER_LINK,
    LOOKUP_NAME_LENGTH,
    Paths,
)
from ..camera import Intrinsics
from ..parallel.memory import lookup_budget_elements
from ..robot import URDFReader
from ..robot.mesh import default_scene_tag
from ..utils import get_key, str_to_arr
from .crop_cache import Crop
from .renderer import Renderer

_RENDER_BATCH = 512


class RobotLookupCreator(Renderer):
    """Renders and stores a depth lookup grid."""

    def __init__(self, camera_pose: np.ndarray, intrinsics: Union[str, Intrinsics]):
        self.inp_pose = np.asarray(camera_pose, float)
        self.cropper = Crop(camera_pose, intrinsics)
        super().__init__("seg", camera_pose=camera_pose, camera_intrin=intrinsics)

    def load_config(
        self,
        joints_to_render: int,
        angles_to_do: Union[str, np.ndarray],
        divisions: np.ndarray,
    ) -> None:
        self.num_rendered = joints_to_render
        self.setMaxParts(joints_to_render)
        self.crop = self.cropper[joints_to_render]
        self.angles_to_do = (
            str_to_arr(angles_to_do) if isinstance(angles_to_do, str) else angles_to_do
        )
        self.divisions = np.clip(np.array(divisions), 0, LOOKUP_MAX_DIV_PER_LINK)
        self.divisions[~self.angles_to_do] = 1
        self.num = int(np.prod(self.divisions))
        self._generate_angles()

    def _generate_angles(self) -> None:
        """Repeat/tile grid over varying joints (lookup.py:56-66)."""
        self.angles = np.zeros((self.num, 6))
        for idx in np.where(self.angles_to_do)[0]:
            rng = np.linspace(
                self.u_reader.joint_limits[idx, 0],
                self.u_reader.joint_limits[idx, 1],
                self.divisions[idx],
            )
            repeat = int(np.prod(self.divisions[:idx]))
            tile = self.num // (repeat * self.divisions[idx])
            self.angles[:, idx] = np.tile(np.repeat(rng, repeat), tile)

    def _generate_depth_array(self) -> np.ndarray:
        """Render every grid pose into the crop window on device."""
        ch, cw = self.cropper.shape(self.num_rendered)
        row0, col0 = int(self.crop[0]), int(self.crop[2])
        out = np.zeros((self.num, ch, cw), np.float32)
        for i in range(0, self.num, _RENDER_BATCH):
            d, _ = self.render_batch_angles(
                self.angles[i : i + _RENDER_BATCH], row0=row0, col0=col0, h=ch, w=cw
            )
            out[i : i + _RENDER_BATCH] = np.asarray(d)
        return out

    def run(self, file_name: str, preview: bool = False) -> None:
        depth_arr = self._generate_depth_array()
        with h5py.File(file_name, "w") as f:
            f.attrs["pose"] = self.inp_pose
            f.attrs["intrinsics"] = str(self.intrinsics)
            f.attrs["num_links_rendered"] = self.num_rendered
            f.attrs["angles_changed"] = self.angles_to_do
            f.attrs["divisions"] = self.divisions
            f.attrs["urdf"] = self.u_reader.name
            f.attrs["scene"] = self._loader.scene_tag
            f.create_dataset("angles", data=self.angles)
            f.create_dataset(
                "depth", data=depth_arr, compression="gzip", compression_opts=1
            )


class RobotLookupInfo:
    """Registry of available lookup tables -> lookup/lookups.json."""

    def __init__(self) -> None:
        self.update()

    def update(self) -> None:
        self.data = {}
        p = Paths()
        os.makedirs(p.ROBOT_LOOKUPS, exist_ok=True)
        paths = [
            os.path.join(p.ROBOT_LOOKUPS, x)
            for x in os.listdir(p.ROBOT_LOOKUPS)
            if x.endswith(".h5") and os.path.basename(p.CROP_DATA) not in x
        ]
        raw_tables = {}
        for path in paths:
            with h5py.File(path, "r") as f:
                a = dict(f.attrs)
            name = os.path.basename(os.path.normpath(path)).replace(".h5", "")
            raw_tables[name] = a

        for key, tab in raw_tables.items():
            tmp_intrin = Intrinsics(tab["intrinsics"])
            tab["element_number"] = int(tmp_intrin.size * np.prod(tab["divisions"]))
            tab["pose_number"] = int(np.prod(tab["divisions"]))
            tab["intrinsics"] = str(tmp_intrin)
            tab["pose"] = tuple(tab["pose"])
            for attr in ("angles_changed", "divisions"):
                tab[attr] = [int(x) for x in tab[attr]]
            tab["num_links_rendered"] = int(tab["num_links_rendered"])
            tab["urdf"] = str(tab["urdf"])
            tab["scene"] = str(tab.get("scene", "legacy"))

        camera_poses = {x["pose"] for x in raw_tables.values()}
        pose_short = {
            ("P_" + k): v
            for k, v in zip(string.ascii_uppercase[: len(camera_poses)], camera_poses)
        }
        self.data["camera_poses"] = pose_short

        intrins = {x["intrinsics"] for x in raw_tables.values()}
        intrin_short = {
            ("I_" + k): v
            for k, v in zip(string.ascii_uppercase[: len(intrins)], intrins)
        }
        self.data["intrinsics"] = intrin_short

        self.data["lookups"] = {
            intrin: {pose: dict() for pose in pose_short} for intrin in intrin_short
        }
        for table, tab in raw_tables.items():
            intrin = get_key(intrin_short, tab["intrinsics"])
            pose = get_key(pose_short, tab["pose"])
            self.data["lookups"][intrin][pose][table] = tab
        self._write()

    def _write(self) -> None:
        with open(Paths().ROBOT_LOOKUP_INFO, "w") as f:
            f.write(
                CompactJSONEncoder(max_width=90, indent=4)
                .encode(self.data)
                .replace("\\", "/")
            )


class RobotLookupManager(RobotLookupInfo):
    """Loads or creates lookup tables by camera/link/joint criteria."""

    def __init__(self, element_bits: int = 32) -> None:
        self.element_bits = element_bits
        self.u_reader = URDFReader()
        super().__init__()

    def get(
        self,
        intrinsics: Union[str, Intrinsics],
        camera_pose: np.ndarray,
        num_rendered_links: int,
        varying_angles: Union[str, np.ndarray],
        max_elements: int = None,
        max_poses: int = None,
        divisions: np.ndarray = None,
    ) -> List[np.ndarray]:
        """Find a compatible lookup or create one (lookup.py:184-283).

        Returns (angles [N, 6], depths [N, ch, cw]).
        """
        self.update()
        assert (
            sum(x is not None for x in (max_elements, max_poses, divisions)) <= 1
        ), "Only one of max_elements/max_poses/divisions may be given"
        if all(x is None for x in (max_elements, max_poses, divisions)):
            max_elements = lookup_budget_elements(self.element_bits)

        varying = (
            str_to_arr(varying_angles)
            if isinstance(varying_angles, str)
            else varying_angles
        )
        intrinsics = str(Intrinsics(intrinsics))

        create = False
        acceptable = {}
        if intrinsics in self.data["intrinsics"].values():
            intrin_short = get_key(self.data["intrinsics"], intrinsics)
            pose_t = tuple(list(camera_pose))
            if pose_t in self.data["camera_poses"].values():
                pose_short = get_key(self.data["camera_poses"], pose_t)
            else:
                create = True
        else:
            create = True

        if not create:
            acceptable = self.data["lookups"][intrin_short][pose_short]
            acceptable = {
                k: v
                for k, v in acceptable.items()
                if v["num_links_rendered"] == num_rendered_links
                and np.all(np.array([x != 1 for x in v["divisions"]]) == varying)
                and v["urdf"] == self.u_reader.name
                # Scene identity: tables rendered with a different mesh
                # pipeline (e.g. before/after building the native QEM
                # decimator) would mismatch candidate geometry.
                and v.get("scene", "legacy") == default_scene_tag()
            }
            if max_elements is not None:
                acceptable = {
                    k: v
                    for k, v in acceptable.items()
                    if v["element_number"] <= max_elements
                }
            elif max_poses is not None:
                acceptable = {
                    k: v for k, v in acceptable.items() if v["pose_number"] <= max_poses
                }
            elif divisions is not None:
                acceptable = {
                    k: v
                    for k, v in acceptable.items()
                    if v["divisions"] == list(divisions)
                }
            if len(acceptable) == 0:
                create = True

        if create:
            if divisions is None:
                c = Crop(camera_pose, intrinsics)
                if max_poses is None:
                    max_poses = max_elements / (
                        c.size(num_rendered_links) * self.element_bits
                    )
                divisions = np.zeros(6, int)
                divisions[varying] = int(max_poses ** (1 / int(np.sum(varying))))
            name = self.create(
                intrinsics, camera_pose, num_rendered_links, varying, divisions
            )
            self.update()
        else:
            mx = max(x["pose_number"] for x in acceptable.values())
            name = [k for k in acceptable if acceptable[k]["pose_number"] == mx][0]

        return self.load(name)

    def load(self, name: str) -> List[np.ndarray]:
        if not name.endswith(".h5"):
            name += ".h5"
        with h5py.File(os.path.join(Paths().ROBOT_LOOKUPS, name), "r") as f:
            return np.copy(f["angles"]), np.copy(f["depth"])

    def create(
        self,
        intrinsics: Union[str, Intrinsics],
        camera_pose: np.ndarray,
        num_rendered_links: int,
        varying_angles,
        divisions: np.ndarray,
    ) -> str:
        creator = RobotLookupCreator(camera_pose, intrinsics)
        creator.load_config(num_rendered_links, varying_angles, divisions)
        letters = string.ascii_lowercase
        while True:
            name = "".join(random.choice(letters) for _ in range(LOOKUP_NAME_LENGTH)) + ".h5"
            if name not in os.listdir(Paths().ROBOT_LOOKUPS):
                break
        creator.run(os.path.join(Paths().ROBOT_LOOKUPS, name))
        return name
