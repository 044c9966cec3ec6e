"""URDF parsing for the active robot.

Superset of the reference's ``robotpose/urdf.py:25-100``: in addition to mesh
paths/names and joint limits, this parser extracts each revolute joint's
origin translation/rotation and rotation axis so forward kinematics can be
evaluated natively in JAX (the reference delegated FK to Klamp't C++;
``robotpose/simulation/kinematics.py:17-55``).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import List, Optional

import numpy as np

from ..config import MAX_LINKS, Paths


def _floats(s: Optional[str], default: str = "0 0 0") -> np.ndarray:
    return np.array([float(x) for x in (s or default).split()])


class KinematicChain:
    """Static description of a serial chain parsed from a URDF.

    Attributes
    ----------
    joint_origins : (J, 3) translation of each joint frame in its parent frame
    joint_rpys : (J, 3) fixed roll/pitch/yaw of each joint frame
    joint_axes : (J, 3) rotation axis of each revolute joint (child frame)
    joint_limits : (J, 2) lower/upper joint limits in radians
    """

    def __init__(self, origins, rpys, axes, limits):
        self.joint_origins = np.asarray(origins, dtype=np.float32)
        self.joint_rpys = np.asarray(rpys, dtype=np.float32)
        self.joint_axes = np.asarray(axes, dtype=np.float32)
        self.joint_limits = np.asarray(limits, dtype=np.float64)

    @property
    def num_joints(self) -> int:
        return self.joint_origins.shape[0]


class URDFReader:
    """Retrieves information from the active URDF (reference urdf.py:25-100).

    The active URDF is registered in ``data/paths.json`` under key ``URDF``.
    """

    def __init__(self, path: str = None):
        self._explicit_path = path
        if self._get_path():
            self.load()

    def _get_path(self) -> bool:
        if self._explicit_path is not None:
            self.internal_path = self._explicit_path
            return True
        p = Paths()
        if "URDF" in p:
            self.internal_path = p.URDF
            return True
        return False

    def load(self) -> None:
        """Parse mesh paths/names, joint limits, and the kinematic chain."""
        tree = ET.parse(self.internal_path)
        root = tree.getroot()

        links = root.findall("link")[:MAX_LINKS]
        mesh_rel = []
        self.mesh_names: List[str] = []
        for link in links:
            self.mesh_names.append(link.get("name"))
            vis = link.find("visual")
            if vis is not None:
                mesh_rel.append(
                    vis.find("geometry").find("mesh").get("filename")
                )
            else:
                mesh_rel.append(None)

        # Resolve package:// mesh URIs under the URDFS directory; prefer an
        # existing case variant of the .stl extension (reference urdf.py:50-54
        # switched on platform; here we just probe the filesystem).
        urdf_dir = Paths().URDFS if self._explicit_path is None else os.path.dirname(
            os.path.dirname(os.path.dirname(self.internal_path))
        )
        self.mesh_paths: List[str] = []
        for rel in mesh_rel:
            if rel is None:
                self.mesh_paths.append(None)
                continue
            base = os.path.join(urdf_dir, rel.replace("package://", ""))
            candidates = [base]
            stem, ext = os.path.splitext(base)
            for alt in (".stl", ".STL"):
                if alt != ext:
                    candidates.append(stem + alt)
            self.mesh_paths.append(
                next((c for c in candidates if os.path.isfile(c)), base)
            )

        joints = [j for j in root.findall("joint") if j.get("type") == "revolute"][:6]
        origins, rpys, axes, limits = [], [], [], []
        for joint in joints:
            origin = joint.find("origin")
            origins.append(_floats(origin.get("xyz") if origin is not None else None))
            rpys.append(_floats(origin.get("rpy") if origin is not None else None))
            axes.append(_floats(joint.find("axis").get("xyz"), "0 0 1"))
            lim = joint.find("limit")
            limits.append([float(lim.get("lower")), float(lim.get("upper"))])

        self.chain = KinematicChain(origins, rpys, axes, limits)
        self.joint_limits = np.array(limits)

    # ------------------------------------------------------------ registry
    @property
    def available_paths(self) -> List[str]:
        p = Paths()
        return [
            os.path.join(r, x)
            for r, _, files in os.walk(p.URDFS)
            for x in files
            if x.endswith(".urdf")
        ]

    @property
    def available_names(self) -> List[str]:
        return [os.path.basename(x).replace(".urdf", "") for x in self.available_paths]

    @property
    def path(self) -> Optional[str]:
        return self.internal_path if self._get_path() else None

    @path.setter
    def path(self, urdf_path: str) -> None:
        Paths().set("URDF", urdf_path)
        self._explicit_path = None
        if self._get_path():
            self.load()

    @property
    def name(self) -> Optional[str]:
        if self._get_path():
            return os.path.basename(os.path.normpath(self.internal_path)).replace(
                ".urdf", ""
            )
        return None
