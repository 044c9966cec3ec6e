"""Device-side robot renderer.

API-parity object wrapper over the batched TPU rasterizer, replacing the
reference's pyrender/OpenGL ``Renderer`` (``robotpose/simulation/render.py:
25-163``): same modes (``seg``/``seg_full``/``real``), ``setJointAngles``,
``setCameraPose`` (+pi/2 pitch convention), ``setMaxParts``, ``color_dict``;
``render()`` returns an (RGB uint8, depth float32) pair like the OpenGL
readback.

The crucial difference: the renderer is *batched* — ``render_batch_angles``
takes ``angles[B, 6]`` and renders all candidates in one device dispatch,
which is what the prediction engine uses.  ``render()`` is the B=1
convenience for API parity and tooling.
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import Intrinsics, camera_matrices
from ..config import DEFAULT_RENDER_COLORS, MAX_LINKS
from ..ops.rasterizer import (
    rasterize_shaded,
    render_batch,
    transform_vertices,
    triangle_setup,
    triangle_shade,
)
from ..robot import MeshLoader, URDFReader
from ..robot.kinematics import make_fk


class Renderer:
    """Batched depth/segmentation renderer for the active URDF."""

    def __init__(
        self,
        mode: str = "seg",
        camera_pose: np.ndarray = None,
        camera_intrin: Union[str, Intrinsics] = "1280_720_color",
        suppress_warnings: bool = False,
        intrinsic_ds_factor: int = None,
        max_tris_per_link: int = None,
        include_t: bool = False,
    ):
        self.suppress_warnings = suppress_warnings
        self.u_reader = URDFReader()
        self.intrinsics = Intrinsics(camera_intrin)
        if intrinsic_ds_factor is not None:
            self.intrinsics.downscale(intrinsic_ds_factor)

        self._fk = jax.jit(make_fk(self.u_reader))
        self._loader = MeshLoader(
            include_t=include_t, max_tris_per_link=max_tris_per_link, urdf=self.u_reader
        )
        packed = self._loader.scene
        v, ids, valid = packed.flat_packed()
        self._verts = jnp.asarray(v)
        self._link_ids = jnp.asarray(ids)
        self._valid = jnp.asarray(valid)
        self.num_links = packed.num_links

        self.limit_parts = False
        self.limit_number = self.num_links
        self._angles = np.zeros(6)

        c_pose = camera_pose if camera_pose is not None else [0.04, -1.425, 0.75, 0, -0.02, -0.05]
        self.setCameraPose(c_pose)
        self.setMode(mode)

    # ------------------------------------------------------------ state
    def setCameraPose(self, pose_in: np.ndarray) -> None:
        """Set camera pose 6-vector (applies the +pi/2 pitch convention)."""
        self._camera_pose_vec = np.array(pose_in, dtype=float)
        c2w, w2c = camera_matrices(self._camera_pose_vec)
        self._c2w = c2w
        self._w2c = jnp.asarray(w2c, jnp.float32)

    def setJointAngles(self, angles) -> None:
        self._angles = np.asarray(angles, dtype=float)

    def setMaxParts(self, number_of_parts: Optional[int]) -> None:
        if number_of_parts is not None:
            self.limit_parts = True
            self.limit_number = min(number_of_parts, self.num_links)
        else:
            self.limit_parts = False
            self.limit_number = self.num_links

    def setMode(self, mode: str) -> None:
        valid_modes = ["seg", "seg_full", "real"]
        assert mode in valid_modes, f"Mode invalid; must be one of: {valid_modes}"
        self.mode = mode

    # ------------------------------------------------------------ views
    @property
    def resolution(self) -> Tuple[int, int]:
        return (self.intrinsics.height, self.intrinsics.width)

    @property
    def camera_pose(self) -> np.ndarray:
        """4x4 camera-to-world matrix of the current camera."""
        return self._c2w

    @property
    def _intrin_vec(self) -> jnp.ndarray:
        return jnp.array(
            [
                self.intrinsics.f[0],
                self.intrinsics.f[1],
                self.intrinsics.pp[0],
                self.intrinsics.pp[1],
            ],
            jnp.float32,
        )

    @property
    def link_mask(self) -> jnp.ndarray:
        n = self.limit_number if self.limit_parts else self.num_links
        return jnp.arange(self.num_links) < n

    @property
    def color_dict(self) -> dict:
        """Link name -> RGB color (parity with render.py:155-163)."""
        if self.mode == "seg_full":
            return {"robot": DEFAULT_RENDER_COLORS[0]}
        n = self.limit_number if self.limit_parts else self.num_links
        return {
            name: DEFAULT_RENDER_COLORS[i]
            for i, name in enumerate(self._loader.names[:n])
        }

    @property
    def palette(self) -> np.ndarray:
        return np.array(DEFAULT_RENDER_COLORS[: self.num_links])

    # ------------------------------------------------------------ rendering
    def render_batch_angles(
        self, angles, row0=0, col0=0, h: int = None, w: int = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Render a candidate batch: angles[B, 6] -> (depth, link_id) on device."""
        angles = jnp.asarray(angles, jnp.float32)
        poses = self._fk(angles)[:, : self.num_links]
        hh = h if h is not None else self.intrinsics.height
        ww = w if w is not None else self.intrinsics.width
        return render_batch(
            poses,
            self.link_mask,
            self._verts,
            self._link_ids,
            self._valid,
            self._w2c,
            self._intrin_vec,
            hh,
            ww,
            row0,
            col0,
        )

    def render_ids(self) -> Tuple[np.ndarray, np.ndarray]:
        """Render current pose -> (depth [H,W] f32, link_id [H,W] i32) numpy."""
        depth, lid = self.render_batch_angles(self._angles[None])
        return np.asarray(depth[0]), np.asarray(lid[0])

    def render(self) -> Tuple[np.ndarray, np.ndarray]:
        """Render current pose -> (color uint8 [H,W,3], depth f32 [H,W]).

        Parity with the OpenGL readback (render.py:92-98): seg modes give
        flat per-link colors with unique blue values; real mode gives a
        headlight-shaded grayscale render.
        """
        if self.mode == "real":
            return self._render_real()
        depth, lid = self.render_ids()
        color = np.zeros((*depth.shape, 3), np.uint8)
        hit = lid >= 0
        if self.mode == "seg":
            pal = self.palette
            color[hit] = pal[lid[hit]]
        else:  # seg_full
            color[hit] = DEFAULT_RENDER_COLORS[0]
        return color, depth

    def _render_real(self) -> Tuple[np.ndarray, np.ndarray]:
        poses = self._fk(jnp.asarray(self._angles, jnp.float32)[None])[0][
            : self.num_links
        ]
        cam_verts = transform_vertices(self._verts, self._link_ids, poses, self._w2c)
        valid = self._valid & self.link_mask[self._link_ids]
        fx, fy = self.intrinsics.f
        cx, cy = self.intrinsics.pp
        coeffs, qrange, _, _ = triangle_setup(cam_verts, valid, fx, fy, cx, cy)
        shade = triangle_shade(cam_verts)
        h, w = self.resolution
        depth, lid, shade_map = rasterize_shaded(
            coeffs, qrange, self._link_ids.astype(jnp.int32), shade, h, w
        )
        s = np.asarray(shade_map)
        color = np.stack([(0.15 * 255 + 0.85 * s).astype(np.uint8)] * 3, -1)
        color[np.asarray(lid) < 0] = 0
        return color, np.asarray(depth)


class DatasetRenderer(Renderer):
    """Renderer bound to a dataset (reference render.py:167-186)."""

    def __init__(self, dataset: str, mode: str = "seg", camera_pose: np.ndarray = None):
        from ..data.dataset import Dataset

        self.ds = Dataset(dataset)
        if camera_pose is None:
            camera_pose = self.ds.camera_pose[0]
        super().__init__(mode, camera_pose, self.ds.attrs["color_intrinsics"])

    def render_at(self, idx: int) -> List[np.ndarray]:
        self.setPosesFromDS(idx)
        return self.render()

    def setPosesFromDS(self, idx: int) -> None:
        self.setJointAngles(self.ds.angles[idx])
        self.setCameraPose(self.ds.camera_pose[idx])
