"""Synthetic closed-loop evaluation harness.

Parity port of ``robotpose/prediction/synthetic.py:11-75``: renders the
robot at a known (random or given) pose, feeds the perfect render back into
the predictor via the color_dict branch (bypassing segmentation), and
reports (actual, predicted) pairs.  This is the de-facto integration test
of the whole pipeline (SURVEY.md §4.1) and the driver of the ≤0.5°
best-case-accuracy target.
"""

from __future__ import annotations

import numpy as np

from ..robot import URDFReader
from ..simulation.noise import NoiseMaker
from ..simulation.renderer import Renderer
from ..utils import str_to_arr
from .predictor import Predictor


class SyntheticPredictor:
    def __init__(
        self,
        camera_pose,
        base_intrin: str,
        ds_factor: int,
        do_angles: str,
        noise: bool = False,
        seed: int = None,
        **predictor_kwargs,
    ):
        self.renderer = Renderer(camera_pose=camera_pose, camera_intrin=base_intrin)
        self.predictor = Predictor(
            camera_pose,
            ds_factor,
            do_angles=do_angles,
            base_intrin=base_intrin,
            color_dict=self.renderer.color_dict,
            **predictor_kwargs,
        )
        self.urdf_reader = URDFReader()
        self.do_angles = do_angles
        self.rng = np.random.default_rng(seed)
        self.noise = NoiseMaker(self.rng)
        self.do_noise = noise

    def run(self, pose=None):
        if pose is None:
            pose = self._generatePose()
        if self.do_noise:
            # Host path: the noise model operates on the host depth map.
            self.renderer.setJointAngles(pose)
            color, depth = self.renderer.render()
            depth = self.noise.holes(depth)
            predicted = self.predictor.run(color, depth)
        else:
            # Fully-fused device path: ground-truth render -> target prep ->
            # staged search compile into ONE program, so a frame is a single
            # dispatch + a 6-float read-back (the read-back round trip
            # dominates on remote-attached chips).
            import jax.numpy as jnp

            p = self.predictor
            if p._lookup_mesh is not None:
                # Sharded lookup: render device maps, then the predictor's
                # split (lookup dispatch + seeded recipe) path.
                d, l = self.renderer.render_batch_angles(
                    np.asarray(pose, np.float32)[None]
                )
                predicted = p.run_synthetic(d[0], l[0])
            else:
                if not hasattr(self, "_fused"):
                    self._fused = self._build_fused(p.lookup_topk)
                predicted = np.asarray(
                    self._fused(
                        jnp.asarray(pose, jnp.float32),
                        p.lookup_depth,
                        p.lookup_angles,
                    ),
                    dtype=float,
                )
        return pose, predicted

    def _build_fused(self, topk: int):
        """Compose render + prep + recipe into one jitted program."""
        import jax
        import jax.numpy as jnp

        from ..ops.rasterizer import render_batch
        from .engine import _stage_key

        rend, p = self.renderer, self.predictor
        p._setStages()
        recipe = p.engine._recipe_fn(
            _stage_key(p.stages),
            topk,
            p.search_mode == "fast",
            False,
            p.history_length,
        )
        prep = p._synth_prep_core()
        h, w = rend.resolution
        num_links = rend.num_links
        link_mask = np.ones(num_links, bool)
        fk = rend._fk
        verts, ids, valid = rend._verts, rend._link_ids, rend._valid
        w2c_full = rend._w2c
        # Host floats (not a device pull — tiny D2H transfers can be
        # pathologically slow on remote transports).
        ii = rend.intrinsics
        intrin_full = np.array(
            [ii.f[0], ii.f[1], ii.pp[0], ii.pp[1]], np.float32
        )
        cam_vec = jnp.asarray(p.camera_pose, jnp.float32)

        @jax.jit
        def fused(pose, lookup_depth, lookup_angles):
            poses = fk(pose[None])[:, :num_links]
            depth, lid = render_batch(
                poses, jnp.asarray(link_mask), verts, ids, valid,
                w2c_full, jnp.asarray(intrin_full), h, w,
            )
            bundle, crop = prep(depth[0], lid[0])
            return recipe(
                p.engine._w2c, cam_vec, bundle, crop, lookup_depth,
                lookup_angles,
            )

        return fused

    def _generatePose(self) -> np.ndarray:
        lim = self.urdf_reader.joint_limits
        selection = self.rng.uniform(lim[:, 0], lim[:, 1])
        return selection * str_to_arr(self.do_angles)

    def run_batch(self, number: int, file: str = "synth_test") -> np.ndarray:
        if not file.endswith(".npy"):
            file += ".npy"
        results = np.zeros((2, number, 6))
        for i in range(number):
            results[0, i], results[1, i] = self.run()
            if i % 250 == 0:
                np.save(file, results)
        np.save(file, results)
        return results

    def run_batch_poses(self, poses: np.ndarray, file: str = "synth_test") -> np.ndarray:
        if not file.endswith(".npy"):
            file += ".npy"
        results = np.zeros((2, len(poses), 6))
        for i in range(len(poses)):
            results[0, i], results[1, i] = self.run(poses[i])
            if i % 250 == 0:
                np.save(file, results)
        np.save(file, results)
        return results
