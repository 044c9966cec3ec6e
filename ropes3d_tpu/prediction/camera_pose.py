"""Camera extrinsics estimation (the inverse problem).

Re-implementation of ``robotpose/prediction/camera_pose_prediction.py``:
given frames with *known* robot joint angles, find the camera pose.  The
TPU design batches over candidate *camera poses*: robot link poses per frame
are fixed (FK once), and each candidate contributes a different
world-to-camera matrix, so ``eval(camera_poses[C, 6]) -> err[C]`` renders
all (candidate, frame) pairs in one device dispatch.

Two flavors, with the reference's stage recipes and hyperparameters:
- ``ModellessCameraPredictor`` — depth-only error (camera_pose_prediction.py
  :389-427): sqrt-domain, mean * -std, 1.1**err, mean over frames; plus the
  ``SpiralRenderer`` global spiral-shell search (:434-497).
- ``CameraPredictor`` — segmentation-based multi-frame error (:964-970
  variant: per-link mask+sqrt-depth terms, squared accumulation).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_CAMERA_POSE
from ..camera import Intrinsics
from ..camera.pose import make_pose
from ..ops.interp import cubic_spline_uniform
from ..ops.image import downsample
from ..ops.rasterizer import render_batch
from ..robot import MeshLoader, URDFReader
from ..robot.kinematics import make_fk


def w2c_from_pose_jnp(pose6: jnp.ndarray) -> jnp.ndarray:
    """Camera pose 6-vector -> world-to-camera 4x4, traced (jnp)."""
    c2w = make_pose(
        pose6[0], pose6[1], pose6[2], pose6[3], pose6[4] + jnp.pi / 2, pose6[5],
        xp=jnp,
    )
    R = c2w[:3, :3]
    t = c2w[:3, 3]
    w2c = jnp.eye(4, dtype=c2w.dtype)
    w2c = w2c.at[:3, :3].set(R.T)
    return w2c.at[:3, 3].set(-R.T @ t)


class CameraPoseEngine:
    """Batched (camera candidate x frame) renderer + error evaluators."""

    def __init__(self, intrinsics: Intrinsics, urdf: URDFReader = None,
                 max_tris_per_link: int = None):
        self.u_reader = urdf or URDFReader()
        self.intrinsics = intrinsics
        self.h, self.w = intrinsics.height, intrinsics.width
        self._intrin_vec = jnp.array(
            [intrinsics.f[0], intrinsics.f[1], intrinsics.pp[0], intrinsics.pp[1]],
            jnp.float32,
        )
        loader = MeshLoader(max_tris_per_link=max_tris_per_link, urdf=self.u_reader)
        v, ids, valid = loader.scene.flat_packed()
        self._verts = jnp.asarray(v)
        self._ids = jnp.asarray(ids)
        self._valid = jnp.asarray(valid)
        self.num_links = loader.scene.num_links
        self._fk = jax.jit(make_fk(self.u_reader))
        self.link_names = self.u_reader.mesh_names[:6]

    def set_robot_poses(self, robot_poses: np.ndarray) -> None:
        """FK for the F known robot poses (fixed for the whole search)."""
        self.link_poses = jnp.asarray(
            self._fk(np.asarray(robot_poses, np.float32))[:, : self.num_links]
        )  # [F, L, 4, 4]
        self.F = self.link_poses.shape[0]

    # ------------------------------------------------------------ rendering
    def _render_cf(self, cam_poses: jnp.ndarray, link_poses: jnp.ndarray):
        """Render all (candidate, frame) pairs: -> depth/lid [C, F, H, W].

        ``link_poses`` [F, L, 4, 4] is an explicit argument (not read from
        ``self``) so jitted programs built around this never bake stale
        robot poses in as constants across ``set_robot_poses`` calls.
        """
        link_mask = np.ones(self.num_links, bool)

        def per_cand(pose6):
            w2c = w2c_from_pose_jnp(pose6)
            return render_batch(
                link_poses, jnp.asarray(link_mask), self._verts, self._ids,
                self._valid, w2c, self._intrin_vec, self.h, self.w,
            )

        return jax.vmap(per_cand)(cam_poses)

    # ------------------------------------------------------------ errors
    def modeless_errors_raw(
        self, cam_poses: jnp.ndarray, link_poses: jnp.ndarray,
        tgt_depths: jnp.ndarray,
    ):
        """Depth-only error per candidate (cam_pose_prediction.py:389-427)."""
        from ..ops.error import mean_abs_std

        depth, _ = self._render_cf(cam_poses, link_poses)
        m, s = mean_abs_std(
            jnp.sqrt(tgt_depths)[None] - jnp.sqrt(depth), axes=(2, 3)
        )
        err = m * -s  # [C, F]
        return jnp.mean(1.1**err, axis=1)

    @functools.partial(jax.jit, static_argnums=0)
    def modeless_errors(self, cam_poses, link_poses, tgt_depths):
        return self.modeless_errors_raw(cam_poses, link_poses, tgt_depths)

    def modeless_refine_errors_raw(
        self, cam_poses: jnp.ndarray, link_poses: jnp.ndarray,
        tgt_depths: jnp.ndarray, tau: float = 0.1,
    ):
        """Truncated-L1 depth registration error (beyond-reference).

        The parity heuristic above (sqrt-domain mean·-std + 1.1^err) has a
        degenerate landscape in the coupled (y, z, pitch) directions — a
        wrong pose can score better than the truth.  For the optional fine
        pass we use per-pixel min(|d_t - d_r|, tau) averaged over the frame:
        un-rendered robot pixels and falsely-covered background pixels both
        saturate at tau, so the objective is silhouette alignment + in-
        overlap depth error, whose minimum sits at the true pose."""
        depth, _ = self._render_cf(cam_poses, link_poses)  # [C, F, H, W]
        diff = jnp.minimum(jnp.abs(tgt_depths[None] - depth), tau)
        return jnp.mean(diff, axis=(1, 2, 3))

    @functools.partial(jax.jit, static_argnums=0)
    def modeless_refine_errors(self, cam_poses, link_poses, tgt_depths):
        return self.modeless_refine_errors_raw(cam_poses, link_poses, tgt_depths)

    def seg_errors_raw(
        self,
        cam_poses: jnp.ndarray,
        link_poses: jnp.ndarray,  # [F, L, 4, 4]
        tgt_depths: jnp.ndarray,  # [F, H, W]
        masks: jnp.ndarray,  # [F, 6, H, W] bool
        masked_depths: jnp.ndarray,  # [F, 6, H, W]
        present: jnp.ndarray,  # [F, 6] bool
    ):
        """Segmentation-based multi-frame error (:964-970): per-frame sum of
        per-link mask-diff + sqrt-domain masked-depth terms + unmatched
        term with std over nonzeros; squared accumulation over frames."""
        depth, lid = self._render_cf(cam_poses, link_poses)  # [C, F, H, W]

        def per_cf(d, l, tgt, m, md, pres):
            def per_link(li):
                joint_mask = m[li]
                render_mask = l == li
                e = jnp.mean(joint_mask != render_mask)
                target_masked = md[li]
                render_masked = d * render_mask
                enough = jnp.sum(target_masked != 0) > 0.05 * jnp.sum(joint_mask)
                adiff = jnp.sqrt(jnp.abs(target_masked - render_masked))
                nz = adiff != 0
                cnt = jnp.sum(nz)
                mean_nz = jnp.where(
                    cnt > 0, jnp.sum(jnp.where(nz, adiff, 0.0)) / jnp.maximum(cnt, 1), 0.0
                )
                return jnp.where(pres[li], e + jnp.where(enough, mean_nz, 0.0), 0.0)

            err = jnp.sum(jax.vmap(per_link)(jnp.arange(6)))
            diff = jnp.sqrt(jnp.abs(tgt - d))
            nz = diff != 0
            cnt = jnp.sum(nz)
            vals = jnp.where(nz, diff, 0.0)
            mean_nz = jnp.sum(vals) / jnp.maximum(cnt, 1)
            # std over nonzero elements only
            var = jnp.sum(jnp.where(nz, (diff - mean_nz) ** 2, 0.0)) / jnp.maximum(cnt, 1)
            err += jnp.where(cnt > 0, mean_nz * -jnp.sqrt(var), 0.0)
            return err**2

        def per_cand(d, l):
            return jnp.sum(
                jax.vmap(per_cf)(d, l, tgt_depths, masks, masked_depths, present)
            )

        return jax.vmap(per_cand)(depth, lid)

    @functools.partial(jax.jit, static_argnums=0)
    def seg_errors(self, cam_poses, link_poses, tgt_depths, masks,
                   masked_depths, present):
        return self.seg_errors_raw(
            cam_poses, link_poses, tgt_depths, masks, masked_depths, present
        )

    # ------------------------------------------------------------ stage cores
    # Device-side implementations of the reference's camera-pose search
    # stages (cam_pose_prediction.py:171-373), mirroring engine.py: each
    # core maps (pose, lr, history, err_hist, *targets) -> updated state, so
    # the whole staged search threads device-resident state with no numpy
    # round-trips (and can be fused into a single program).
    def _eval_raw(self, eval_kind: str):
        return {
            "modeless": self.modeless_errors_raw,
            "modeless_refine": self.modeless_refine_errors_raw,
            "seg": self.seg_errors_raw,
        }[eval_kind]

    @functools.lru_cache(maxsize=128)
    def _smartsweep_core(
        self, eval_kind: str, div: int, rng_half: float, do_param: tuple,
        symmetric: bool = False,
    ):
        """Interpolative sweep over selected pose params.

        Reference quirk kept by default (cam_pose_prediction.py:250-251,
        780-781): the sweep window is the *asymmetric* [pose - range, pose].
        ``symmetric=True`` is the documented fix-flag (beyond reference).
        Also parity: base_err is computed once per stage, before the param
        loop — it goes stale after the first accepted move (:293).
        """
        ev = self._eval_raw(eval_kind)
        idxs = [i for i, b in enumerate(do_param) if b]

        def smartsweep(pose, lr, history, err_hist, *targets):
            base_err = ev(pose[None], *targets)[0]
            for idx in idxs:
                lo = pose[idx] - rng_half
                hi = pose[idx] + (rng_half if symmetric else 0.0)
                frac = jnp.arange(div, dtype=jnp.float32) / (div - 1)
                space = jnp.tile(pose, (div, 1)).at[:, idx].set(
                    lo + (hi - lo) * frac
                )
                space_err = ev(space, *targets)
                m = div * 5
                x = lo + (hi - lo) * jnp.arange(m, dtype=jnp.float32) / (m - 1)
                pred = cubic_spline_uniform(lo, hi, space_err, x)
                cand = pose.at[idx].set(x[jnp.argmin(pred)])
                pred_err = ev(cand[None], *targets)[0]
                grid_min = jnp.min(space_err)
                mt = jnp.argmin(jnp.stack([base_err, grid_min, pred_err]))
                pose = jax.lax.switch(
                    mt,
                    [
                        lambda p=pose: p,
                        lambda s=space, se=space_err: s[jnp.argmin(se)],
                        lambda c=cand: c,
                    ],
                )
                sel = jnp.where(mt == 1, grid_min, pred_err)
                err_hist = jnp.where(
                    mt != 0,
                    jnp.concatenate([sel[None], err_hist[:-1]]),
                    err_hist,
                )
                history = jnp.concatenate([pose[None], history[:-1]])
            return pose, lr, history, err_hist

        return smartsweep

    @functools.lru_cache(maxsize=128)
    def _tensorsweep_core(
        self, eval_kind: str, div: int, rng_half: float, do_param: tuple
    ):
        ev = self._eval_raw(eval_kind)
        idxs = [i for i, b in enumerate(do_param) if b]

        def tensorsweep(pose, lr, history, err_hist, *targets):
            for idx in idxs:
                frac = jnp.arange(div, dtype=jnp.float32) / (div - 1)
                space = jnp.tile(pose, (div, 1)).at[:, idx].set(
                    pose[idx] - rng_half + 2.0 * rng_half * frac
                )
                errs = ev(space, *targets)
                pose = space[jnp.argmin(errs)]
            return pose, lr, history, err_hist

        return tensorsweep

    @functools.lru_cache(maxsize=64)
    def _coupled_core(self, kind: str, eval_kind: str, div: int, rng_half: float):
        """zp_sweep: slide z with pitch compensated to hold the view focus
        (cam_pose_prediction.py:318-345); xya_sweep: x with coupled yaw
        (:347-371)."""
        ev = self._eval_raw(eval_kind)

        def zp(pose, lr, history, err_hist, *targets):
            frac = jnp.arange(div, dtype=jnp.float32) / (div - 1)
            z = pose[2] - rng_half + 2.0 * rng_half * frac
            pitch = jnp.arctan(
                jnp.tan(pose[4])
                - (z - pose[2]) / jnp.sqrt(pose[0] ** 2 + pose[1] ** 2)
            )
            space = jnp.tile(pose, (div, 1)).at[:, 2].set(z).at[:, 4].set(pitch)
            errs = ev(space, *targets)
            return space[jnp.argmin(errs)], lr, history, err_hist

        def xya(pose, lr, history, err_hist, *targets):
            frac = jnp.arange(div, dtype=jnp.float32) / (div - 1)
            x = pose[0] - rng_half + 2.0 * rng_half * frac
            yaw = -jnp.arctan(((x - pose[0]) / pose[0]) * jnp.tan(pose[5]))
            space = jnp.tile(pose, (div, 1)).at[:, 0].set(x).at[:, 5].set(yaw)
            errs = ev(space, *targets)
            return space[jnp.argmin(errs)], lr, history, err_hist

        return {"zp_sweep": zp, "xya_sweep": xya}[kind]

    @functools.lru_cache(maxsize=32)
    def _pair_sweep_core(self, eval_kind: str, div: int, rng_i: float,
                         rng_j: float, pi: int, pj: int):
        """Joint 2-D grid sweep over two pose parameters (beyond-reference).

        For coupled ambiguities (x–yaw, z–pitch) a div x div grid over both
        parameters finds the joint minimum that per-parameter coordinate
        sweeps walk past; one batched eval of div^2 candidates.  The
        reference's analytic x–yaw coupling (cam_pose_prediction.py:361)
        degenerates at yaw ~ 0 (tan(0) = 0), which is the common rig case.
        """
        ev = self._eval_raw(eval_kind)

        def pair(pose, lr, history, err_hist, *targets):
            fi = jnp.linspace(-rng_i, rng_i, div)
            fj = jnp.linspace(-rng_j, rng_j, div)
            gi, gj = jnp.meshgrid(fi, fj, indexing="ij")
            space = jnp.tile(pose, (div * div, 1))
            space = (
                space.at[:, pi].add(gi.reshape(-1))
                .at[:, pj].add(gj.reshape(-1))
            )
            errs = ev(space, *targets)
            return space[jnp.argmin(errs)], lr, history, err_hist

        return pair

    @functools.lru_cache(maxsize=32)
    def _descent_core(self, eval_kind: str, min_inc: tuple, its: int,
                      redux: float, early_stop: float, do_param: tuple,
                      init_rate: tuple):
        ev = self._eval_raw(eval_kind)
        core = camera_descent_core(ev, np.asarray(min_inc, np.float32))
        ir = np.asarray(
            [np.nan if r is None else r for r in init_rate], np.float32
        )
        dp = np.asarray(do_param, bool)

        def descent(pose, lr, history, err_hist, *targets):
            return core(
                pose, lr, history, err_hist, targets, jnp.asarray(dp),
                jnp.int32(its), jnp.float32(redux), jnp.float32(early_stop),
                jnp.asarray(ir),
            )

        return descent

    def _stage_core(self, stage, eval_kind: str, min_inc, symmetric: bool):
        kind = stage[0]
        if kind == "smartsweep":
            _, div, rng_half, do_param = stage
            return self._smartsweep_core(
                eval_kind, int(div), float(rng_half), tuple(do_param), symmetric
            )
        if kind == "tensorsweep":
            _, div, rng_half, do_param = stage
            return self._tensorsweep_core(
                eval_kind, int(div), float(rng_half), tuple(do_param)
            )
        if kind in ("zp_sweep", "xya_sweep"):
            _, div, rng_half = stage
            return self._coupled_core(kind, eval_kind, int(div), float(rng_half))
        if kind == "pair_sweep":
            _, div, rng_i, rng_j, pi, pj = stage
            return self._pair_sweep_core(
                eval_kind, int(div), float(rng_i), float(rng_j), int(pi),
                int(pj),
            )
        if kind == "descent":
            _, its, redux, early_stop, do_param, init_rate = stage
            return self._descent_core(
                eval_kind, tuple(np.asarray(min_inc, float)), int(its),
                float(redux), float(early_stop), tuple(do_param),
                tuple(init_rate),
            )
        raise TypeError(f"Unknown camera stage kind {kind}")

    @functools.lru_cache(maxsize=64)
    def _stage_jit_cam(self, stage_key: tuple, eval_kind: str, min_inc: tuple,
                       symmetric: bool):
        return jax.jit(
            self._stage_core(stage_key, eval_kind, np.asarray(min_inc),
                             symmetric)
        )

    @functools.lru_cache(maxsize=16)
    def _search_jit(self, stages_key: tuple, eval_kind: str, min_inc: tuple,
                    symmetric: bool):
        """Fuse an entire camera-search recipe into ONE device program
        (mirrors engine.CandidateEvaluator._recipe_jit)."""
        cores = [
            self._stage_core(sk, eval_kind, np.asarray(min_inc), symmetric)
            for sk in stages_key  # build eagerly, outside the trace
        ]

        def search(pose, lr, history, err_hist, *targets):
            state = (pose, lr, history, err_hist)
            for core in cores:
                state = core(*state, *targets)
            return state[0]

        return jax.jit(search)


def camera_descent_core(eval_fn, min_inc):
    """Un-jitted camera-pose coordinate descent core (see make_camera_descent)."""
    min_inc = np.asarray(min_inc, np.float32)

    def descent(pose, lr, history, err_hist, targets, do_param, its, redux,
                early_stop, init_rate):
        lr = jnp.where(jnp.isnan(init_rate), lr, init_rate)

        def body(carry):
            pose, lr, history, err_hist, it, stop = carry
            mean_hist = jnp.mean(history, axis=0)

            def param_body(j, jc):
                pose, lr, last_min = jc

                def do(_):
                    lr_j = jnp.where(
                        jnp.abs(mean_hist[j] - pose[j]) <= lr[j],
                        lr[j] * redux, lr[j],
                    )
                    lr2 = jnp.maximum(lr.at[j].set(lr_j), min_inc)
                    under = pose.at[j].add(-lr2[j])
                    over = pose.at[j].add(lr2[j])
                    errs = eval_fn(jnp.stack([under, over]), *targets)
                    delta = jnp.where(
                        errs[1] < errs[0], lr2[j],
                        jnp.where(errs[1] > errs[0], -lr2[j], 0.0),
                    )
                    return pose.at[j].add(delta), lr2, jnp.min(errs)

                return jax.lax.cond(
                    do_param[j], do, lambda _: (pose, lr, last_min), None
                )

            pose2, lr2, last_min = jax.lax.fori_loop(
                0, 6, param_body, (pose, lr, jnp.inf)
            )
            history2 = jnp.concatenate([pose2[None], history[:-1]])
            err_hist2 = jnp.concatenate([last_min[None], err_hist[:-1]])
            e0 = err_hist2[0]
            c1 = jnp.abs(jnp.mean(err_hist2) - e0) / e0 < early_stop
            rng = history2.max(0) - history2.min(0)
            c2 = jnp.all((rng <= min_inc) | jnp.isclose(rng, min_inc))
            c3 = jnp.all(history2[:3] == history2[0])
            return (pose2, lr2, history2, err_hist2, it + 1, c1 | c2 | c3)

        def cond(carry):
            return (carry[4] < its) & (~carry[5])

        pose, lr, history, err_hist, _, _ = jax.lax.while_loop(
            cond, body,
            (pose, lr, history, err_hist, jnp.int32(0), jnp.bool_(False)),
        )
        return pose, lr, history, err_hist

    return descent


def make_camera_descent(eval_fn, min_inc):
    """Device-side camera-pose coordinate descent.

    Same adaptive loop as the reference's camera descent
    (cam_pose_prediction.py:188-236; no parameter limits, unlike the joint
    version) as a single dispatch: lax.while over iterations, fori over the
    6 pose parameters, one 2-candidate eval per step.  ``eval_fn(poses[B,6],
    *targets) -> err[B]``.
    """
    return jax.jit(camera_descent_core(eval_fn, np.asarray(min_inc)))


class _BaseCameraPredictor:
    """Shared staged-search loop over camera-pose space."""

    def __init__(
        self,
        base_pose=DEFAULT_CAMERA_POSE,
        ds_factor: int = 8,
        preview: bool = False,
        save_to: str = None,
        min_angle_inc=np.array([0.001, 0.001, 0.001, 0.002, 0.002, 0.002]),
        history_length: int = 5,
        base_intrinsics: str = "1280_720_color",
    ):
        self.base_pose = np.array(base_pose, float)
        self.ds_factor = ds_factor
        self.preview = preview
        self.min_ang_inc = np.asarray(min_angle_inc, float)
        self.history_length = history_length
        self.base_intrinsics = base_intrinsics
        intr = Intrinsics(base_intrinsics)
        intr.downscale(ds_factor)
        self.engine = CameraPoseEngine(intr)
        self.u_reader = self.engine.u_reader
        self.link_names = self.engine.link_names

    # Subclasses set self._eval(poses[C,6]) -> np err[C].
    def _eval(self, poses: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    # Subclasses name their batched error program ('modeless' or 'seg').
    _eval_kind: str = None
    # Reference-quirk flag: asymmetric smartsweep windows (see
    # CameraPoseEngine._smartsweep_core).  True = parity.
    asymmetric_sweeps: bool = True

    def _batch_downsample(self, base: np.ndarray, factor: int) -> np.ndarray:
        return np.stack(
            [np.asarray(downsample(jnp.asarray(b), factor)) for b in base]
        )

    @staticmethod
    def _stages_key(stages: Sequence) -> tuple:
        return tuple(
            tuple(
                tuple(x) if isinstance(x, (list, np.ndarray)) else x
                for x in s
            )
            for s in stages
        )

    def _search(self, pose: np.ndarray, stages: Sequence,
                mode: str = None) -> np.ndarray:
        """The staged optimizer loop (cam_pose_prediction.py:171-373) as
        device programs.

        ``mode``: 'fused' compiles the entire recipe into one XLA program
        (one dispatch per solve — production default on TPU); 'staged'
        dispatches one jitted program per stage with the search state kept
        device-resident throughout (smaller compiles — default elsewhere);
        'host' is the legacy numpy-threaded loop kept for debugging.
        """
        if mode is None:
            mode = "fused" if jax.default_backend() == "tpu" else "staged"
        if mode == "host":
            return self._search_host(pose, stages)

        targets = self._eval_targets()
        min_inc = tuple(np.asarray(self.min_ang_inc, float))
        sym = not self.asymmetric_sweeps
        state = (
            jnp.asarray(pose, jnp.float32),
            jnp.zeros(6, jnp.float32),
            jnp.zeros((self.history_length, 6), jnp.float32),
            jnp.zeros(self.history_length, jnp.float32),
        )

        # 'spiral' is a host-chunked global search; split around it.
        segments, cur = [], []
        for s in stages:
            if s[0] == "spiral":
                if cur:
                    segments.append(cur)
                    cur = []
                segments.append("spiral")
            else:
                cur.append(s)
        if cur:
            segments.append(cur)

        for seg in segments:
            if seg == "spiral":
                state = (
                    jnp.asarray(SpiralRenderer(self._eval).run(), jnp.float32),
                    *state[1:],
                )
                continue
            key = self._stages_key(seg)
            if mode == "fused":
                pose_out = self.engine._search_jit(
                    key, self._eval_kind, min_inc, sym
                )(*state, *targets)
                state = (pose_out, *state[1:])
            else:
                for sk in key:
                    f = self.engine._stage_jit_cam(
                        sk, self._eval_kind, min_inc, sym
                    )
                    state = f(*state, *targets)
        return np.asarray(state[0], float)

    def _search_host(self, pose: np.ndarray, stages: Sequence) -> np.ndarray:
        """Legacy host-threaded staged loop (numpy state between stages)."""
        lr = np.zeros(6)
        history = np.zeros((self.history_length, 6))
        err_history = np.zeros(self.history_length)

        for stage in stages:
            kind = stage[0]
            if kind == "descent":
                _, its, redux, early_stop, do_param, init_rate = stage
                init = np.array(
                    [np.nan if r is None else r for r in init_rate], np.float32
                )
                if not hasattr(self, "_descent_prog"):
                    self._descent_prog = make_camera_descent(
                        self._eval_core(),
                        jnp.asarray(self.min_ang_inc, jnp.float32),
                    )
                pose_d, lr_d, hist_d, errh_d = self._descent_prog(
                    jnp.asarray(pose, jnp.float32),
                    jnp.asarray(lr, jnp.float32),
                    jnp.asarray(history, jnp.float32),
                    jnp.asarray(err_history, jnp.float32),
                    self._eval_targets(),
                    jnp.asarray(np.array(do_param)),
                    jnp.int32(its),
                    jnp.float32(redux),
                    jnp.float32(early_stop),
                    jnp.asarray(init),
                )
                pose = np.asarray(pose_d, float)
                lr = np.asarray(lr_d, float)
                history = np.asarray(hist_d, float)
                err_history = np.asarray(errh_d, float)

            elif kind == "smartsweep":
                _, div, rng_half, do_param = stage
                base_err = self._eval(pose[None])[0]
                for idx in np.where(np.array(do_param))[0]:
                    # Reference parity: the window is [pose - range, pose]
                    # (temp_high = temp_low + range where temp_low was
                    # already shifted; cam_pose_prediction.py:250-251, 780-781).
                    lo = pose[idx] - rng_half
                    hi = pose[idx]
                    space = np.tile(pose, (div, 1))
                    space[:, idx] = np.linspace(lo, hi, div)
                    space_err = self._eval(space)
                    x = np.linspace(lo, hi, div * 5)
                    pred = np.asarray(
                        cubic_spline_uniform(lo, hi, jnp.asarray(space_err), jnp.asarray(x))
                    )
                    cand = pose.copy()
                    cand[idx] = x[pred.argmin()]
                    pred_err = self._eval(cand[None])[0]
                    errs = [base_err, space_err.min(), pred_err]
                    min_type = int(np.argmin(errs))
                    if min_type == 1:
                        pose = space[space_err.argmin()]
                        err_history = np.concatenate([[space_err.min()], err_history[:-1]])
                    elif min_type == 2:
                        pose = cand
                        err_history = np.concatenate([[pred_err], err_history[:-1]])
                    history = np.vstack([pose, history[:-1]])

            elif kind == "tensorsweep":
                _, div, rng_half, do_param = stage
                for idx in np.where(np.array(do_param))[0]:
                    space = np.tile(pose, (div, 1))
                    space[:, idx] = np.linspace(pose[idx] - rng_half, pose[idx] + rng_half, div)
                    errs = self._eval(space)
                    pose = space[errs.argmin()]

            elif kind == "zp_sweep":
                # Coupled z-pitch constraint: same view focus while sliding z
                # (cam_pose_prediction.py:318-345).
                _, div, rng_half = stage
                space = np.tile(pose, (div, 1))
                space[:, 2] = np.linspace(pose[2] - rng_half, pose[2] + rng_half, div)
                space[:, 4] = np.arctan(
                    np.tan(pose[4])
                    - (space[:, 2] - pose[2]) / np.sqrt(pose[0] ** 2 + pose[1] ** 2)
                )
                errs = self._eval(space)
                pose = space[errs.argmin()]

            elif kind == "xya_sweep":
                # Coupled x-yaw constraint (cam_pose_prediction.py:347-371).
                _, div, rng_half = stage
                space = np.tile(pose, (div, 1))
                space[:, 0] = np.linspace(pose[0] - rng_half, pose[0] + rng_half, div)
                space[:, 5] = -np.arctan(
                    ((space[:, 0] - pose[0]) / pose[0]) * np.tan(pose[5])
                )
                errs = self._eval(space)
                pose = space[errs.argmin()]

            elif kind == "spiral":
                pose = SpiralRenderer(self._eval).run()

        return pose


class ModellessCameraPredictor(_BaseCameraPredictor):
    """Depth-only camera-pose search (cam_pose_prediction.py:28-431).

    ``refine_ds_factor`` (beyond-reference, optional): after the parity
    recipe converges at ``ds_factor``, re-run a short sweep+descent pass at
    the finer downscale on the same full-res inputs.  The reference's
    modeless heuristic saturates at roughly pixel scale (~1.3 cm/px at
    1.5 m with ds 8); the fine pass buys back the quantization floor."""

    _eval_kind = "modeless"

    def __init__(self, *args, refine_ds_factor: int = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.refine_ds_factor = refine_ds_factor

    def _setStages(self):
        wide_tensorsweep_xyz = ["tensorsweep", 20, 0.2, [True, True, True, False, False, False]]
        wide_tensorsweep_rpy = ["tensorsweep", 20, 0.1, [False, False, False, True, True, True]]
        fine_descent = ["descent", 50, 0.5, 0.001, [True] * 6, [0.01] * 6]
        zp_sweep = ["zp_sweep", 20, 0.1]
        p_fix = ["smartsweep", 20, 0.03, [False, False, False, False, True, False]]
        xyya_narrow = ["smartsweep", 20, 0.15, [True, True, False, False, False, True]]
        quick_descent = ["descent", 15, 0.5, 0.001, [True] * 6, [0] * 6]
        combo = [zp_sweep, p_fix, xyya_narrow] * 2
        coarse = []
        for x in np.logspace(1, 0.05, 5) / 30:
            coarse.append(["tensorsweep", 20, x, [True, True, True, False, False, False]])
            coarse.append(["tensorsweep", 20, x / 2, [False, False, False, True, True, True]])
        self.stages = [
            *coarse, wide_tensorsweep_xyz, wide_tensorsweep_rpy, fine_descent,
            *combo, quick_descent, quick_descent,
        ]

    def run(self, og_images, target_depths, robot_poses, starting_camera_pose=None):
        og_images = np.atleast_3d(np.asarray(og_images))
        if og_images.ndim == 3:
            og_images = og_images[None]
            target_depths = np.asarray(target_depths)[None]
            robot_poses = np.asarray(robot_poses)[None]
        target_depths = np.asarray(target_depths, float)
        self.engine.set_robot_poses(np.asarray(robot_poses))
        self._tgt = jnp.asarray(
            self._batch_downsample(target_depths, self.ds_factor), jnp.float32
        )
        pose = np.copy(self.base_pose) if starting_camera_pose is None else np.array(
            starting_camera_pose, float
        )
        self._setStages()
        est = self._search(pose, self.stages)
        if self.refine_ds_factor is not None:
            fine = _ModellessRefinePredictor(
                base_pose=est,
                ds_factor=self.refine_ds_factor,
                min_angle_inc=self.min_ang_inc,
                history_length=self.history_length,
                base_intrinsics=self.base_intrinsics,
            )
            est = fine.run(og_images, target_depths, robot_poses,
                           starting_camera_pose=est)
        return est

    def _eval(self, poses: np.ndarray) -> np.ndarray:
        return np.asarray(
            self.engine.modeless_errors(
                jnp.asarray(poses, jnp.float32), self.engine.link_poses,
                self._tgt,
            )
        )

    def _eval_core(self):
        return self.engine.modeless_errors_raw

    def _eval_targets(self):
        return (self.engine.link_poses, self._tgt)

    def error_at(self, pose) -> float:
        return float(self._eval(np.asarray(pose, float)[None])[0])


class _ModellessRefinePredictor(ModellessCameraPredictor):
    """Fine pass of the modeless search (beyond-reference): truncated-L1
    depth registration objective + symmetric sweeps.  Invoked by
    ``ModellessCameraPredictor(refine_ds_factor=...)``."""

    _eval_kind = "modeless_refine"
    asymmetric_sweeps = False
    refine_ds_factor = None

    def __init__(self, *args, **kwargs):
        kwargs.pop("refine_ds_factor", None)
        super().__init__(*args, **kwargs)
        self.refine_ds_factor = None

    def _setStages(self):
        px = 1.5 / float(self.engine.intrinsics.f[0])  # ~m per pixel at 1.5 m
        xyz = [True, True, True, False, False, False]
        rpy = [False, False, False, True, True, True]
        # Block-coordinate refinement: the depth-only landscape's flat
        # valleys run along *coupled* orbit directions (x+yaw, z+pitch) —
        # a joint 6-DoF descent can walk them for tens of cm.  Alternating
        # position-only and rotation-only blocks makes valley motion
        # impossible within a block (a lone z or pitch move raises the
        # error), so each block pulls toward the true joint minimum.
        pos_rate = [0.02, 0.02, 0.02, 0, 0, 0]
        rot_rate = [0, 0, 0, 0.01, 0.01, 0.01]
        fine = max(0.004, 1.5 * px)
        self.stages = [
            ["smartsweep", 20, 0.12, xyz],
            ["descent", 30, 0.5, 1e-4, xyz, pos_rate],
            ["smartsweep", 20, 0.05, rpy],
            ["descent", 30, 0.5, 1e-4, rpy, rot_rate],
            # With y/z/pitch settled, the x–yaw valley's joint minimum is
            # the truth — explore the whole 2-D plane at once (alternating
            # 1-DoF blocks zigzag down this valley too slowly).
            ["pair_sweep", 21, 0.15, 0.10, 0, 5],
            ["descent", 25, 0.5, 1e-4, xyz, [fine, fine, fine, 0, 0, 0]],
            ["descent", 25, 0.5, 1e-4, rpy, [0, 0, 0, fine, fine, fine]],
            ["pair_sweep", 15, 0.03, 0.02, 0, 5],
            ["descent", 20, 0.5, 1e-4, xyz, [fine, fine, fine, 0, 0, 0]],
        ]

    def _eval(self, poses: np.ndarray) -> np.ndarray:
        return np.asarray(
            self.engine.modeless_refine_errors(
                jnp.asarray(poses, jnp.float32), self.engine.link_poses,
                self._tgt,
            )
        )

    def _eval_core(self):
        return self.engine.modeless_refine_errors_raw

    def error_at(self, pose) -> float:
        return float(self._eval(np.asarray(pose, float)[None])[0])


class CameraPredictor(_BaseCameraPredictor):
    """Segmentation-based camera-pose search (cam_pose_prediction.py:576-977).

    ``color_dict`` enables the synthetic branch (masks recovered from render
    colors) exactly like the Predictor; otherwise a trained Segmenter is
    loaded via ModelManager.
    """

    _eval_kind = "seg"

    def __init__(self, *args, model_ds: str = None, color_dict: dict = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.color_dict = color_dict
        if color_dict is None:
            from ..training.model_registry import ModelManager
            from ..models.inference import Segmenter

            mm = ModelManager()
            ckpt = mm.dynamicLoad(**({"dataset": model_ds} if model_ds else {}))
            if ckpt is None:
                raise FileNotFoundError(
                    "No trained segmentation model found; pass color_dict for "
                    "synthetic input or train a model first."
                )
            self.seg = Segmenter(ckpt, ["BG"] + self.link_names)

    def _setStages(self):
        wide_tensorsweep_xyz = ["tensorsweep", 20, 0.2, [True, True, True, False, False, False]]
        wide_tensorsweep_rpy = ["tensorsweep", 20, 0.1, [False, False, False, True, True, True]]
        fine_descent = ["descent", 50, 0.5, 0.001, [True] * 6, [0.01] * 6]
        zp_sweep = ["zp_sweep", 20, 0.1]
        p_fix = ["smartsweep", 20, 0.03, [False, False, False, False, True, False]]
        xyya_narrow = ["smartsweep", 5, 0.025, [True, True, False, False, False, True]]
        quick_descent = ["descent", 15, 0.5, 0.001, [True] * 6, [0] * 6]
        combo = [zp_sweep, p_fix, xyya_narrow, xyya_narrow] * 2
        coarse = []
        for x in np.linspace(0.25, 0.025, 10):
            coarse.append(["smartsweep", 6, x, [True, True, True, False, False, False]])
            coarse.append(["smartsweep", 6, x / 2, [False, False, False, True, True, True]])
        self.stages = [
            *coarse, wide_tensorsweep_xyz, wide_tensorsweep_rpy, fine_descent,
            *combo, quick_descent,
        ]

    def run(self, og_images, target_depths, robot_poses, starting_camera_pose=None):
        og_images = np.asarray(og_images)
        if og_images.ndim == 3:
            og_images = og_images[None]
            target_depths = np.asarray(target_depths)[None]
            robot_poses = np.asarray(robot_poses)[None]
        target_depths = np.asarray(target_depths, float)
        self.engine.set_robot_poses(np.asarray(robot_poses))
        tgt_ds = self._batch_downsample(target_depths, self.ds_factor)
        img_ds = self._batch_downsample(og_images, self.ds_factor)

        F, h, w = tgt_ds.shape
        masks = np.zeros((F, 6, h, w), bool)
        masked = np.zeros((F, 6, h, w), np.float32)
        present = np.zeros((F, 6), bool)
        for f in range(F):
            if self.color_dict is not None:
                img = img_ds[f].round().astype(np.uint8)
                for li, link in enumerate(self.link_names):
                    m = img[..., 0] == self.color_dict[link][0]
                    if m.sum():
                        masks[f, li] = m
                        masked[f, li] = m * tgt_ds[f]
                        present[f, li] = True
            else:
                seg_data, _ = self.seg.segment(img_ds[f].astype(np.uint8))
                for li, link in enumerate(self.link_names):
                    if link in seg_data:
                        masks[f, li] = seg_data[link]["mask"]
                        masked[f, li] = masks[f, li] * tgt_ds[f]
                        present[f, li] = True

        self._targets = (
            jnp.asarray(tgt_ds, jnp.float32),
            jnp.asarray(masks),
            jnp.asarray(masked),
            jnp.asarray(present),
        )
        pose = np.copy(self.base_pose) if starting_camera_pose is None else np.array(
            starting_camera_pose, float
        )
        self._setStages()
        return self._search(pose, self.stages)

    def _eval(self, poses: np.ndarray) -> np.ndarray:
        t, m, md, pr = self._targets
        return np.asarray(
            self.engine.seg_errors(
                jnp.asarray(poses, jnp.float32), self.engine.link_poses,
                t, m, md, pr,
            )
        )

    def _eval_core(self):
        return self.engine.seg_errors_raw

    def _eval_targets(self):
        return (self.engine.link_poses, *self._targets)

    def error_at(self, pose) -> float:
        return float(self._eval(np.asarray(pose, float)[None])[0])


class SpiralRenderer:
    """Global spiral-shell camera-position search (cam_pose_prediction.py:
    434-497): ~19k candidate positions on nested cylinders facing inward,
    evaluated in large device batches."""

    def __init__(
        self,
        eval_fn,
        batch: int = 512,
        r_limits=(1, 3),
        shells: int = 25,
        per_round: int = 75,
        z_limits=(0, 1),
        turns: int = 10,
    ):
        self.eval_fn = eval_fn
        self.batch = batch
        self.r_min, self.r_max = min(r_limits), max(r_limits)
        self.shells = shells
        self.per_round = per_round
        self.z_min, self.z_max = min(z_limits), max(z_limits)
        self.turns = turns

    def candidates(self) -> np.ndarray:
        n = self.turns * self.per_round
        base = np.zeros((n, 6))
        ang = np.tile(np.linspace(0, 2 * np.pi, self.per_round), self.turns)
        base[:, 5] = 2 * np.pi - ang
        base[:, 0] = -np.sin(ang)
        base[:, 1] = -np.cos(ang)
        base[:, 2] = np.linspace(self.z_min, self.z_max, n)
        full = np.tile(base, (self.shells, 1))
        r = np.repeat(np.linspace(self.r_min, self.r_max, self.shells), n)
        full[:, 0] *= r
        full[:, 1] *= r
        return full

    def run(self) -> np.ndarray:
        space = self.candidates()
        errors = np.zeros(len(space))
        for i in range(0, len(space), self.batch):
            chunk = space[i : i + self.batch]
            pad = self.batch - len(chunk)
            if pad:
                chunk = np.vstack([chunk, np.tile(chunk[-1:], (pad, 1))])
            errors[i : i + self.batch - pad] = self.eval_fn(chunk)[: self.batch - pad]
        return space[errors.argmin()]
