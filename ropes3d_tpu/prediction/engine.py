"""Batched candidate-search engine: every stage as a jitted device program.

This is the architectural heart of the TPU build (SURVEY.md §7): instead of
the reference's interleaved Python/OpenGL render-compare loops
(``robotpose/prediction/predict.py:159-374``), everything from joint angles
to scalar error is one jitted, vmapped function

    eval(candidate_angles[B, 6], target) -> err[B]

and each stage is a candidate-proposal strategy around it:

- ``descent``       — the full adaptive coordinate descent (predict.py:173-229)
                      as a single device dispatch (lax.while over iterations,
                      lax.fori over joints, 2-candidate eval per step)
- ``isweep``        — InterpolativeSweep (predict.py:283-338): one batched
                      render of all divisions + on-device not-a-knot cubic
                      interpolation of the error curve
- ``tensor_sweep``  — TensorSweep (predict.py:340-373)
- ``lookup_select`` — lookup-stack argmin (predict.py:163-171)
- ``evaluate``      — raw batched error (used by the host-side SFlip logic)

Stage-persistent search state (angles, learning rates, history, error
history) crosses stage boundaries exactly as in the reference, where
``history``/``err_history`` are shared across the stage loop
(predict.py:144-148).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import Intrinsics, camera_matrices
from ..ops.error import TargetBundle, link_error, mean_abs_std
from ..ops.interp import cubic_spline_uniform
from ..ops.rasterizer import render_batch
from ..robot import MeshLoader, URDFReader
from ..robot.kinematics import make_fk
from .stages import (
    Descent, GridSweep, InterpolativeSweep, Lookup, Polish, SFlip, TensorSweep,
)


def _stage_key(stages) -> tuple:
    """Hashable description of a stage recipe (for compiled-program caching)."""
    key = []
    for s in stages:
        if isinstance(s, Lookup):
            key.append(("lookup",))
        elif isinstance(s, Descent):
            key.append((
                "descent", s.to_render, int(s.its), float(s.rate_redux),
                float(s.early_stop),
                tuple(None if r is None else float(r) for r in s.init_rate),
                tuple(bool(b) for b in s.joints),
            ))
        elif isinstance(s, InterpolativeSweep):
            key.append((
                "isweep", s.to_render, int(s.divs),
                None if s.range is None else float(s.range),
                tuple(bool(b) for b in s.joints),
            ))
        elif isinstance(s, TensorSweep):
            key.append((
                "tsweep", s.to_render, int(s.divs),
                None if s.range is None else float(s.range),
                tuple(bool(b) for b in s.joints),
            ))
        elif isinstance(s, GridSweep):
            key.append((
                "gsweep", s.to_render, int(s.divs[0]), int(s.divs[1]),
                None if s.range is None else float(s.range),
                tuple(bool(b) for b in s.joints),
            ))
        elif isinstance(s, SFlip):
            key.append(("sflip", s.to_render))
        elif isinstance(s, Polish):
            key.append((
                "polish", s.to_render, s.radii,
                tuple(bool(b) for b in s.joints),
            ))
        else:
            raise TypeError(f"Unknown stage type {type(s).__name__}")
    return tuple(key)


class SearchState(NamedTuple):
    """Search state threaded through stages (predict.py:144-148)."""

    angles: jnp.ndarray  # [6]
    lr: jnp.ndarray  # [6] per-joint learning rate
    history: jnp.ndarray  # [5, 6] recent angle history
    err_hist: jnp.ndarray  # [5] recent error history

    @staticmethod
    def fresh(history_length: int = 5) -> "SearchState":
        return SearchState(
            jnp.zeros(6, jnp.float32),
            jnp.ones(6, jnp.float32) * 0.1,
            jnp.zeros((history_length, 6), jnp.float32),
            jnp.zeros(history_length, jnp.float32),
        )

    @staticmethod
    def fresh_batch(n: int, history_length: int = 5) -> "SearchState":
        """Frame-batched state (leading axis = frames)."""
        return jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n, *x.shape)),
            SearchState.fresh(history_length),
        )


class CandidateEvaluator:
    """Holds the device scene + compiled stage programs for one camera setup."""

    def __init__(
        self,
        camera_pose,
        intrinsics: Intrinsics,
        min_ang_inc: np.ndarray = None,
        max_tris_per_link: int = None,
        urdf: URDFReader = None,
        robust_tau: float = None,
    ):
        # Depth-residual truncation (meters) for every candidate eval; None
        # = exact reference parity.  Neural-segmented targets need it: with
        # imperfect masks the parity depth term is a pose-independent floor
        # (see ops.error.link_error).  Fixed at construction — the compiled
        # stage programs bake it in (lru caches would go stale otherwise).
        self.robust_tau = None if robust_tau is None else float(robust_tau)
        self.u_reader = urdf or URDFReader()
        self.intrinsics = intrinsics
        self.h, self.w = intrinsics.height, intrinsics.width
        self._intrin_tuple = (
            float(intrinsics.f[0]), float(intrinsics.f[1]),
            float(intrinsics.pp[0]), float(intrinsics.pp[1]),
        )
        self._intrin_vec = jnp.array(self._intrin_tuple, jnp.float32)
        loader = MeshLoader(max_tris_per_link=max_tris_per_link, urdf=self.u_reader)
        packed = loader.scene
        self._packed = packed
        self.num_links = packed.num_links
        self._tris_per_link = packed.tris_per_link
        # Compacted triangle soup (no per-link padding slots): ~40% less
        # setup/raster work per candidate on the MH5L scene.  Link ids stay
        # ascending, so per-stage link truncation is a static searchsorted
        # slice (_scene_slice).
        v, ids, valid = packed.flat_packed()
        self._np_link_ids = ids
        self._verts = jnp.asarray(v)
        self._link_ids = jnp.asarray(ids)
        self._valid = jnp.asarray(valid)

        self._fk = make_fk(self.u_reader)
        self.joint_limits = jnp.asarray(self.u_reader.joint_limits, jnp.float32)
        self.min_ang_inc = jnp.asarray(
            min_ang_inc if min_ang_inc is not None else np.array([0.005] * 6),
            jnp.float32,
        )
        self.set_camera_pose(camera_pose)

    def set_camera_pose(self, pose) -> None:
        self.camera_pose = np.asarray(pose, float)
        _, w2c = camera_matrices(self.camera_pose)
        self._w2c = jnp.asarray(w2c, jnp.float32)

    # ------------------------------------------------------------ core eval
    def _scene_slice(self, to_render: int):
        L = min(to_render, self.num_links)
        n = int(np.searchsorted(self._np_link_ids, L))
        return self._verts[:n], self._link_ids[:n], self._valid[:n]

    def _render_fn(self, to_render: int, scale: int = 1):
        verts, ids, valid = self._scene_slice(to_render)
        # NB: numpy (not jnp) constants — these closures are lru-cached and
        # may first be built *inside* a jit trace, where a jnp constant
        # would be a tracer and leak into later traces.
        link_mask = np.ones(min(to_render, self.num_links), bool)
        # ``scale`` > 1 renders at an integer multiple of the working
        # resolution (exact: Intrinsics.downscale divides f/pp linearly, so
        # working x2 == base/(ds/2)).  Used by the fine-polish pass.
        intrin = (
            self._intrin_vec if scale == 1
            else np.asarray(self._intrin_tuple, np.float32) * scale
        )
        h, w = self.h * scale, self.w * scale
        fk = self._fk
        L = min(to_render, self.num_links)

        def render(angles, w2c):
            poses = fk(angles)[:, :L]
            # np->jnp conversion inside the traced body (fresh per trace).
            return render_batch(
                poses, jnp.asarray(link_mask), verts, ids, valid, w2c, intrin,
                h, w,
            )

        return render

    def _eval_fn(self, to_render: int, scale: int = 1):
        """Batched candidate error at the working resolution (``scale=1``)
        or an integer multiple of it (fine-polish pass — targets must then
        be prepared at the same scale)."""
        link_active = (np.arange(6) >= 1) & (np.arange(6) < to_render)
        sh, sw = self.h * scale, self.w * scale

        # The fused raster+error kernel serves every resolution on TPU:
        # working resolutions keep the target maps VMEM-resident; above
        # padded width 512 the streaming variant DMAs per-tile target
        # blocks from HBM (rasterizer_pallas.py backend selection).  Only
        # non-TPU backends use the two-step rasterize + link_error path.
        if jax.default_backend() not in ("cpu", "gpu"):
            # TPU: fused raster+error kernel — one launch per eval, no
            # [B, H, W] HBM round trip (the inner loop of every stage).
            from ..ops.error import link_error_from_parts
            from ..ops.rasterizer import transform_vertices, triangle_setup
            from ..ops.rasterizer_pallas import rasterize_error_pallas

            verts, ids, valid = self._scene_slice(to_render)
            L = min(to_render, self.num_links)
            fk = self._fk
            h, w = sh, sw
            # Host floats, NOT np.asarray(self._intrin_vec): a 4-float
            # device pull can cost minutes on a degraded remote transport.
            fx, fy, cx, cy = (x * scale for x in self._intrin_tuple)

            tau = self.robust_tau

            def eval_batch(angles, w2c, target: TargetBundle):
                poses = fk(angles)[:, :L]

                def setup(p):
                    cam_verts = transform_vertices(verts, ids, p, w2c)
                    return triangle_setup(cam_verts, valid, fx, fy, cx, cy)

                coeffs, qrange, vrange, _ = jax.vmap(setup)(poses)
                parts = rasterize_error_pallas(
                    coeffs, qrange, vrange, ids.astype(jnp.int32),
                    target.masks, target.masked_depth, target.depth, h, w,
                    tau=tau, tocc=target.occ,
                )
                return link_error_from_parts(
                    parts, target, jnp.asarray(link_active), h * w, tau
                )

            return eval_batch

        render = self._render_fn(to_render, scale)
        tau = self.robust_tau

        def eval_batch(angles, w2c, target: TargetBundle):
            depth, lid = render(angles, w2c)
            la = jnp.asarray(link_active)
            return jax.vmap(lambda d, l: link_error(target, d, l, la, tau))(
                depth, lid
            )

        return eval_batch

    @functools.lru_cache(maxsize=8)
    def _evaluate_jit(self, to_render: int):
        return jax.jit(self._eval_fn(to_render))

    def evaluate(self, angles, target: TargetBundle, to_render: int) -> np.ndarray:
        """Batched error of candidate angles[B, 6] -> numpy err[B]."""
        f = self._evaluate_jit(to_render)
        return np.asarray(
            f(jnp.asarray(angles, jnp.float32).reshape(-1, 6), self._w2c, target)
        )

    # ------------------------------------------------------------ descent
    @functools.lru_cache(maxsize=32)
    def _descent_jacobi_fn(self, to_render: int, joints: tuple):
        """Vectorized descent: per iteration, ONE batched eval of the active
        joints' under/over candidates (2k renders for k active joints) with
        simultaneous (Jacobi) updates — ~k-times fewer sequential device
        steps than the reference's per-joint loop at equal iteration count.
        Trajectories differ slightly from parity mode; accuracy is
        equivalent (the stage recipes' stop rules dominate).

        ``joints`` is static — only active joints are probed, so an SL
        descent evaluates 4 candidates per iteration, not 12."""
        eval_batch = self._eval_fn(to_render)
        limits = self.joint_limits
        min_inc = self.min_ang_inc
        active = tuple(j for j, b in enumerate(joints) if b)
        idx = np.asarray(active, np.int32)
        k = len(active)
        sel = np.zeros((k, 6), np.float32)
        sel[np.arange(k), idx] = 1.0  # one-hot rows for active joints

        def descent(
            state: SearchState, w2c, target: TargetBundle,
            its, rate_redux, early_stop, init_rate,
        ) -> SearchState:
            state = state._replace(
                lr=jnp.where(jnp.isnan(init_rate), state.lr, init_rate)
            )

            def body(carry):
                angles, lr, history, err_hist, it, stop = carry
                mean_hist = jnp.mean(history, axis=0)
                shrink = jnp.abs(mean_hist - angles) <= lr
                mask = jnp.asarray(sel.any(0))
                lr2 = jnp.where(mask & shrink, lr * rate_redux, lr)
                lr2 = jnp.maximum(lr2, min_inc)

                rows = jnp.asarray(sel)  # [k, 6]
                step = rows * lr2[idx][:, None]  # [k, 6]
                under = angles[None] - step
                over = angles[None] + step
                # [2k+1]: probe the incumbent too — monotone acceptance,
                # same rationale as the sequential loop above.
                cands = jnp.concatenate([under, over, angles[None]], axis=0)
                errs = eval_batch(cands, w2c, target)
                diag_u = under[jnp.arange(k), idx]
                diag_o = over[jnp.arange(k), idx]
                inl_u = (diag_u >= limits[idx, 0]) & (diag_u <= limits[idx, 1])
                inl_o = (diag_o >= limits[idx, 0]) & (diag_o <= limits[idx, 1])
                err_u = jnp.where(inl_u, errs[:k], jnp.inf)
                err_o = jnp.where(inl_o, errs[k:2 * k], jnp.inf)
                err_c = errs[2 * k]
                delta = jnp.where(
                    (err_o < err_u) & (err_o < err_c), lr2[idx],
                    jnp.where((err_u <= err_o) & (err_u < err_c),
                              -lr2[idx], 0.0),
                )
                angles2 = angles.at[idx].add(delta)

                # Last active joint's min error feeds err_hist (parity with
                # the sequential loop's leftover over/under, predict.py:222).
                last_min = jnp.minimum(jnp.minimum(err_u, err_o)[-1], err_c)

                history2 = jnp.concatenate([angles2[None], history[:-1]])
                err_hist2 = jnp.concatenate([last_min[None], err_hist[:-1]])
                e0 = err_hist2[0]
                c1 = jnp.abs(jnp.mean(err_hist2) - e0) / e0 < early_stop
                rng = history2.max(0) - history2.min(0)
                c2 = jnp.all((rng <= min_inc) | jnp.isclose(rng, min_inc))
                c3 = jnp.all(history2[:3] == history2[0])
                return (angles2, lr2, history2, err_hist2, it + 1, c1 | c2 | c3)

            def cond(carry):
                return (carry[4] < its) & (~carry[5])

            angles, lr, history, err_hist, _, _ = jax.lax.while_loop(
                cond, body,
                (state.angles, state.lr, state.history, state.err_hist,
                 jnp.int32(0), jnp.bool_(False)),
            )
            return SearchState(angles, lr, history, err_hist)

        return descent

    @functools.lru_cache(maxsize=32)
    def _descent_fn(self, to_render: int, joints: tuple):
        """Sequential coordinate descent (reference predict.py:173-229,
        with one deliberate fix: monotone acceptance — see the inline
        comment).  ``joints`` is static: the per-joint loop is unrolled
        over active joints only, which removes the lax.cond branches and
        the wasted probes of inactive joints."""
        eval_batch = self._eval_fn(to_render)
        limits = self.joint_limits
        min_inc = self.min_ang_inc
        active = tuple(j for j, b in enumerate(joints) if b)

        def descent(
            state: SearchState,
            w2c,
            target: TargetBundle,
            its,  # int32
            rate_redux,  # f32
            early_stop,  # f32
            init_rate,  # [6] f32, nan = keep current (predict.py:175-177)
        ) -> SearchState:
            state = state._replace(
                lr=jnp.where(jnp.isnan(init_rate), state.lr, init_rate)
            )
            def body(carry):
                angles, lr, history, err_hist, it, stop = carry
                mean_hist = jnp.mean(history, axis=0)
                last_min = jnp.asarray(jnp.inf, jnp.float32)

                for j in active:  # static unroll (sequential dependency)
                    # Rate adaptation (predict.py:184-187).
                    lr_j = jnp.where(
                        jnp.abs(mean_hist[j] - angles[j]) <= lr[j],
                        lr[j] * rate_redux,
                        lr[j],
                    )
                    lr = jnp.maximum(lr.at[j].set(lr_j), min_inc)
                    under = angles.at[j].add(-lr[j])
                    over = angles.at[j].add(lr[j])
                    # MONOTONE acceptance — deliberate non-parity with the
                    # reference (predict.py:188-221), which always steps
                    # toward the lower of the two probes even when BOTH are
                    # worse than the incumbent.  On sharp minima (the wrist
                    # joints' landscape: err rises 1000x within +-4 deg,
                    # assets/eval_full_dof.py diagnostics) that walks the
                    # state out of the true basin — a descent seeded AT the
                    # truth drifted up to 17 deg in B.  Probing the
                    # incumbent alongside under/over costs one extra row in
                    # an already-batched eval.
                    errs = eval_batch(
                        jnp.stack([under, angles, over]), w2c, target
                    )
                    inl_u = (under[j] >= limits[j, 0]) & (under[j] <= limits[j, 1])
                    inl_o = (over[j] >= limits[j, 0]) & (over[j] <= limits[j, 1])
                    err_u = jnp.where(inl_u, errs[0], jnp.inf)
                    err_c = errs[1]
                    err_o = jnp.where(inl_o, errs[2], jnp.inf)
                    delta = jnp.where(
                        (err_o < err_u) & (err_o < err_c),
                        lr[j],
                        jnp.where((err_u <= err_o) & (err_u < err_c), -lr[j], 0.0),
                    )
                    angles = angles.at[j].add(delta)
                    last_min = jnp.minimum(jnp.minimum(err_o, err_u), err_c)

                history2 = jnp.concatenate([angles[None], history[:-1]])
                err_hist2 = jnp.concatenate([last_min[None], err_hist[:-1]])

                # Stop rules (predict.py:223-230).
                e0 = err_hist2[0]
                c1 = jnp.abs(jnp.mean(err_hist2) - e0) / e0 < early_stop
                rng = history2.max(0) - history2.min(0)
                c2 = jnp.all((rng <= min_inc) | jnp.isclose(rng, min_inc))
                c3 = jnp.all(history2[:3] == history2[0])
                return (angles, lr, history2, err_hist2, it + 1, c1 | c2 | c3)

            def cond(carry):
                return (carry[4] < its) & (~carry[5])

            angles, lr, history, err_hist, _, _ = jax.lax.while_loop(
                cond,
                body,
                (state.angles, state.lr, state.history, state.err_hist,
                 jnp.int32(0), jnp.bool_(False)),
            )
            return SearchState(angles, lr, history, err_hist)

        return descent

    _STAGE_VMAP_AXES = {
        "descent": (0, None, 0, None, None, None, None),
        "isweep": (0, None, 0, None, None),
        "tsweep": (0, None, 0, None, None),
        "gsweep": (0, None, 0, None, None, None),
        "sflip": (0, None, 0, None),
        "polish": (0, None, 0),
    }

    @functools.lru_cache(maxsize=32)
    def _stage_jit(
        self, kind: str, to_render: int, divs: int = 0, batched: bool = False,
        joints: tuple = (), radii: tuple = (), divs_b: int = 0,
    ):
        """jit (optionally vmapped-over-frames) wrapper around a stage core.

        Batched variants vmap over (SearchState, TargetBundle) leading axes
        with the camera and stage scalars shared — the basis of
        frame-parallel dataset prediction."""
        core = {
            "descent": lambda: self._descent_fn(to_render, joints),
            "descent_jacobi": lambda: self._descent_jacobi_fn(to_render, joints),
            "isweep": lambda: self._isweep_fn(to_render, divs),
            "tsweep": lambda: self._tsweep_fn(to_render, divs),
            "gsweep": lambda: self._gridsweep_fn(to_render, divs, divs_b),
            "sflip": lambda: self._sflip_fn(to_render),
            "polish": lambda: self._polish_fn(to_render, joints, radii),
        }[kind]()
        if batched:
            axes = self._STAGE_VMAP_AXES[kind.replace("_jacobi", "")]
            core = jax.vmap(core, in_axes=axes)
        return jax.jit(core)

    def descent(
        self, state: SearchState, target: TargetBundle, stage, jacobi: bool = False
    ) -> SearchState:
        """Run a Descent stage config as one device dispatch."""
        init_rate = np.array(
            [np.nan if r is None else r for r in stage.init_rate], np.float32
        )
        batched = state.angles.ndim == 2
        f = self._stage_jit(
            "descent_jacobi" if jacobi else "descent", stage.to_render,
            batched=batched, joints=tuple(bool(b) for b in stage.joints),
        )
        return f(
            state,
            self._w2c,
            target,
            jnp.int32(stage.its),
            jnp.float32(stage.rate_redux),
            jnp.float32(self._early_stop(stage.early_stop)),
            jnp.asarray(init_rate),
        )

    # ------------------------------------------------------------ sweeps
    @functools.lru_cache(maxsize=16)
    def _isweep_fn(self, to_render: int, divs: int):
        eval_batch = self._eval_fn(to_render)
        limits = self.joint_limits

        def isweep(state: SearchState, w2c, target, j, range_val) -> SearchState:
            angles, err_hist = state.angles, state.err_hist
            base_err = eval_batch(angles[None], w2c, target)[0]
            full = jnp.isnan(range_val)
            lo = jnp.where(
                full, limits[j, 0], jnp.maximum(angles[j] - range_val, limits[j, 0])
            )
            hi = jnp.where(
                full, limits[j, 1], jnp.minimum(angles[j] + range_val, limits[j, 1])
            )
            frac = jnp.arange(divs, dtype=jnp.float32) / (divs - 1)
            space_j = lo + (hi - lo) * frac
            space = jnp.tile(angles, (divs, 1)).at[:, j].set(space_j)
            errs = eval_batch(space, w2c, target)

            m = divs * 5
            x = lo + (hi - lo) * jnp.arange(m, dtype=jnp.float32) / (m - 1)
            pred = cubic_spline_uniform(lo, hi, errs, x)
            pred_min_ang = x[jnp.argmin(pred)]
            cand = angles.at[j].set(pred_min_ang)
            pred_min_err = eval_batch(cand[None], w2c, target)[0]

            grid_min = jnp.min(errs)
            min_type = jnp.argmin(jnp.stack([base_err, grid_min, pred_min_err]))
            angles_new = jax.lax.switch(
                min_type,
                [
                    lambda: angles,
                    lambda: space[jnp.argmin(errs)],
                    lambda: cand,
                ],
            )
            sel_err = jnp.where(min_type == 1, grid_min, pred_min_err)
            err_hist2 = jnp.where(
                min_type != 0,
                jnp.concatenate([sel_err[None], err_hist[:-1]]),
                err_hist,
            )
            history2 = jnp.concatenate([angles_new[None], state.history[:-1]])
            return SearchState(angles_new, state.lr, history2, err_hist2)

        return isweep

    def isweep(
        self, state: SearchState, target: TargetBundle, stage, joint_idx: int
    ) -> SearchState:
        f = self._stage_jit(
            "isweep", stage.to_render, stage.divs, batched=state.angles.ndim == 2
        )
        rng = jnp.float32(np.nan if stage.range is None else stage.range)
        return f(state, self._w2c, target, jnp.int32(joint_idx), rng)

    @functools.lru_cache(maxsize=16)
    def _tsweep_fn(self, to_render: int, divs: int):
        render = self._render_fn(to_render)
        limits = self.joint_limits

        def tsweep(state: SearchState, w2c, tgt_depth, j, range_val) -> SearchState:
            angles = state.angles
            full = jnp.isnan(range_val)
            lo = jnp.where(
                full, limits[j, 0], jnp.maximum(angles[j] - range_val, limits[j, 0])
            )
            hi = jnp.where(
                full, limits[j, 1], jnp.minimum(angles[j] + range_val, limits[j, 1])
            )
            frac = jnp.arange(divs, dtype=jnp.float32) / (divs - 1)
            space = jnp.tile(angles, (divs, 1)).at[:, j].set(lo + (hi - lo) * frac)
            depth, _ = render(space, w2c)
            # Sqrt-domain depth error, mean * -std (predict.py:363-369).
            m, s = mean_abs_std(jnp.sqrt(tgt_depth)[None] - jnp.sqrt(depth))
            errs = m * -s
            angles_new = space[jnp.argmin(errs)]
            history2 = jnp.concatenate([angles_new[None], state.history[:-1]])
            return SearchState(angles_new, state.lr, history2, state.err_hist)

        return tsweep

    def tensor_sweep(
        self,
        state: SearchState,
        tgt_depth: jnp.ndarray,
        stage,
        joint_idx: int,
    ) -> SearchState:
        f = self._stage_jit(
            "tsweep", stage.to_render, stage.divs, batched=state.angles.ndim == 2
        )
        rng = jnp.float32(np.nan if stage.range is None else stage.range)
        return f(state, self._w2c, tgt_depth, jnp.int32(joint_idx), rng)

    @functools.lru_cache(maxsize=16)
    def _gridsweep_fn(self, to_render: int, divs_a: int, divs_b: int):
        """2-D tensor-product sweep over joints (ja, jb) — stages.GridSweep.

        One batched eval of the divs_a*divs_b grid around (or, at full
        range, across) the two joints' limits; keeps the grid argmin only
        if it beats the incumbent.  Scored with the recipe's ACTUAL
        candidate objective (eval_batch, robust-aware), not the tsweep
        depth heuristic, because the grid exists to disambiguate coupled
        wrist joints whose signal is a small fraction of total error."""
        eval_batch = self._eval_fn(to_render)
        limits = self.joint_limits

        def gsweep(state: SearchState, w2c, target, ja, jb, range_val):
            angles, err_hist = state.angles, state.err_hist
            base_err = eval_batch(angles[None], w2c, target)[0]
            full = jnp.isnan(range_val)

            def span(j, divs):
                lo = jnp.where(
                    full, limits[j, 0],
                    jnp.maximum(angles[j] - range_val, limits[j, 0]),
                )
                hi = jnp.where(
                    full, limits[j, 1],
                    jnp.minimum(angles[j] + range_val, limits[j, 1]),
                )
                frac = jnp.arange(divs, dtype=jnp.float32) / (divs - 1)
                return lo + (hi - lo) * frac

            sa = span(ja, divs_a)  # [divs_a]
            sb = span(jb, divs_b)  # [divs_b]
            ga = jnp.repeat(sa, divs_b)
            gb = jnp.tile(sb, divs_a)
            space = jnp.tile(angles, (divs_a * divs_b, 1))
            space = space.at[:, ja].set(ga).at[:, jb].set(gb)
            errs = eval_batch(space, w2c, target)
            best = jnp.argmin(errs)
            better = errs[best] < base_err
            angles_new = jnp.where(better, space[best], angles)
            err_hist2 = jnp.where(
                better,
                jnp.concatenate([jnp.minimum(errs[best], base_err)[None],
                                 err_hist[:-1]]),
                err_hist,
            )
            history2 = jnp.concatenate([angles_new[None], state.history[:-1]])
            return SearchState(angles_new, state.lr, history2, err_hist2)

        return gsweep

    def grid_sweep(
        self, state: SearchState, target: TargetBundle, stage
    ) -> SearchState:
        """Run a GridSweep stage config as one device dispatch."""
        ja, jb = (int(j) for j in np.where(stage.joints)[0])
        f = self._stage_jit(
            "gsweep", stage.to_render, stage.divs[0],
            batched=state.angles.ndim == 2, divs_b=stage.divs[1],
        )
        rng = jnp.float32(np.nan if stage.range is None else stage.range)
        return f(state, self._w2c, target, jnp.int32(ja), jnp.int32(jb), rng)

    def _early_stop(self, early: float) -> float:
        """Descent early_stop_thresh, scaled down in robust mode.

        The relative-improvement stop divides by the TOTAL error
        (reference predict.py:223-230), which assumes err -> ~0 at
        convergence.  Robust/cluttered targets have an irreducible error
        floor at the true pose, so the test fires while the descent is
        still making real angular progress (config.ROBUST_EARLY_STOP_SCALE
        documents the measurement).  Parity lanes (tau=None) unscaled."""
        if self.robust_tau is None:
            return float(early)
        from ..config import ROBUST_EARLY_STOP_SCALE

        return float(early) * float(ROBUST_EARLY_STOP_SCALE)

    # ------------------------------------------------------------ lookup
    def _lookup_tau(self):
        """sqrt-domain truncation for the robust lookup metric, derived
        from the evaluator's meter-domain robust_tau: |sqrt(a) - sqrt(b)|
        ~= |a - b| / (2 sqrt(a)) ~= |a - b| / 2.5 at the ~1.5 m working
        envelope.  None when the evaluator is in parity mode."""
        return None if self.robust_tau is None else self.robust_tau * 0.4

    def _seed_nms_sep(self):
        """Angle-space NMS separation for top-k seeding — robust lanes
        only (parity keeps the reference's plain ranking).  See
        config.LOOKUP_SEED_NMS_SEP and :meth:`_topk_diverse`."""
        if self.robust_tau is None:
            return None
        from ..config import LOOKUP_SEED_NMS_SEP

        return float(LOOKUP_SEED_NMS_SEP) or None

    @staticmethod
    def _lookup_err(tgt_crop, lookup_sqrt, tau):
        """Per-candidate lookup error over the pre-rendered stack.

        ``tau=None`` — reference parity: ``mean(|tgt_raw - stack_sqrt|) *
        std`` with the target left in RAW depth against the sqrt-domain
        stack (predict.py:117 vs 406; a silhouette-weighted heuristic).
        With the default bfloat16 stack storage
        (config.LOOKUP_STACK_DTYPE) near-tied seeds can differ from an f32
        comparison — use "float32" for bit-parity selection.

        ``tau`` set — robust mode: truncated L1 in a CONSISTENT sqrt
        domain.  On cluttered neural targets the parity heuristic misranks
        catastrophically — measured (assets/diag_misrank2.py, 40-frame
        harness): a stack entry within 2-4 deg of the truth existed on
        every failure but ranked 38-5749, so all top-4 seeds sat in wrong
        basins ~100 deg away on 13/18 failing frames.  Truncation scores
        silhouette disagreement AREA (each mismatched pixel costs <= tau)
        instead of depth magnitude, the same fix as the candidate error's
        robust mode (ops/error.py link_error).

        Robust + 2-channel ``tgt_crop`` [2, ch, cw] — OCCLUSION-AWARE mode
        (the neural predictor's default): channel 0 is the seg-masked
        gated depth, channel 1 the raw observed scene depth (clutter and
        all, noise holes = 0).  Plain truncated L1 still charges the TRUE
        pose tau for every robot pixel the segmenter missed — occluded or
        dropped — so poses that "hide" outrank it (round-4
        diag_misrank2: the within-3-deg stack entry ranked 137-10792 on
        12/19 cluttered failures).  Instead:

        - detected pixels (seg > 0): trusted two-sided match
          ``min(|sqrt(seg) - stack|, tau)``;
        - undetected pixels with depth evidence (obs > 0) under a
          hypothesized robot pixel (stack > 0): one-sided FREE-SPACE
          VIOLATION ``min(max(sqrt(obs) - stack, 0), tau)`` — an observed
          surface *behind* the hypothesized robot proves the robot isn't
          there; a *nearer* surface legitimately occludes it and costs
          nothing.

        A pose is thus scored by how well it covers the detected fragment
        and whether its silhouette violates observed free space — never by
        the segmenter's recall."""
        if tau is None:
            m, s = mean_abs_std(tgt_crop[None] - lookup_sqrt)
            return m * s
        t = tgt_crop.astype(jnp.float32)
        stack = lookup_sqrt.astype(jnp.float32)
        tau = jnp.float32(tau)
        if t.ndim == 3:  # [2, ch, cw]: (seg-masked depth, raw scene depth)
            seg = jnp.sqrt(jnp.maximum(t[0], 0.0))
            obs = jnp.sqrt(jnp.maximum(t[1], 0.0))
            det = seg > 0
            match = jnp.where(
                det[None], jnp.minimum(jnp.abs(seg[None] - stack), tau), 0.0
            )
            free = jnp.where(
                (~det & (obs > 0))[None] & (stack > 0),
                jnp.minimum(jnp.maximum(obs[None] - stack, 0.0), tau),
                0.0,
            )
            return jnp.sum(match + free, axis=(1, 2))
        d = jnp.abs(jnp.sqrt(jnp.maximum(t, 0.0))[None] - stack)
        return jnp.sum(jnp.minimum(d, tau), axis=(1, 2))

    @staticmethod
    @functools.partial(jax.jit, static_argnames=("tau",))
    def lookup_select(
        tgt_crop: jnp.ndarray,  # [ch, cw] raw-domain cropped target depth
        lookup_sqrt: jnp.ndarray,  # [N, ch, cw] sqrt-domain lookup stack
        lookup_angles: jnp.ndarray,  # [N, 6]
        tau: float = None,
    ) -> jnp.ndarray:
        """Lookup-stage argmin (see _lookup_err for the tau semantics)."""
        err = CandidateEvaluator._lookup_err(tgt_crop, lookup_sqrt, tau)
        return lookup_angles[jnp.argmin(err)]

    @staticmethod
    def _topk_diverse(err, lookup_angles, k: int, min_sep: float):
        """Greedy diverse top-k over the lookup stack -> angles [k, 6].

        Plain top-k seeds are near-duplicates: the stack is a dense joint
        grid, so the k lowest errors usually sit in ONE basin (round-4
        diag_misrank2: on every cluttered failure a within-3-deg entry
        existed but ranked 137-10792 — behind thousands of copies of the
        same wrong basin).  Greedy NMS in angle space picks each successive
        seed as the lowest-error entry at least ``min_sep`` radians (L-inf
        over joints) from every already-picked seed, so k seeds cover k
        distinct basins instead of one.  Cost: k masked argmins over [N].
        """
        min_sep = jnp.float32(min_sep)

        def pick(err_i, _):
            idx = jnp.argmin(err_i)
            ang = lookup_angles[idx]
            dist = jnp.max(jnp.abs(lookup_angles - ang[None]), axis=1)
            return jnp.where(dist < min_sep, jnp.inf, err_i), idx

        _, idxs = jax.lax.scan(pick, err.astype(jnp.float32), None, length=k)
        return lookup_angles[idxs]

    @staticmethod
    @functools.partial(jax.jit, static_argnames=("k", "tau", "min_sep"))
    def lookup_select_topk(
        tgt_crop: jnp.ndarray,
        lookup_sqrt: jnp.ndarray,
        lookup_angles: jnp.ndarray,
        k: int,
        tau: float = None,
        min_sep: float = None,
    ) -> jnp.ndarray:
        """Top-k lookup candidates: -> angles [k, 6] (best first).

        Seeds multi-hypothesis refinement: each candidate runs the full
        stage pipeline frame-batched and the lowest final error wins —
        robustness against wrong-basin lookup inits (a failure mode the
        reference's single-seed search shares).  ``min_sep`` (radians)
        switches to diversity-enforced selection (:meth:`_topk_diverse`)."""
        err = CandidateEvaluator._lookup_err(tgt_crop, lookup_sqrt, tau)
        if min_sep:
            return CandidateEvaluator._topk_diverse(
                err, lookup_angles, k, min_sep
            )
        _, idx = jax.lax.top_k(-err, k)
        return lookup_angles[idx]

    @staticmethod
    @functools.partial(jax.jit, static_argnames=("k", "tau", "min_sep"))
    def lookup_select_batch(
        tgt_crops: jnp.ndarray,  # [F, ch, cw]
        lookup_sqrt: jnp.ndarray,  # [N, ch, cw]
        lookup_angles: jnp.ndarray,  # [N, 6]
        k: int = 1,
        tau: float = None,
        min_sep: float = None,
    ) -> jnp.ndarray:
        """Frame-batched lookup argmin: -> angles [F, 6] (or [F, k, 6]
        best-first when ``k`` > 1).  lax.map bounds the [N, ch, cw] diff
        intermediate to one frame at a time."""

        def one(tgt):
            err = CandidateEvaluator._lookup_err(tgt, lookup_sqrt, tau)
            if k > 1:
                if min_sep:
                    return CandidateEvaluator._topk_diverse(
                        err, lookup_angles, k, min_sep
                    )
                _, idx = jax.lax.top_k(-err, k)
                return lookup_angles[idx]
            return lookup_angles[jnp.argmin(err)]

        return jax.lax.map(one, tgt_crops)

    # ------------------------------------------------------------ polish
    @functools.lru_cache(maxsize=16)
    def _polish_fn(self, to_render: int, joints: tuple, radii: tuple):
        """Fine pattern search (stages.Polish): per radius, ONE batched eval
        of all 3^k offset combinations over the active joints; keep the
        argmin (the zero offset is a candidate, so the error never
        regresses).  Candidates outside joint limits are clamped."""
        eval_batch = self._eval_fn(to_render)
        limits = self.joint_limits
        active = [j for j, b in enumerate(joints) if b]
        k = len(active)
        # [3^k, 6] unit offsets over active joints.
        grids = np.meshgrid(*([[-1.0, 0.0, 1.0]] * k), indexing="ij")
        combos = np.stack([g.ravel() for g in grids], axis=-1)  # [3^k, k]
        offsets = np.zeros((combos.shape[0], 6), np.float32)
        offsets[:, active] = combos

        def polish(state: SearchState, w2c, target: TargetBundle) -> SearchState:
            angles = state.angles
            off = jnp.asarray(offsets)
            for r in radii:
                cands = jnp.clip(
                    angles[None] + off * r, limits[:, 0], limits[:, 1]
                )
                errs = eval_batch(cands, w2c, target)
                angles = cands[jnp.argmin(errs)]
            history2 = jnp.concatenate([angles[None], state.history[:-1]])
            return state._replace(angles=angles, history=history2)

        return polish

    @functools.lru_cache(maxsize=8)
    def fine_polish_fn(
        self, to_render: int, joints: tuple, radii: tuple, scale: int
    ):
        """Pattern search evaluated at ``scale``x the working resolution.

        The working-res error landscape plateaus once moves stop changing
        any rasterized pixel (~1 px subtense, the precision floor behind
        the ~0.46 deg median at 160x90).  Evaluating the final pattern
        search at 2x halves that floor for a handful of batched evals —
        the target must be prepared at the same scale (predictor fine
        preps).  Plain angles -> angles (composable after any recipe)."""
        eval_batch = self._eval_fn(to_render, scale)
        limits = self.joint_limits
        active = [j for j, b in enumerate(joints) if b]
        k = len(active)
        grids = np.meshgrid(*([[-1.0, 0.0, 1.0]] * k), indexing="ij")
        combos = np.stack([g.ravel() for g in grids], axis=-1)
        offsets = np.zeros((combos.shape[0], 6), np.float32)
        offsets[:, active] = combos

        def fine_polish(angles, w2c, target: TargetBundle):
            off = jnp.asarray(offsets)
            for r in radii:
                cands = jnp.clip(
                    angles[None] + off * r, limits[:, 0], limits[:, 1]
                )
                errs = eval_batch(cands, w2c, target)
                angles = cands[jnp.argmin(errs)]
            return angles

        return fine_polish

    def polish(self, state: SearchState, target: TargetBundle, stage) -> SearchState:
        f = self._stage_jit(
            "polish", stage.to_render, batched=state.angles.ndim == 2,
            joints=tuple(bool(b) for b in stage.joints), radii=stage.radii,
        )
        return f(state, self._w2c, target)

    # ------------------------------------------------------------ sflip
    @functools.lru_cache(maxsize=8)
    def _sflip_fn(self, to_render: int):
        eval_batch = self._eval_fn(to_render)
        limits = self.joint_limits

        def sflip(state: SearchState, w2c, target: TargetBundle, cam_pose):
            """Perspective S-flip (predict.py:232-281), fully on device.

            Evaluates a fixed 4-candidate batch (base, flip, lower endpoint,
            upper endpoint) and applies the reference's branch logic —
            including the quirk that only the *last* endpoint's error
            survives its loop (predict.py:268-277), so only the upper
            endpoint can win."""
            angles = state.angles
            # Shadow-equivalent flip about the camera azimuth.
            a = cam_pose[5] * jnp.abs(jnp.cos(cam_pose[3])) + cam_pose[4] * jnp.abs(
                jnp.sin(cam_pose[3])
            )
            flip0 = -angles[0] + 2 * a * jnp.sign(angles[0])
            flip = angles.at[0].set(flip0)
            lower = angles.at[0].set(limits[0, 0])
            upper = angles.at[0].set(limits[0, 1])
            errs = eval_batch(jnp.stack([angles, flip, lower, upper]), w2c, target)

            limit_thresh = 0.15
            in_limits = (flip0 >= limits[0, 0]) & (flip0 <= limits[0, 1])
            close = (jnp.abs(limits[0, 0] - flip0) < limit_thresh) | (
                jnp.abs(limits[0, 1] - flip0) < limit_thresh
            )
            base_err = errs[0]
            take_flip = in_limits & (errs[1] < base_err)
            best = jnp.where(take_flip, flip, angles)
            best_err = jnp.where(take_flip, errs[1], base_err)
            take_upper = ((~in_limits) | close) & (errs[3] < best_err)
            best = jnp.where(take_upper, upper, best)
            return state._replace(angles=best)

        return sflip

    def sflip(self, state: SearchState, target: TargetBundle, stage) -> SearchState:
        f = self._stage_jit("sflip", stage.to_render, batched=state.angles.ndim == 2)
        return f(state, self._w2c, target, jnp.asarray(self.camera_pose, jnp.float32))

    # ------------------------------------------------------------ fused recipe
    def _apply_stage(self, skey, state, w2c, target, cam_pose, jacobi):
        """Trace one stage (described by its hashable key) onto the state."""
        kind = skey[0]
        if kind == "sflip":
            return self._sflip_fn(skey[1])(state, w2c, target, cam_pose)
        if kind == "polish":
            _, to_render, radii, joints = skey
            return self._polish_fn(to_render, joints, radii)(state, w2c, target)
        if kind == "descent":
            _, to_render, its, redux, early, init_rate, joints = skey
            fn = (
                self._descent_jacobi_fn(to_render, joints)
                if jacobi
                else self._descent_fn(to_render, joints)
            )
            ir = jnp.asarray(
                [np.nan if r is None else r for r in init_rate], jnp.float32
            )
            return fn(
                state, w2c, target, jnp.int32(its),
                jnp.float32(redux), jnp.float32(self._early_stop(early)), ir,
            )
        if kind == "isweep":
            _, to_render, divs, rng_, joints = skey
            fn = self._isweep_fn(to_render, divs)
            rv = jnp.float32(np.nan if rng_ is None else rng_)
            for j in (i for i, b in enumerate(joints) if b):
                state = fn(state, w2c, target, jnp.int32(j), rv)
            return state
        if kind == "tsweep":
            _, to_render, divs, rng_, joints = skey
            fn = self._tsweep_fn(to_render, divs)
            rv = jnp.float32(np.nan if rng_ is None else rng_)
            for j in (i for i, b in enumerate(joints) if b):
                state = fn(state, w2c, target.depth, jnp.int32(j), rv)
            return state
        if kind == "gsweep":
            _, to_render, da, db, rng_, joints = skey
            fn = self._gridsweep_fn(to_render, da, db)
            rv = jnp.float32(np.nan if rng_ is None else rng_)
            ja, jb = (i for i, b in enumerate(joints) if b)
            return fn(state, w2c, target, jnp.int32(ja), jnp.int32(jb), rv)
        raise TypeError(f"Unknown stage kind {kind}")

    @functools.lru_cache(maxsize=16)
    def _recipe_jit(self, key, topk, jacobi, batched, history_length,
                    final_render: int = 6, seeded: bool = False,
                    return_k: bool = False):
        return jax.jit(
            self._recipe_fn(key, topk, jacobi, batched, history_length,
                            final_render, seeded, return_k)
        )

    @functools.lru_cache(maxsize=16)
    def _recipe_fn(
        self,
        key: tuple,
        topk: int,
        jacobi: bool,
        batched: bool,
        history_length: int,
        final_render: int = 6,
        seeded: bool = False,
        return_k: bool = False,
    ):
        """Compile an entire stage recipe into ONE device program.

        The reference's stage loop ran ~10 separate dispatches per frame with
        host round-trips between them (robotpose/prediction/predict.py:159-374
        interleaves Python control with GPU work); here the full
        lookup -> sflip -> sweeps -> descent composition traces into a single
        XLA executable, so per-frame device traffic is one upload + one
        angles read-back — critical on remote-attached chips.

        ``topk`` > 1 fans the best-k lookup seeds into a hypothesis batch
        (vmapped over the remaining stages) and returns the lowest-error
        hypothesis.  ``batched`` vmaps the whole recipe over a leading frame
        axis (the workload's data-parallel axis, SURVEY.md §2.9).

        ``return_k`` (topk recipes) returns the final_m survivor
        hypotheses as ``(angles [m, 6], errors [m])`` — batched:
        ``([F, m, 6], [F, m])`` — instead of selecting a winner: the
        caller re-ranks them at a higher-fidelity objective (the
        predictor's fine-resolution re-rank; the working-res errors of
        wrong-basin survivors measure within ~2-4%% of the truth basin on
        cluttered frames, assets/diag_misrank2.py, and the synth240
        wrong-basin frame ranks the truth seed 3rd yet loses the
        working-res selection — BENCHMARKS.md round 5).
        """
        if return_k:
            assert topk > 1, "return_k requires a topk recipe"
        lookup_pos = next(
            (i for i, sk in enumerate(key) if sk[0] == "lookup"), None
        )
        pre = key[: lookup_pos if lookup_pos is not None else 0]
        post = key[lookup_pos + 1 :] if lookup_pos is not None else key

        # Eagerly build every lru-cached stage closure OUTSIDE the trace so
        # their internal constants are concrete (first-build inside a trace
        # would capture tracers that leak into subsequent traces).
        for sk in key:
            kind = sk[0]
            if kind == "sflip":
                self._sflip_fn(sk[1])
            elif kind == "descent":
                (self._descent_jacobi_fn if jacobi else self._descent_fn)(
                    sk[1], sk[6]
                )
            elif kind == "isweep":
                self._isweep_fn(sk[1], sk[2])
            elif kind == "tsweep":
                self._tsweep_fn(sk[1], sk[2])
            elif kind == "gsweep":
                self._gridsweep_fn(sk[1], sk[2], sk[3])
            elif kind == "polish":
                self._polish_fn(sk[1], sk[3], sk[2])

        lookup_tau = self._lookup_tau()
        nms_sep = self._seed_nms_sep()

        def lookup_one(tgt_crop, lookup_sqrt, lookup_angles):
            err = self._lookup_err(tgt_crop, lookup_sqrt, lookup_tau)
            if topk > 1:
                if nms_sep:
                    return self._topk_diverse(
                        err, lookup_angles, topk, nms_sep
                    )
                _, idx = jax.lax.top_k(-err, topk)
                return lookup_angles[idx]  # [k, 6]
            return lookup_angles[jnp.argmin(err)]

        def run_post(seed, w2c, target, cam_pose):
            state = SearchState.fresh(history_length)._replace(angles=seed)
            for sk in post:
                state = self._apply_stage(sk, state, w2c, target, cam_pose, jacobi)
            return state.angles

        # Staged top-k: the candidate basins are ranked by the cheap early
        # stages (flips + sweeps + coarse descent); only the best
        # config.TOPK_FINAL survivors run the expensive final descent
        # (+ polish), which is the recipe's costliest span.  The split
        # point is the last descent in the recipe; recipes without one
        # (e.g. 'SL') run every seed end-to-end.  Measured on 150
        # synthetic frames (see config.TOPK_FINAL): the cheap-stage
        # ranking alone misses basins the final descent would reorder
        # (p90 1.39 vs 0.96 deg full), so 2 survivors is the default.
        from ..config import TOPK_FINAL

        _last_desc = max(
            (i for i, sk in enumerate(post) if sk[0] == "descent"),
            default=None,
        )
        _split = (
            _last_desc
            if (topk > 1 and _last_desc is not None and TOPK_FINAL < topk)
            else None
        )
        post_cheap = post[:_split] if _split is not None else post
        post_final = post[_split:] if _split is not None else ()
        final_m = min(max(1, TOPK_FINAL), topk)

        def run_cheap_state(seed, w2c, target, cam_pose):
            state = SearchState.fresh(history_length)._replace(angles=seed)
            for sk in post_cheap:
                state = self._apply_stage(sk, state, w2c, target, cam_pose, jacobi)
            return state

        def run_final_state(state, w2c, target, cam_pose):
            for sk in post_final:
                state = self._apply_stage(sk, state, w2c, target, cam_pose, jacobi)
            return state

        def topk_survivors(seeds, w2c, target, cam_pose):
            """seeds [k, 6] -> (angles [m, 6], errors [m]): the final_m
            survivor hypotheses after the staged search (m = k when the
            recipe has no final-descent split)."""
            states = jax.vmap(
                run_cheap_state, in_axes=(0, None, None, None)
            )(seeds, w2c, target, cam_pose)
            errs = eval6(states.angles, w2c, target)
            if not post_final:
                return states.angles, errs
            _, idx = jax.lax.top_k(-errs, final_m)
            survivors = jax.tree.map(lambda x: x[idx], states)
            survivors = jax.vmap(
                run_final_state, in_axes=(0, None, None, None)
            )(survivors, w2c, target, cam_pose)
            errs_f = eval6(survivors.angles, w2c, target)
            return survivors.angles, errs_f

        def topk_post(seeds, w2c, target, cam_pose):
            """seeds [k, 6] -> (angles [6], final error scalar)."""
            angs, errs = topk_survivors(seeds, w2c, target, cam_pose)
            win = jnp.argmin(errs)
            return angs[win], errs[win]

        eval6 = self._eval_fn(final_render)

        if seeded:
            # Seeded variant: the lookup argmin has already run as its own
            # dispatch (required when the lookup stack is sharded across
            # devices — embedding the cross-device all-gather inside this
            # while-loop-heavy program lets GSPMD partition the whole
            # recipe, which can deadlock XLA:CPU's collective rendezvous
            # on small hosts and wastes multi-chip cycles re-running the
            # replicated search on every device).  All inputs here are
            # replicated/single-device; the program is collective-free.
            assert not pre, "seeded recipe requires lookup-first stages"

            def single_seeded(w2c, cam_pose, target, seeds):
                if topk > 1:
                    if return_k:
                        return topk_survivors(seeds, w2c, target, cam_pose)
                    best, _ = topk_post(seeds, w2c, target, cam_pose)
                    return best
                return run_post(seeds, w2c, target, cam_pose)

            if batched:
                if topk > 1:
                    def seeded_frame(w2c, cam_pose, target, seed_k):
                        if return_k:
                            return topk_survivors(
                                seed_k, w2c, target, cam_pose
                            )
                        best, _ = topk_post(seed_k, w2c, target, cam_pose)
                        return best

                    return jax.vmap(
                        seeded_frame, in_axes=(None, None, 0, 0)
                    )
                return jax.vmap(
                    lambda w2c, cam_pose, target, seed: run_post(
                        seed, w2c, target, cam_pose
                    ),
                    in_axes=(None, None, 0, 0),
                )
            return single_seeded

        def single(w2c, cam_pose, target, tgt_crop, lookup_sqrt, lookup_angles):
            state = SearchState.fresh(history_length)
            for sk in pre:
                state = self._apply_stage(sk, state, w2c, target, cam_pose, jacobi)
            if lookup_pos is None:
                for sk in post:
                    state = self._apply_stage(
                        sk, state, w2c, target, cam_pose, jacobi
                    )
                return state.angles
            seeds = lookup_one(tgt_crop, lookup_sqrt, lookup_angles)
            if topk > 1:
                if return_k:
                    return topk_survivors(seeds, w2c, target, cam_pose)
                best, _ = topk_post(seeds, w2c, target, cam_pose)
                return best
            return run_post(seeds, w2c, target, cam_pose)

        fn = single
        if batched:
            if not pre and lookup_pos is not None:
                # Lookup via lax.map over frames (bounds the [N, ch, cw]
                # diff intermediate to one frame at a time), then the rest
                # of the recipe vmapped over the frame axis.  With topk > 1
                # the seeds come out [F, k, 6] and each frame runs the
                # staged top-k search (cheap stages on all k, final descent
                # on the TOPK_FINAL survivors).
                def batched_fn(
                    w2c, cam_pose, target, tgt_crop, lookup_sqrt, lookup_angles
                ):
                    seeds = jax.lax.map(
                        lambda t: lookup_one(t, lookup_sqrt, lookup_angles),
                        tgt_crop,
                    )
                    if topk > 1:
                        def per_frame(seed_k, tgt):
                            if return_k:
                                return topk_survivors(
                                    seed_k, w2c, tgt, cam_pose
                                )
                            best, _ = topk_post(seed_k, w2c, tgt, cam_pose)
                            return best

                        return jax.vmap(per_frame, in_axes=(0, 0))(
                            seeds, target
                        )
                    return jax.vmap(
                        lambda seed, tgt: run_post(seed, w2c, tgt, cam_pose),
                        in_axes=(0, 0),
                    )(seeds, target)

                fn = batched_fn
            else:
                fn = jax.vmap(single, in_axes=(None, None, 0, 0, None, None))
        return fn

    def run_recipe(
        self,
        stages,
        target: TargetBundle,
        tgt_crop: jnp.ndarray,
        lookup_sqrt: jnp.ndarray,
        lookup_angles: jnp.ndarray,
        topk: int = 1,
        jacobi: bool = False,
        batched: bool = False,
        history_length: int = 5,
        return_k: bool = False,
    ) -> jnp.ndarray:
        """Run a whole stage recipe as one fused device dispatch -> angles
        (or, with ``return_k``, the final_m survivor hypotheses + errors —
        see :meth:`_recipe_fn`).

        When the lookup stack is sharded across devices, the lookup argmin
        runs as its own (collective-bearing) dispatch and the rest of the
        recipe runs seeded and collective-free — see the seeded branch of
        :meth:`_recipe_fn` for why.
        """
        key = _stage_key(stages)
        sharding = getattr(lookup_sqrt, "sharding", None)
        multi = (
            sharding is not None
            and len(getattr(sharding, "device_set", ())) > 1
        )
        has_lookup = any(sk[0] == "lookup" for sk in key)
        if multi and has_lookup and key[0][0] == "lookup":
            lt = self._lookup_tau()
            sep = self._seed_nms_sep()
            if batched:
                seeds = self.lookup_select_batch(
                    tgt_crop, lookup_sqrt, lookup_angles, k=topk, tau=lt,
                    min_sep=sep,
                )
            elif topk > 1:
                seeds = self.lookup_select_topk(
                    tgt_crop, lookup_sqrt, lookup_angles, topk, tau=lt,
                    min_sep=sep,
                )
            else:
                seeds = self.lookup_select(
                    tgt_crop, lookup_sqrt, lookup_angles, tau=lt
                )
            # Host round-trip of <=k*24 bytes: re-uploads the seeds as an
            # uncommitted single-device constant so the seeded program
            # stays off the lookup mesh entirely.
            seeds = jnp.asarray(np.asarray(seeds), jnp.float32)
            f = self._recipe_jit(
                key, topk, jacobi, batched, history_length, seeded=True,
                return_k=return_k,
            )
            return f(
                self._w2c,
                jnp.asarray(self.camera_pose, jnp.float32),
                target,
                seeds,
            )
        f = self._recipe_jit(key, topk, jacobi, batched, history_length,
                             return_k=return_k)
        return f(
            self._w2c,
            jnp.asarray(self.camera_pose, jnp.float32),
            target,
            tgt_crop,
            lookup_sqrt,
            lookup_angles,
        )
