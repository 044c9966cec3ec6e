"""Per-frame joint-angle predictor.

API-parity re-implementation of the reference ``Predictor``
(``robotpose/prediction/predict.py:37-375``): same constructor signature,
same staged search recipes, same outputs — but every stage executes as a
batched device program through :class:`~ropes3d_tpu.prediction.engine.
CandidateEvaluator` instead of per-candidate OpenGL renders.

Target preprocessing (``_segmentLoad``/``_loadSynthetic``,
predict.py:397-469) builds a device-resident :class:`TargetBundle`; the
segmentation network path uses the JAX Mask R-CNN
(``ropes3d_tpu/models``), the synthetic path recovers masks from render
colors exactly as the reference's color_dict branch does.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    DEFAULT_CAMERA_POSE,
    DEPTH_GATE_BODY,
    DEPTH_GATE_LINK,
    ERROR_ROBUST_TAU,
    LOOKUP_JOINTS,
    LOOKUP_NUM_RENDERED,
)
from ..camera import Intrinsics
from ..ops.error import TargetBundle
from ..ops.image import close_mask, downsample
from ..robot import URDFReader
from ..simulation.crop_cache import Crop, applyCrop
from ..simulation.lookup import RobotLookupManager
from ..simulation.renderer import Renderer
from ..utils import StageTimer
from .engine import CandidateEvaluator, SearchState
from .stages import (
    Descent, GridSweep, InterpolativeSweep, Lookup, Polish, SFlip, TensorSweep,
    getStages,
)

HISTORY_LENGTH = 5


class PendingFrame:
    """An in-flight fused-lane frame (``run_synthetic``/``run_real`` with
    ``block=False``): the device program is dispatched, the host read-back
    deferred to :meth:`Predictor.finish`."""

    __slots__ = ("out",)

    def __init__(self, out):
        self.out = out


class Predictor:
    def __init__(
        self,
        camera_pose: np.ndarray = DEFAULT_CAMERA_POSE,
        ds_factor: int = 8,
        preview: bool = False,
        save_to: str = None,
        do_angles: str = "SLU",
        min_angle_inc: np.ndarray = np.array([0.005] * 6),
        base_intrin: str = "1280_720_color",
        model_ds: str = "set10",
        color_dict: Optional[dict] = None,
        search_mode: str = "parity",
        lookup_topk="auto",
        fine_polish: bool = True,
        robust_tau: float = "auto",
    ):
        """``search_mode``: 'parity' (default) replays the reference's
        sequential per-joint descent exactly; 'fast' batches each descent
        iteration's joint probes into one eval with Jacobi updates (fewer,
        larger device steps — useful at higher working resolutions where
        per-render cost dominates over iteration count).

        ``lookup_topk``: number of lookup seeds explored as parallel
        hypotheses (the reference's single-seed lookup falls into wrong
        basins, predict.py:163-171).  Uses the STAGED schedule
        (config.TOPK_FINAL): all seeds run the cheap early stages, the
        best 2 survivors run the final descent + polish.  ``"auto"``
        (default) resolves to 4 on synthetic targets (0.27 deg median /
        1.15 p90 on 200 synthetic frames vs 0.40/2.02 single-seed, ~25%
        more device time) and 8 on neural targets — cluttered scenes
        misrank more seeds, and the extra cheap-stage hypotheses are free
        next to segmentation + final descent (40-frame cluttered harness:
        k=8 median 0.170 deg / p90 6.7 at p50 213 ms vs k=4
        0.207/8.1 at 219 ms).  k = 1 forces pure single-seed.  (A
        confidence-triggered escape mode was measured and removed: the
        top-k advantage is a broad best-of-k improvement, not a detectable
        tail — no trigger feature (global error ratio, per-link ratios,
        lookup margins) recovered the top-k median at any re-run fraction,
        assets/diag_escape_feats.py.)"""
        assert search_mode in ("fast", "parity")
        self.search_mode = search_mode
        # lookup_topk > 1 refines the best k lookup seeds in parallel
        # (hypothesis-batched stages) and keeps the lowest-error result.
        if lookup_topk == "auto":
            lookup_topk = 4 if color_dict is not None else 8
        self.lookup_topk = int(lookup_topk)
        self.ds_factor, self.preview = ds_factor, preview
        self.do_angles = do_angles.upper()
        self.min_ang_inc = min_angle_inc
        self.history_length = HISTORY_LENGTH
        self.timer = StageTimer()

        self.intrinsics = Intrinsics(base_intrin)
        self.intrinsics.downscale(ds_factor)
        self.u_reader = URDFReader()
        self.renderer = Renderer("seg", camera_pose, self.intrinsics)

        self.synthetic = color_dict is not None
        self.classes = ["BG"] + self.u_reader.mesh_names[:6]
        self.link_names = self.classes[1:]

        if self.synthetic:
            self.color_dict = color_dict
        else:
            from ..training.model_registry import ModelManager
            from ..models.inference import Segmenter

            mm = ModelManager()
            ckpt = mm.dynamicLoad(dataset=model_ds)
            if ckpt is None:
                # Fall back to the best available model of any dataset
                # (mirrors the reference's permissive dynamicLoad warnings,
                # models.py:269-286).
                ckpt = mm.dynamicLoad()
                if ckpt is None:
                    raise FileNotFoundError(
                        f"No trained segmentation model for dataset "
                        f"{model_ds!r} and no fallback model in models/. "
                        "Train one (train.py) or bootstrap "
                        "(ropes3d_tpu.training.bootstrap)."
                    )
                import logging

                logging.getLogger(__name__).warning(
                    "No model trained on %s; falling back to %s", model_ds, ckpt
                )
            self.seg = Segmenter(ckpt, class_names=self.classes)

        # Robust depth-residual truncation for neural-segmented targets
        # (config.ERROR_ROBUST_TAU rationale); the synthetic path keeps
        # exact reference parity (its masks are exact, the parity formula
        # is already well-conditioned there).
        if robust_tau == "auto":
            robust_tau = None if self.synthetic else ERROR_ROBUST_TAU
        self.robust_tau = robust_tau
        self.engine = CandidateEvaluator(
            camera_pose, self.intrinsics, min_angle_inc, urdf=self.u_reader,
            robust_tau=robust_tau,
        )
        self.crops = Crop(camera_pose, self.intrinsics)

        # Fine-polish pass (config.FINE_POLISH_*): a final pattern search
        # evaluated at FINE_POLISH_SCALE x the working resolution, below
        # the working-res pixel-quantization floor.  Auto-disabled when
        # ds_factor doesn't divide by the scale (no exact finer grid).
        # Resolution itself no longer gates it: the fused kernel streams
        # per-tile target blocks from HBM above padded width 512, so the
        # scaled eval fits at any working resolution.
        from ..config import FINE_POLISH_SCALE
        from ..utils.common import str_to_arr

        s = int(FINE_POLISH_SCALE)
        fits = s > 1 and ds_factor % s == 0
        self.fine_scale = s if (fine_polish and fits) else 0
        self._fine_joints = tuple(bool(b) for b in str_to_arr(self.do_angles))
        self._fine_target = None

        if preview:
            from .viz import ProjectionViz

            self.viz = ProjectionViz(save_to)

        self.changeCameraPose(camera_pose)

    # ------------------------------------------------------------ camera
    def changeCameraPose(self, camera_pose) -> None:
        self.camera_pose = np.asarray(camera_pose, float)
        self.renderer.setCameraPose(camera_pose)
        self.engine.set_camera_pose(camera_pose)
        self._loadLookup()

    def _loadLookup(self) -> None:
        from ..parallel.mesh import shard_lookup_stack

        lm = RobotLookupManager()
        ang, depth = lm.get(
            self.intrinsics, self.camera_pose, LOOKUP_NUM_RENDERED, LOOKUP_JOINTS
        )
        from ..config import LOOKUP_STACK_DTYPE

        angles = jnp.asarray(ang, jnp.float32)
        # Sqrt-domain device-resident stack (predict.py:117), sharded over
        # the candidate axis when multiple chips are attached.  Stored
        # bfloat16 by default (config.LOOKUP_STACK_DTYPE): the lookup argmin
        # is HBM-bound (the stack is read once per frame) and the ~0.4%
        # value quantization only perturbs near-tied seeds that the
        # downstream stages re-optimize anyway; the error arithmetic itself
        # stays f32 (mean_abs_std upcasts).  Set "float32" for bit-parity
        # seed selection.
        stack = jnp.sqrt(jnp.asarray(depth, jnp.float32)).astype(
            jnp.dtype(LOOKUP_STACK_DTYPE)
        )
        self.lookup_depth, self.lookup_angles, self._lookup_mesh = (
            shard_lookup_stack(stack, angles)
        )

    def _setStages(self) -> None:
        self.stages = getStages(self.do_angles)
        if self.stages is None:
            raise ValueError(
                f"Stages not defined for joint set {self.do_angles}. "
                "Define in ropes3d_tpu/prediction/stages.py."
            )

    # ------------------------------------------------------------ targets
    def _downsample(self, base: np.ndarray, factor: int) -> np.ndarray:
        return np.asarray(downsample(jnp.asarray(base), factor))

    def _build_bundle(
        self, masks: dict, masked: dict, tgt_depth: np.ndarray, occ=None
    ):
        h, w = tgt_depth.shape
        m = np.zeros((6, h, w), bool)
        md = np.zeros((6, h, w), np.float32)
        present = np.zeros(6, bool)
        for i, link in enumerate(self.link_names):
            if link in masks:
                m[i] = masks[link]
                md[i] = masked[link]
                present[i] = True
        return TargetBundle(
            jnp.asarray(m), jnp.asarray(md), jnp.asarray(present),
            jnp.asarray(tgt_depth, jnp.float32),
            None if occ is None else jnp.asarray(occ, jnp.float32),
        )

    def _prepare_synthetic_device(self):
        """Jitted synthetic target prep.  Returns (bundle, crop) — plus the
        fine-polish target as a third element when fine polish is enabled
        (callers store it as ``self._fine_target`` for the stage loop)."""
        import jax as _jax

        base = self._synth_prep_core()
        if not self.fine_scale:
            return _jax.jit(base)
        fine = self._synth_prep_fine_core()

        def prep3(a, b):
            bundle, crop = base(a, b)
            return bundle, crop, fine(a, b)

        return _jax.jit(prep3)

    def _synth_prep_core(self):
        """Build the device-resident synthetic target preparation (unjitted
        core, composable into larger fused programs).

        Equivalent to downsample+color-equality mask recovery
        (predict.py:445-469) but from the renderer's (depth, link_id) maps:
        a downsampled pixel belongs to a link iff all sampled source pixels
        do — exactly the exact-color-match-after-2x2-average criterion.
        Keeps the whole frame on device (zero host transfers).
        """
        import functools as ft

        from ..ops.image import downsample as ds

        f = self.ds_factor
        crop = [int(x) for x in self.crops[LOOKUP_NUM_RENDERED]]

        from ..config import DEFAULT_RENDER_COLORS

        # Reconstruct the blue channel from link ids so mask recovery is
        # bit-identical to the reference's color-equality path — including
        # its quirks (base blue 0 == background; 2x2-average collisions
        # where blended colors round to another link's blue).
        blues = np.asarray(
            [0.0] + [float(c[0]) for c in DEFAULT_RENDER_COLORS[:6]], np.float32
        )  # index 0 = background (numpy: closure may build inside a trace)

        def prep(depth_full, lid_full):
            blues_j = jnp.asarray(blues)
            depth = ds(depth_full, f)
            blue_full = blues_j[lid_full + 1]
            blue = jnp.round(ds(blue_full, f))

            def link_mask(i):
                return blue == jnp.round(blues_j[i + 1])

            masks = jax.vmap(link_mask)(jnp.arange(6))
            present = masks.any(axis=(1, 2))
            lookup_sel = masks[:LOOKUP_NUM_RENDERED].any(axis=0)
            lookup_depth = depth * lookup_sel
            tgt_crop = lookup_depth[crop[0] : crop[1] + 1, crop[2] : crop[3] + 1]
            bundle = TargetBundle(
                masks, masks * depth[None], present, depth.astype(jnp.float32)
            )
            return bundle, tgt_crop.astype(jnp.float32)

        return prep

    # ------------------------------------------------------- fine polish
    def _synth_prep_fine_core(self):
        """Synthetic target bundle at FINE_POLISH_SCALE x the working
        resolution (exact: built from the full-res link-id map with the
        same color-equality criterion as :meth:`_synth_prep_core`)."""
        from ..config import DEFAULT_RENDER_COLORS
        from ..ops.image import downsample as ds

        f = self.ds_factor // self.fine_scale
        blues = np.asarray(
            [0.0] + [float(c[0]) for c in DEFAULT_RENDER_COLORS[:6]], np.float32
        )

        def prep_fine(depth_full, lid_full):
            blues_j = jnp.asarray(blues)
            depth = ds(depth_full, f)
            blue = jnp.round(ds(blues_j[lid_full + 1], f))
            masks = jax.vmap(lambda i: blue == jnp.round(blues_j[i + 1]))(
                jnp.arange(6)
            )
            return TargetBundle(
                masks, masks * depth[None], masks.any(axis=(1, 2)),
                depth.astype(jnp.float32),
            )

        return prep_fine

    def _fine_polish_core(self):
        """angles[6] -> angles[6] fine pattern search (engine closure)."""
        from ..config import FINE_POLISH_RADII

        return self.engine.fine_polish_fn(
            6, self._fine_joints, tuple(FINE_POLISH_RADII), self.fine_scale
        )

    def _apply_fine_polish_host(self, out: np.ndarray) -> np.ndarray:
        """Apply fine polish to stage-loop results (host lanes): one extra
        device dispatch; ``self._fine_target`` must have been prepared
        alongside the coarse target.  Handles [6], [7] (conf-tailed) and
        frame-batched [F, 6/7] shapes."""
        if not self.fine_scale or self._fine_target is None:
            return out
        if not hasattr(self, "_fine_polish_jit"):
            self._fine_polish_jit = jax.jit(self._fine_polish_core())
            self._fine_polish_vjit = jax.jit(
                jax.vmap(self._fine_polish_core(), in_axes=(0, None, 0))
            )
        w2c = self.engine._w2c
        with self.timer.stage("fine_polish"):
            if out.ndim == 1:
                ang = np.asarray(
                    self._fine_polish_jit(
                        jnp.asarray(out[:6], jnp.float32), w2c,
                        self._fine_target,
                    ),
                    dtype=float,
                )
                return np.concatenate([ang, out[6:]]) if out.shape[0] > 6 else ang
            ang = np.asarray(
                self._fine_polish_vjit(
                    jnp.asarray(out[:, :6], jnp.float32), w2c,
                    self._fine_target,
                ),
                dtype=float,
            )
            return (
                np.concatenate([ang, out[:, 6:]], axis=1)
                if out.shape[1] > 6 else ang
            )

    def run_synthetic(self, depth_full, lid_full, block: bool = True):
        """Device-to-device fast path: full-res (depth, link-id) render maps
        in, joint angles out.

        Target preparation AND the whole stage recipe compile into ONE
        program, so a frame costs a single dispatch plus the 6-float
        read-back (the read-back round trip dominates on remote-attached
        chips).

        ``block=False`` returns a :class:`PendingFrame` instead of angles:
        the program is dispatched but the host read-back is deferred to
        :meth:`finish`.  In a depth-2 pipeline (dispatch frame *i*, then
        finish frame *i-1*) the ~30 ms tunnel read-back of one frame
        overlaps the next frame's device compute, so steady-state per-frame
        latency is max(device, transport) instead of their sum."""
        if self._lookup_mesh is not None or self.preview:
            # Sharded lookup stack: the recipe must split into a
            # collective-bearing lookup dispatch + a seeded search program
            # (engine.run_recipe does this) — device prep, then the split
            # recipe.  The all-in-one fusion below is the single-chip path.
            # Preview mode also routes here: _run_stages falls back to the
            # stepwise loop so intermediate states can be visualised.
            if not hasattr(self, "_synth_prep"):
                self._synth_prep = self._prepare_synthetic_device()
            with self.timer.stage("target_load"):
                res = self._synth_prep(
                    jnp.asarray(depth_full), jnp.asarray(lid_full)
                )
                self._target, self._tgt_lookup_crop = res[0], res[1]
                self._fine_target = res[2] if len(res) > 2 else None
            return self._run_stages()
        key = (
            self.search_mode, self.lookup_topk, tuple(self.camera_pose),
        )
        if getattr(self, "_synth_run_key", None) != key:
            self._setStages()
            base_prep = self._synth_prep_core()
            if self.fine_scale:
                fine_prep = self._synth_prep_fine_core()

                def prep3(a, b, _bp=base_prep, _fp=fine_prep):
                    bundle, crop = _bp(a, b)
                    return bundle, crop, _fp(a, b)

                self._synth_prep_fn = prep3
            else:
                self._synth_prep_fn = base_prep
            self._synth_run = self._fused_run(
                self._synth_prep_fn, self.lookup_topk,
                fine=bool(self.fine_scale),
            )
            self._synth_run_key = key
        a, b = jnp.asarray(depth_full), jnp.asarray(lid_full)
        with self.timer.stage("synthetic_fused"):
            out = self._synth_run(a, b, self.lookup_depth, self.lookup_angles)
        pending = PendingFrame(self._stash_hypotheses(out))
        return pending if not block else self.finish(pending)

    def finish(self, pending: "PendingFrame") -> np.ndarray:
        """Complete a ``block=False`` dispatch: read back the (tiny) result."""
        return np.asarray(pending.out, dtype=float)

    def _stash_hypotheses(self, out):
        """Fused-lane post-dispatch bookkeeping: when the survivor re-rank
        is active the program returns (best, hypotheses[m,6], errors[m],
        evidence[14]) sorted best-first — keep the extras as *device*
        arrays (pulling them eagerly would add a ~30 ms tunnel read per
        frame) and return just the best angles for the normal path."""
        if isinstance(out, tuple):
            _, self._last_hyp_dev, self._last_err_dev = out[:3]
            self._last_evid_dev = out[3] if len(out) > 3 else None
            return out[0]
        self._last_hyp_dev = self._last_err_dev = None
        self._last_evid_dev = None
        return out

    @property
    def last_hypotheses(self) -> Optional[np.ndarray]:
        """Best-k pose hypotheses [m, 6] from the most recent fused-lane
        frame, sorted by fine-resolution error (robust lanes with
        ``lookup_topk`` > 1 only — None otherwise).  Row 0 is the returned
        answer; later rows are the alternative basins a caller can fall
        back to when :attr:`last_confidence` is low."""
        h = getattr(self, "_last_hyp_dev", None)
        return None if h is None else np.asarray(h, dtype=float)

    @property
    def last_errors(self) -> Optional[np.ndarray]:
        """Fine-target errors [m] matching :attr:`last_hypotheses`."""
        e = getattr(self, "_last_err_dev", None)
        return None if e is None else np.asarray(e, dtype=float)

    @property
    def last_margin(self) -> Optional[float]:
        """Best-vs-runner-up relative error margin of the most recent
        fused-lane frame: ``(e1 - e0) / e0``.  Measured on the round-5
        cluttered harness this is ~0 on good and bad frames alike (the
        two survivors usually descend into the SAME basin), so it is NOT
        the confidence signal — see :attr:`last_confidence`."""
        e = self.last_errors
        if e is None or len(e) < 2:
            return None
        return float((e[1] - e[0]) / max(float(e[0]), 1e-9))

    @property
    def last_evidence(self) -> Optional[dict]:
        """Evidence-quality stats of the most recent fused-lane frame
        (robust lanes with the survivor re-rank only — None otherwise):
        ``areas`` [6] observed per-link mask pixels at working res,
        ``expl`` [6] fraction of each link's observed pixels covered by
        that link in the predicted pose's render, ``cover`` observed
        silhouette / predicted silhouette, ``area`` union pixels."""
        v = getattr(self, "_last_evid_dev", None)
        if v is None:
            return None
        v = np.asarray(v, dtype=float)
        return {
            "areas": v[:6],
            "expl": v[6:12],
            "cover": float(v[12]),
            "area": float(v[13]),
        }

    # Confidence gate calibrated on the 40-frame cluttered harness
    # (assets/diag_conf3.py + BENCHMARKS.md round 5): every catastrophic
    # frame is an EVIDENCE-QUANTITY failure — the observed robot
    # silhouette is far smaller than the robot should appear — while
    # geometric-consistency signals (per-link explained fractions) do NOT
    # separate, because on evidence-starved frames the search fits the
    # wrong pose *to* the sparse masks.  At the calibrated 0.70 threshold
    # the gate caught 10/10 frames with error > 2 deg (6 false flags /
    # 30 good); accepted frames measured median 0.25 deg, max 1.29 deg.
    CONF_ACCEPT = 0.70

    @property
    def last_confidence(self) -> Optional[float]:
        """Per-frame confidence of the most recent fused-lane frame:
        ``min(cover, area / A_ref)`` where ``cover`` is observed
        silhouette over predicted silhouette and ``A_ref`` is the robot's
        zero-pose silhouette area at the working resolution (both ratios,
        so the scalar is resolution-independent).  ~1 when the robot is
        fully observed; below :attr:`CONF_ACCEPT` the frame carried too
        little evidence to trust (heavy occlusion or segmentation
        failure) and the caller should reject it or fall back to
        :attr:`last_hypotheses`.  None when the survivor re-rank was not
        active."""
        ev = self.last_evidence
        if ev is None:
            return None
        return min(float(ev["cover"]), ev["area"] / self._conf_area_ref())

    def _conf_area_ref(self) -> float:
        """Zero-pose silhouette area at the working resolution (lazy, one
        1-candidate render, cached per camera/intrinsics)."""
        a = getattr(self, "_conf_aref", None)
        if a is None:
            depth_r, _ = self.engine._render_fn(6)(
                jnp.zeros((1, 6), jnp.float32), self.engine._w2c
            )
            a = float(max(float(np.asarray(depth_r[0] > 0).sum()), 1.0))
            self._conf_aref = a
        return a

    def _fused_run(self, prep, topk: int, fine: bool = False):
        """jit (prep -> recipe [-> fine polish]) into ONE program for the
        fused fast lanes.  With ``fine``, ``prep`` must return a third
        element — the FINE_POLISH_SCALE-resolution target built from the
        same inputs (and, for the neural lane, the same single detector
        forward) — and the fine pattern search runs inside the same
        dispatch.

        In ROBUST mode with ``fine`` AND ``topk`` > 1 the winner is picked
        by a FINE-RESOLUTION RE-RANK: the recipe returns the final_m
        survivor hypotheses (engine ``return_k``), each is fine-polished,
        and the argmin of their fine-target errors is returned.  At the
        working resolution wrong-basin survivors measure within ~2-4% of
        the truth basin on cluttered neural targets (assets/diag_misrank2.py
        'MISRANK' class) — 2x evaluation breaks those ties for one extra
        batched eval + one extra vmapped polish.  Parity lanes
        (robust_tau=None) keep the reference's working-res selection so the
        fused program stays step-equivalent to the stepwise stage loop."""
        from .engine import _stage_key

        rerank = bool(fine) and topk > 1 and self.robust_tau is not None
        recipe = self.engine._recipe_fn(
            _stage_key(self.stages),
            topk,
            self.search_mode == "fast",
            False,
            self.history_length,
            return_k=rerank,
        )
        w2c = self.engine._w2c
        cam_vec = jnp.asarray(self.camera_pose, jnp.float32)
        fine_fn = self._fine_polish_core() if fine else None
        eval_fine = (
            self.engine._eval_fn(6, self.fine_scale) if rerank else None
        )
        render1 = self.engine._render_fn(6) if rerank else None

        def evidence(best, bundle):
            """Per-frame evidence-quality vector [14], computed at the
            working resolution in the SAME dispatch (one extra 1-candidate
            render): per-link observed mask areas [6], per-link explained
            fractions [6] (observed pixels the predicted pose's own link
            covers), union cover (observed silhouette / predicted
            silhouette), union area.  The round-5 cluttered failure study
            (assets/diag_conf*.py) showed every catastrophic frame is an
            EVIDENCE failure — heavy occlusion or segmenter misses — not
            an ambiguous ranking: the fine-error margin between survivors
            is ~0 on good and bad frames alike, while these evidence
            stats separate them."""
            depth_r, lid_r = render1(best[None], w2c)
            lid0, sil = lid_r[0], depth_r[0] > 0
            # The synthetic prep reproduces the reference's color-equality
            # quirk (base blue 0 == background, _synth_prep_core), so the
            # base-link mask can swallow the whole background — gate it by
            # observed depth so evidence counts robot pixels only.
            bmasks = bundle.masks.at[0].set(
                bundle.masks[0] & (bundle.depth > 0)
            )
            areas = bmasks.sum((1, 2)).astype(jnp.float32)
            match = jnp.stack(
                [jnp.sum(bmasks[l] & (lid0 == l)) for l in range(6)]
            ).astype(jnp.float32)
            expl = match / jnp.maximum(areas, 1.0)
            union = bmasks.any(0)
            cover = union.sum() / jnp.maximum(sil.sum(), 1.0)
            return jnp.concatenate(
                [areas, expl,
                 jnp.stack([cover, union.sum().astype(jnp.float32)])]
            )

        @jax.jit
        def run1(a_full, b_full, lookup_depth, lookup_angles):
            res = prep(a_full, b_full)
            bundle, crop = res[0], res[1]
            out = recipe(
                w2c, cam_vec, bundle, crop, lookup_depth, lookup_angles
            )
            if fine_fn is not None:
                if rerank:
                    angs, _ = out  # [m, 6] survivors
                    polished = jax.vmap(fine_fn, in_axes=(0, None, None))(
                        angs, w2c, res[2]
                    )
                    errs = eval_fine(polished, w2c, res[2])
                    # Sorted hypotheses + errors + evidence stats ride
                    # along so callers get a per-frame confidence and the
                    # alternative basins — evidence-starved frames are a
                    # *detectable* failure mode, not a silent one.
                    order = jnp.argsort(errs)
                    best = polished[order[0]]
                    out = (best, polished[order], errs[order],
                           evidence(best, bundle))
                else:
                    out = fine_fn(out[:6], w2c, res[2])
            return out

        return run1

    def _real_prep_core(self, with_fine: bool = False):
        """Device-resident neural target preparation (unjitted core).

        The whole of ``_segmentLoad`` — downsample, letterbox, Mask R-CNN
        forward, per-detection mask pasting, per-link merge, body
        close/dilate masking, lookup crop — as one traceable function, so
        the real-image path can fuse (prep -> recipe) into a single device
        program exactly like the synthetic path.  The host ``_segmentLoad``
        remains the canonical reference implementation (predict.py:415-442);
        this path replaces its cv2 box resizes with the equivalent bilinear
        sampling (same (x+0.5)*src/dst-0.5 convention).
        """
        from ..config import DEPTH_GATE_BODY, DEPTH_GATE_LINK
        from ..config import LOOKUP_NUM_RENDERED as LN
        from ..models.inference import IMAGENET_MEAN, IMAGENET_STD
        from ..ops.image import close_mask as close
        from ..ops.image import downsample as ds
        from ..ops.image import gate_depth

        f = self.ds_factor
        seg = self.seg
        cfg = seg.cfg
        model = seg.model
        variables = seg.variables
        h, w = self.intrinsics.height, self.intrinsics.width
        mh, mw = cfg.image_hw
        scale = min(mh / h, mw / w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        crop = [int(x) for x in self.crops[LN]]
        mean = np.asarray(IMAGENET_MEAN)
        std = np.asarray(IMAGENET_STD)
        lookup_links = set(self.u_reader.mesh_names[:LN])
        link_is_lookup = np.array(
            [name in lookup_links for name in self.link_names]
        )

        def prep(color_full, depth_full):
            from ..ops.image import paste_box_masks

            color = ds(color_full.astype(jnp.float32), f)
            depth = ds(depth_full, f).astype(jnp.float32)
            img = jax.image.resize(color, (nh, nw, 3), method="linear")
            img = (img - jnp.asarray(mean)) / jnp.asarray(std)
            if cfg.in_channels == 4:
                from ..models.inference import DEPTH_HOLE, normalize_depth

                dr = jax.image.resize(depth, (nh, nw), method="nearest")
                img = jnp.concatenate(
                    [img, normalize_depth(dr)[..., None]], axis=-1
                )
                pad = jnp.asarray(
                    [float(v) for v in -mean / std] + [DEPTH_HOLE], jnp.float32
                )
            else:
                pad = jnp.asarray([float(v) for v in -mean / std], jnp.float32)
            canvas = jnp.broadcast_to(pad, (mh, mw, cfg.in_channels))
            canvas = canvas.at[:nh, :nw].set(img)
            out = model.apply(variables, canvas)
            boxes = out["boxes"] / scale  # model frame -> working res

            masks_all = paste_box_masks(
                out["masks"], boxes, out["valid"], h, w
            )  # [K, h, w]
            cls = out["classes"]

            def link_mask(i):
                sel = (cls == i + 1) & out["valid"]
                return jnp.any(masks_all & sel[:, None, None], axis=0)

            link_masks = jax.vmap(link_mask)(jnp.arange(6))  # [6, h, w]
            union = link_masks.any(axis=0)
            body = close(union, 8, 7)
            # Depth gates (config.DEPTH_GATE_*): real frames carry clutter
            # depth everywhere, so the dilated body closure and in-mask
            # occluders otherwise leak wrong depths into the error terms.
            tgt_depth = gate_depth(body, depth, DEPTH_GATE_BODY) * body
            lsel = jnp.asarray(link_is_lookup)
            lookup_union = (link_masks & lsel[:, None, None]).any(axis=0)
            lbody = close(lookup_union, 8, 7)
            lookup_depth = tgt_depth * lbody
            present = link_masks.any(axis=(1, 2))
            link_depth = jax.vmap(
                lambda m: gate_depth(m, tgt_depth, DEPTH_GATE_LINK)
            )(link_masks)
            occ = (
                jnp.where(union, -1.0, depth).astype(jnp.float32)
                if self.robust_tau is not None
                else None
            )
            bundle = TargetBundle(
                link_masks, link_masks * link_depth, present, tgt_depth, occ
            )
            tgt_crop = lookup_depth[
                crop[0] : crop[1] + 1, crop[2] : crop[3] + 1
            ].astype(jnp.float32)
            if self.robust_tau is not None:
                # 2-channel occlusion-aware lookup target (see
                # engine._lookup_err): raw (ungated) scene depth as the
                # occlusion-evidence channel.
                raw_crop = depth[crop[0] : crop[1] + 1, crop[2] : crop[3] + 1]
                tgt_crop = jnp.stack([tgt_crop, raw_crop.astype(jnp.float32)])
            if not with_fine:
                return bundle, tgt_crop

            # Fine target (FINE_POLISH_SCALE x): paste the SAME detections
            # at the scaled resolution — the 28x28 mask logits carry more
            # boundary detail than the working grid resolves, so this is a
            # genuine precision gain, not an upsample — and mask the
            # scaled-resolution depth with the scaled body closure.
            sc = self.fine_scale
            fh, fw = h * sc, w * sc
            fmasks_all = paste_box_masks(
                out["masks"], boxes * sc, out["valid"], fh, fw
            )

            def flink_mask(i):
                sel = (cls == i + 1) & out["valid"]
                return jnp.any(fmasks_all & sel[:, None, None], axis=0)

            flink_masks = jax.vmap(flink_mask)(jnp.arange(6))
            fbody = close(flink_masks.any(axis=0), 8 * sc, 7 * sc)
            fdepth = (
                gate_depth(
                    fbody, ds(depth_full, f // sc).astype(jnp.float32),
                    DEPTH_GATE_BODY,
                )
                * fbody
            )
            flink_depth = jax.vmap(
                lambda m: gate_depth(m, fdepth, DEPTH_GATE_LINK)
            )(flink_masks)
            focc = (
                jnp.where(
                    flink_masks.any(axis=0),
                    -1.0,
                    ds(depth_full, f // sc).astype(jnp.float32),
                )
                if self.robust_tau is not None
                else None
            )
            fine_t = TargetBundle(
                flink_masks, flink_masks * flink_depth,
                flink_masks.any(axis=(1, 2)), fdepth, focc,
            )
            return bundle, tgt_crop, fine_t

        return prep

    def run_real(self, target_color, target_depth, block: bool = True):
        """Fused neural-path fast lane: full-res (color, depth) in, angles
        out — segmentation, target prep and the whole stage recipe as one
        device program (mirrors :meth:`run_synthetic`, including the
        ``block=False`` pipelined handle)."""
        if self._lookup_mesh is not None or self.preview:
            # Preview routes through _run_stages' stepwise loop (see
            # run_synthetic).
            if not hasattr(self, "_real_prep"):
                self._real_prep = jax.jit(
                    self._real_prep_core(with_fine=bool(self.fine_scale))
                )
            with self.timer.stage("target_load"):
                res = self._real_prep(
                    jnp.asarray(target_color), jnp.asarray(target_depth)
                )
                self._target, self._tgt_lookup_crop = res[0], res[1]
                self._fine_target = res[2] if len(res) > 2 else None
            return self._run_stages()
        key = (
            self.search_mode, self.lookup_topk, tuple(self.camera_pose),
        )
        if getattr(self, "_real_run_key", None) != key:
            self._setStages()
            self._real_prep_fn = self._real_prep_core(
                with_fine=bool(self.fine_scale)
            )
            self._real_run = self._fused_run(
                self._real_prep_fn, self.lookup_topk,
                fine=bool(self.fine_scale),
            )
            self._real_run_key = key
        a, b = jnp.asarray(target_color), jnp.asarray(target_depth)
        with self.timer.stage("real_fused"):
            out = self._real_run(a, b, self.lookup_depth, self.lookup_angles)
        pending = PendingFrame(self._stash_hypotheses(out))
        return pending if not block else self.finish(pending)

    # ------------------------------------------------------------ batched
    def run_batch(self, target_colors, target_depths, camera_pose=None) -> np.ndarray:
        """Frame-parallel prediction: F frames -> angles [F, 6].

        Every search stage executes vmapped over the frame axis, so the
        device sees F-times-larger candidate batches instead of F sequential
        frames — the data-parallel axis of this workload (SURVEY.md §2.9).
        Targets are prepared per frame (segmentation inference or synthetic
        mask recovery), then the whole staged search runs frame-batched.
        """
        if camera_pose is not None and np.any(camera_pose != self.camera_pose):
            self.changeCameraPose(camera_pose)
        F = len(target_colors)
        bundles, crops, fines = [], [], []
        with self.timer.stage("target_load"):
            for f in range(F):
                depth_full = np.asarray(target_depths[f], np.float32)
                depth = self._downsample(depth_full, self.ds_factor)
                if self.synthetic:
                    self._loadSynthetic(np.asarray(target_colors[f]), depth)
                else:
                    self._segmentLoad(np.asarray(target_colors[f]), depth)
                bundles.append(self._target)
                crops.append(self._tgt_lookup_crop)
                fines.append(
                    self._build_fine_target_host(
                        np.asarray(target_colors[f]), depth_full
                    )
                )
        self._target = jax.tree.map(lambda *xs: jnp.stack(xs), *bundles)
        self._tgt_lookup_crop = jnp.stack(crops)
        self._fine_target = (
            jax.tree.map(lambda *xs: jnp.stack(xs), *fines)
            if fines[0] is not None else None
        )
        return self._run_stages_sharded(F)

    def run_batch_synthetic(self, depth_full, lid_full) -> np.ndarray:
        """Frame-parallel device path: [F, H, W] render maps -> angles [F, 6]."""
        if not hasattr(self, "_synth_prep"):
            self._synth_prep = self._prepare_synthetic_device()
        F = depth_full.shape[0]
        with self.timer.stage("target_load"):
            res = jax.vmap(self._synth_prep)(
                jnp.asarray(depth_full), jnp.asarray(lid_full)
            )
            self._target, self._tgt_lookup_crop = res[0], res[1]
            self._fine_target = res[2] if len(res) > 2 else None
        return self._run_stages_sharded(F)

    def _run_stages_sharded(self, F: int) -> np.ndarray:
        """Run the frame-batched search, sharding the frame axis over all
        attached devices (pads F to a device multiple by repeating the last
        frame).  Single-device: plain batched run."""
        import jax as _jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import global_mesh

        n_dev = len(_jax.devices())
        if n_dev <= 1:
            return self._run_stages(batch=F)
        pad = (-F) % n_dev
        if pad:
            rep = lambda x: jnp.concatenate([x, jnp.repeat(x[-1:], pad, 0)], 0)
            self._target = jax.tree.map(rep, self._target)
            self._tgt_lookup_crop = rep(self._tgt_lookup_crop)
            if self._fine_target is not None:
                self._fine_target = jax.tree.map(rep, self._fine_target)
        mesh = global_mesh()

        def shard(x):
            return _jax.device_put(
                x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
            )

        self._target = jax.tree.map(shard, self._target)
        self._tgt_lookup_crop = shard(self._tgt_lookup_crop)
        if self._fine_target is not None:
            self._fine_target = jax.tree.map(shard, self._fine_target)
        out = self._run_stages(batch=F + pad)
        return out[:F]

    def _build_fine_target_host(self, color_full, depth_full):
        """FINE_POLISH_SCALE-resolution target for the host stage loop.

        Synthetic inputs rebuild exact masks from the full-res render colors
        (same blue-equality criterion at the finer grid).  Neural inputs
        nearest-upsample the working-res detection masks — the fine gain
        there comes from the true finer depth; the fused ``run_real`` lane
        pastes detections natively at the fine grid instead."""
        if not self.fine_scale:
            return None
        f2 = self.ds_factor // self.fine_scale
        fdepth = np.asarray(self._downsample(depth_full, f2), np.float32)
        if self.synthetic:
            color_f = np.asarray(
                self._downsample(color_full, f2)
            ).round().astype(np.uint8)
            masks = np.stack([
                color_f[..., 0] == self.color_dict[link][0]
                for link in self.link_names
            ])
            depth = fdepth
        else:
            sc = self.fine_scale
            cm = np.asarray(self._target.masks)  # [6, h, w] working res
            masks = np.repeat(np.repeat(cm, sc, axis=1), sc, axis=2)
            # Body mask: upsampled support of the working-res closed-body
            # depth (dilate-8/erode-7 already applied there).
            body8 = np.asarray(self._target.depth) > 0
            body = np.repeat(np.repeat(body8, sc, axis=0), sc, axis=1)
            depth = self._gate_np(body, fdepth, DEPTH_GATE_BODY) * body
            masked = np.stack([
                m * self._gate_np(m, depth, DEPTH_GATE_LINK) for m in masks
            ])
            occ = None
            if self.robust_tau is not None:
                occ = jnp.asarray(
                    np.where(masks.any(axis=0), -1.0, fdepth), jnp.float32
                )
            return TargetBundle(
                jnp.asarray(masks), jnp.asarray(masked, jnp.float32),
                jnp.asarray(masks.any(axis=(1, 2))),
                jnp.asarray(depth, jnp.float32), occ,
            )
        return TargetBundle(
            jnp.asarray(masks), jnp.asarray(masks * depth[None], jnp.float32),
            jnp.asarray(masks.any(axis=(1, 2))),
            jnp.asarray(depth, jnp.float32),
        )

    def _loadSynthetic(self, target_color, target_depth):
        """Recover per-link masks from exact render colors
        (predict.py:445-469; matching on the unique blue channel)."""
        self._fine_target = None  # callers rebuild it (stale-guard)
        target_color = np.asarray(
            self._downsample(target_color, self.ds_factor)
        ).round().astype(np.uint8)

        lookup_depth = target_depth.copy()
        sel = np.zeros(target_depth.shape, bool)
        for k, color in self.color_dict.items():
            if k in self.u_reader.mesh_names[:LOOKUP_NUM_RENDERED]:
                sel |= target_color[..., 0] == color[0]
        lookup_depth = lookup_depth * sel.astype(float)

        masks, masked = {}, {}
        for link in self.link_names:
            link_mask = target_color[..., 0] == self.color_dict[link][0]
            if link_mask.sum() > 0:
                masks[link] = link_mask
                masked[link] = link_mask * target_depth

        occ = None
        if self.robust_tau is not None:
            # Forced-robust synthetic occ plane: render background (depth
            # 0) means "ray to infinity", genuine free-space evidence —
            # encode it as a far surface so violations charge fully
            # (real-sensor 0 = hole stays 'no evidence' in _segmentLoad).
            union_all = np.zeros(target_depth.shape, bool)
            for mk in masks.values():
                union_all |= mk
            occ = np.where(
                union_all, -1.0, np.where(target_depth > 0, target_depth, 100.0)
            ).astype(np.float32)
        self._target = self._build_bundle(masks, masked, target_depth, occ)
        crop_seg = applyCrop(lookup_depth, self.crops[LOOKUP_NUM_RENDERED])
        if self.robust_tau is not None:
            # Forced-robust synthetic mode: the render depth doubles as the
            # raw-scene occlusion channel (engine._lookup_err); background
            # (depth 0 = ray to infinity) is encoded as a far surface so
            # free-space violations charge fully.
            crop_raw = applyCrop(
                np.where(target_depth > 0, target_depth, 100.0).astype(
                    np.float32
                ),
                self.crops[LOOKUP_NUM_RENDERED],
            )
            self._tgt_lookup_crop = jnp.asarray(
                np.stack([crop_seg, crop_raw]), jnp.float32
            )
        else:
            self._tgt_lookup_crop = jnp.asarray(crop_seg, jnp.float32)
        return target_color, target_depth, lookup_depth

    @staticmethod
    def _gate_np(mask, depth, half_window):
        """Host mirror of ops.image.gate_depth (lower median, same window)."""
        vals = np.sort(depth[mask & (depth > 0)])
        if vals.size == 0:
            return depth
        med = vals[(vals.size - 1) // 2]
        return np.where(np.abs(depth - med) <= half_window, depth, 0.0)

    def _segmentLoad(self, target_color, target_depth):
        """Mask R-CNN segmentation -> per-link masks (predict.py:415-442)."""
        self._fine_target = None  # callers rebuild it (stale-guard)
        # Raw observed scene depth (pre-gating): the occlusion-evidence
        # channel of the robust lookup target (engine._lookup_err).
        raw_depth = np.asarray(target_depth, np.float32).copy()
        color_ds = self._downsample(target_color, self.ds_factor).astype(np.uint8)
        # RGB-D models consume the registered depth as a 4th channel.
        dep = target_depth if self.seg.cfg.in_channels == 4 else None
        seg_data, output = self.seg.segment(color_ds, dep)

        # Robot-body isolation: union of masks, dilate(8)/erode(7), then the
        # body depth gate (config.DEPTH_GATE_BODY) — real frames carry
        # clutter depth everywhere, so the dilated closure otherwise leaks
        # background depth into the error terms.
        union = np.zeros(target_depth.shape, bool)
        for k in seg_data:
            union |= seg_data[k]["mask"]
        union_all = union  # pre-closure detection union (occ plane)
        body = np.asarray(close_mask(jnp.asarray(union), 8, 7))
        target_depth = self._gate_np(
            body, target_depth, DEPTH_GATE_BODY
        ) * body.astype(float)

        lookup_depth = target_depth.copy()
        union = np.zeros(target_depth.shape, bool)
        for k in seg_data:
            if k in self.u_reader.mesh_names[:LOOKUP_NUM_RENDERED]:
                union |= seg_data[k]["mask"]
        body = np.asarray(close_mask(jnp.asarray(union), 8, 7))
        lookup_depth = lookup_depth * body.astype(float)

        masks, masked = {}, {}
        for link in self.link_names:
            if link in seg_data:
                masks[link] = seg_data[link]["mask"]
                masked[link] = seg_data[link]["mask"] * self._gate_np(
                    seg_data[link]["mask"], target_depth, DEPTH_GATE_LINK
                )

        occ = None
        if self.robust_tau is not None:
            # Occlusion-evidence plane (TargetBundle.occ): -1 on detected
            # pixels, raw scene depth elsewhere (0 = sensor hole).
            occ = np.where(union_all, -1.0, raw_depth).astype(np.float32)
        self._target = self._build_bundle(masks, masked, target_depth, occ)
        crop_seg = applyCrop(lookup_depth, self.crops[LOOKUP_NUM_RENDERED])
        if self.robust_tau is not None:
            # 2-channel occlusion-aware lookup target: (seg-masked depth,
            # raw scene depth) — see engine._lookup_err.
            crop_raw = applyCrop(raw_depth, self.crops[LOOKUP_NUM_RENDERED])
            self._tgt_lookup_crop = jnp.asarray(
                np.stack([crop_seg, crop_raw]), jnp.float32
            )
        else:
            self._tgt_lookup_crop = jnp.asarray(crop_seg, jnp.float32)
        return output, target_depth, lookup_depth

    # ------------------------------------------------------------ run
    def run(self, target_color, target_depth, camera_pose=None) -> np.ndarray:
        if camera_pose is not None and np.any(camera_pose != self.camera_pose):
            self.changeCameraPose(camera_pose)

        depth_full = np.asarray(target_depth, np.float32)
        target_depth = self._downsample(depth_full, self.ds_factor)

        with self.timer.stage("target_load"):
            if self.synthetic:
                output, target_depth, lookup_depth = self._loadSynthetic(
                    target_color, target_depth
                )
            else:
                output, target_depth, lookup_depth = self._segmentLoad(
                    target_color, target_depth
                )
            self._fine_target = self._build_fine_target_host(
                target_color, depth_full
            )

        if self.preview:
            self.viz.loadTargetColor(np.asarray(output))
            self.viz.loadTargetDepth(np.asarray(target_depth))
            self.viz.loadSegmentedLinks(self._detected_links_image())

        return self._run_stages()

    def _detected_links_image(self) -> np.ndarray:
        """Per-link colored mask composite for the ProjectionViz 'Detected
        Links' panel (reference predict.py:556-560 shows the segmenter's
        per-class masks in the lower-left quadrant)."""
        from ..config import DEFAULT_RENDER_COLORS

        masks = np.asarray(self._target.masks)
        img = np.zeros((*masks.shape[1:], 3), np.uint8)
        for i in range(masks.shape[0]):
            img[masks[i]] = DEFAULT_RENDER_COLORS[i + 1]
        return img

    def _run_stages(self, batch: Optional[int] = None) -> np.ndarray:
        """Run the staged search; the only device->host transfer is the
        final angles read-back (critical on remote-attached TPUs).

        The whole recipe executes as ONE fused device program
        (``CandidateEvaluator.run_recipe``): lookup init, perspective
        flips, sweeps, and descent trace into a single XLA executable —
        versus the reference's ~10 interleaved Python/GPU dispatches per
        frame (robotpose/prediction/predict.py:159-374).

        With ``batch`` = F, the recipe runs vmapped over F frames
        simultaneously — the workload's data-parallel axis (SURVEY.md §2.9).
        With ``lookup_topk`` > 1 (single-frame mode), the top-k lookup seeds
        refine as a hypothesis batch instead and the best final error wins.
        Preview mode falls back to the per-stage loop so intermediate
        states can be visualised.
        """
        self._setStages()
        if self.preview:
            return self._apply_fine_polish_host(
                self._run_stages_stepwise(batch)
            )
        jacobi = self.search_mode == "fast"
        # Frame-batched robust lanes re-rank the final_m survivors at the
        # fine resolution, exactly like the single-frame fused lanes: the
        # working-resolution objective can prefer a mirror basin the
        # 2x-resolution objective separates cleanly (the synth240
        # wrong-basin frame ranks its truth seed 3rd of 10648 yet loses
        # the working-res selection by a hair — and recovers to 0.27 deg
        # under the fine re-rank; BENCHMARKS.md round 5).
        rerank_batch = (
            batch is not None
            and self.lookup_topk > 1
            and self.robust_tau is not None
            and bool(self.fine_scale)
            and self._fine_target is not None
        )
        with self.timer.stage("stages_fused"):
            out = self.engine.run_recipe(
                self.stages,
                self._target,
                self._tgt_lookup_crop,
                self.lookup_depth,
                self.lookup_angles,
                topk=self.lookup_topk,
                jacobi=jacobi,
                batched=batch is not None,
                history_length=self.history_length,
                return_k=rerank_batch,
            )
        if rerank_batch:
            survivors, _ = out  # [F, m, 6] (working-res errors unused)
            if not hasattr(self, "_batch_rerank_jit"):
                fine_fn = self._fine_polish_core()
                eval_fine = self.engine._eval_fn(6, self.fine_scale)

                def rr(angs, w2c, ftgt):
                    pol = jax.vmap(fine_fn, in_axes=(0, None, None))(
                        angs, w2c, ftgt
                    )
                    errs = eval_fine(pol, w2c, ftgt)
                    return pol[jnp.argmin(errs)]

                self._batch_rerank_jit = jax.jit(
                    jax.vmap(rr, in_axes=(0, None, 0))
                )
            with self.timer.stage("fine_rerank"):
                angles = self._batch_rerank_jit(
                    survivors, self.engine._w2c, self._fine_target
                )
            return np.asarray(angles, dtype=float)
        return self._apply_fine_polish_host(np.asarray(out, dtype=float))

    def _run_stages_stepwise(self, batch: Optional[int] = None) -> np.ndarray:
        """Per-stage dispatch loop (preview/debug path; also the reference
        execution shape, one dispatch per stage)."""
        hypotheses = self.lookup_topk if (batch is None and self.lookup_topk > 1) else None
        if hypotheses:
            state = SearchState.fresh_batch(hypotheses, self.history_length)
            target = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (hypotheses, *x.shape)), self._target
            )
        else:
            state = (
                SearchState.fresh(self.history_length)
                if batch is None
                else SearchState.fresh_batch(batch, self.history_length)
            )
            target = self._target

        for stage in self.stages:
            name = type(stage).__name__
            with self.timer.stage(name):
                if isinstance(stage, Lookup):
                    lt = self.engine._lookup_tau()
                    if hypotheses:
                        angles = self.engine.lookup_select_topk(
                            self._tgt_lookup_crop, self.lookup_depth,
                            self.lookup_angles, hypotheses, tau=lt,
                        )
                    elif batch is None:
                        angles = self.engine.lookup_select(
                            self._tgt_lookup_crop, self.lookup_depth,
                            self.lookup_angles, tau=lt,
                        )
                    else:
                        angles = self.engine.lookup_select_batch(
                            self._tgt_lookup_crop, self.lookup_depth,
                            self.lookup_angles, tau=lt,
                        )
                    state = state._replace(angles=angles)
                elif isinstance(stage, Descent):
                    state = self.engine.descent(
                        state, target, stage, jacobi=self.search_mode == "fast"
                    )
                elif isinstance(stage, SFlip):
                    state = self.engine.sflip(state, target, stage)
                elif isinstance(stage, Polish):
                    state = self.engine.polish(state, target, stage)
                elif isinstance(stage, InterpolativeSweep):
                    for j in np.where(stage.joints)[0]:
                        state = self.engine.isweep(state, target, stage, int(j))
                elif isinstance(stage, TensorSweep):
                    for j in np.where(stage.joints)[0]:
                        state = self.engine.tensor_sweep(
                            state, target.depth, stage, int(j)
                        )
                elif isinstance(stage, GridSweep):
                    state = self.engine.grid_sweep(state, target, stage)
                else:
                    raise TypeError(f"Unknown stage type {name}")

            if self.preview:
                self._preview_state(state)

        if hypotheses:
            errs = self.engine._evaluate_jit(6)(
                state.angles, self.engine._w2c, self._target
            )
            best = jnp.argmin(errs)
            return np.asarray(state.angles[best], dtype=float)
        return np.asarray(state.angles, dtype=float)

    def _preview_state(self, state: SearchState) -> None:
        angles = np.asarray(state.angles)
        if angles.ndim == 2:
            # Hypothesis-batched search (lookup_topk > 1): preview the
            # currently-best hypothesis.
            errs = self.engine._evaluate_jit(6)(
                jnp.asarray(angles), self.engine._w2c, self._target
            )
            angles = angles[int(np.argmin(np.asarray(errs)))]
        self.renderer.setJointAngles(angles)
        color, depth = self.renderer.render()
        self.viz.loadRenderedColor(color)
        self.viz.loadRenderedDepth(depth)
        self.viz.show()
