#!/usr/bin/env python
"""Headline benchmark: render-and-match pose candidates per second per chip.

Measures the full candidate evaluator — FK -> batched rasterize -> visual+
depth error — at the production working resolution (1280_720_color / 8 =
160x90, the predictor's default; reference predict_dataset.py:19), plus the
end-to-end per-frame synthetic prediction p50.

Baseline: the reference's render throughput model (robotpose/crop.py:122-123,
GTX 1070-calibrated): 1 / (pixels * 1.2e-8 + 0.002) poses/s = ~460/s at
160x90.  BASELINE.md north star: >=1000 candidates/s/chip.

NOTE: the axon TPU tunnel caches identical executions — every timed
iteration uses fresh candidate angles (see .claude/skills/verify/SKILL.md).
"""

import json
import os
import sys
import time

os.environ.setdefault("ROPES3D_ROOT", os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    if "--profile" in sys.argv:
        # Capture a device trace of the benchmark (view with TensorBoard or
        # xprof); stage boundaries are annotated via StageTimer.
        import jax

        logdir = os.path.join(os.environ["ROPES3D_ROOT"], "output", "trace")
        os.makedirs(logdir, exist_ok=True)
        with jax.profiler.trace(logdir):
            _main()
        print(f"# trace written to {logdir}", file=sys.stderr)
    else:
        _main()


def _main():
    import jax
    import jax.numpy as jnp

    from ropes3d_tpu.camera import Intrinsics
    from ropes3d_tpu.ops.error import TargetBundle
    from ropes3d_tpu.prediction.engine import CandidateEvaluator
    from ropes3d_tpu.robot import URDFReader
    from ropes3d_tpu.simulation.renderer import Renderer
    from ropes3d_tpu.config import Paths

    Paths().create()
    cam = [0, -1.5, 0.75, 0, 0, 0]
    base_intrin = "1280_720_color"
    ds = 8
    intr = Intrinsics(base_intrin)
    intr.downscale(ds)

    urdf = URDFReader()
    engine = CandidateEvaluator(cam, intr, urdf=urdf)

    # Synthetic target frame at a representative pose.
    rend = Renderer(camera_pose=cam, camera_intrin=str(intr))
    true_pose = np.array([0.4, 0.1, 0.6, 0, 0, 0])
    rend.setJointAngles(true_pose)
    depth, lid = rend.render_ids()
    masks = np.stack([lid == i for i in range(6)])
    target = TargetBundle(
        jnp.asarray(masks),
        jnp.asarray(masks * depth[None], jnp.float32),
        jnp.asarray(masks.any((1, 2))),
        jnp.asarray(depth, jnp.float32),
    )

    rng = np.random.default_rng(0)
    lim = urdf.joint_limits
    B = 1024

    def fresh_batch():
        return rng.uniform(lim[:, 0], lim[:, 1], (B, 6)).astype(np.float32)

    # Warmup / compile.
    engine.evaluate(fresh_batch(), target, 6)

    # Sustained throughput, ONE dispatch: lax.scan over pre-staged fresh
    # batches so the figure measures the device, not the dispatch
    # transport.  Round 2 showed the per-call-dispatch loop is hostage to
    # tunnel weather (4.9k cand/s driver-run vs 8.3k builder-run for the
    # *same* loop); a single scanned program removes the per-iteration
    # dispatch RTT from the measurement entirely.  Every iteration still
    # evaluates fresh candidate angles (transport caching, see SKILL.md).
    eval_fn = engine._eval_fn(6)
    n_iters = 24
    stacked = jnp.asarray(
        np.stack([fresh_batch() for _ in range(n_iters)])
    )  # [n_iters, B, 6]

    @jax.jit
    def sustained(allb, w2c, tgt):
        def body(_, b):
            e = eval_fn(b, w2c, tgt)
            return 0.0, e.min()
        _, mins = jax.lax.scan(body, 0.0, allb)
        return mins

    # Compile/warm on a *different* fresh stack of the same shape — the
    # transport caches identical executions, so warmup and timed inputs
    # must differ.
    warm = jnp.asarray(np.stack([fresh_batch() for _ in range(n_iters)]))
    sustained(warm, engine._w2c, target).block_until_ready()
    jax.block_until_ready(stacked)
    t0 = time.perf_counter()
    sustained(stacked, engine._w2c, target).block_until_ready()
    dt = time.perf_counter() - t0
    cand_per_s = B * n_iters / dt

    # Secondary: the round-2-style serial-dispatch loop (per-call enqueue,
    # block once) — reported in extras as dispatch-loop throughput.
    eval_jit = engine._evaluate_jit(6)
    batches = [jnp.asarray(fresh_batch()) for _ in range(12)]
    jax.block_until_ready(batches[-1])
    t0 = time.perf_counter()
    outs = [eval_jit(b, engine._w2c, target) for b in batches]
    jax.block_until_ready(outs)
    dispatch_cand_per_s = B * 12 / (time.perf_counter() - t0)

    # VPU roofline estimate for the fused raster+error kernel: the kernel
    # is elementwise-bound (FMA plane evaluation; the K=3 MXU formulation
    # wastes ~98% of the systolic array and was removed).  Count the vector
    # ops the kernel actually executes for this batch's geometry — visited
    # tiles x surviving chunks x ERR_CHUNK x tile pixels x ops/elem — and
    # compare against the v5e VPU peak (8 sublanes x 128 lanes x 4 ALUs x
    # ~0.94 GHz ~= 3.85 T f32 ops/s).
    vpu_frac = None
    try:
        from ropes3d_tpu.ops.rasterizer import transform_vertices, triangle_setup
        from ropes3d_tpu.ops.rasterizer_pallas import ERR_CHUNK, ERR_TILE_R

        verts, ids, valid = engine._scene_slice(6)
        fx, fy, cx, cy = engine._intrin_tuple

        @jax.jit
        def bboxes(angles, w2c):
            poses = engine._fk(angles)[:, :6]

            def setup(p):
                cam = transform_vertices(verts, ids, p, w2c)
                _, _, vrange, _ = triangle_setup(cam, valid, fx, fy, cx, cy)
                return vrange

            return jax.vmap(setup)(poses)

        sample = np.asarray(bboxes(batches[0][:128], engine._w2c))  # [S, N, 4]
        npad = (-sample.shape[1]) % ERR_CHUNK
        if npad:
            fill = np.broadcast_to(
                np.array([np.inf, -np.inf, np.inf, -np.inf], np.float32),
                (sample.shape[0], npad, 4),
            )
            sample = np.concatenate([sample, fill], axis=1)
        cb = sample.reshape(sample.shape[0], -1, ERR_CHUNK, 4)
        chunk_bb = np.stack(
            [cb[..., 0].min(2), cb[..., 1].max(2), cb[..., 2].min(2), cb[..., 3].max(2)],
            axis=-1,
        )  # [S, n_chunks, 4]
        gb = np.stack(
            [sample[..., 0].min(1), sample[..., 1].max(1),
             sample[..., 2].min(1), sample[..., 3].max(1)], axis=-1
        )  # [S, 4]
        R, C = ERR_TILE_R, 128
        hp, wp = -(-intr.height // R) * R, -(-intr.width // C) * C
        OPS_PER_ELEM = 26  # 4 planes x FMA + min/clip/select/pack/reduce
        CORR_OPS = 45  # per-pixel correction ops per visited tile
        total_ops = 0.0
        for s in range(gb.shape[0]):
            tr = np.arange(hp // R) * R + 0.5
            tc = np.arange(wp // C) * C + 0.5
            rows_hit = (gb[s, 1] >= tr) & (gb[s, 0] <= tr + R - 1)
            cols_hit = (gb[s, 3] >= tc) & (gb[s, 2] <= tc + C - 1)
            for r0 in tr[rows_hit]:
                for c0 in tc[cols_hit]:
                    passing = (
                        (chunk_bb[s, :, 1] >= r0) & (chunk_bb[s, :, 0] <= r0 + R - 1)
                        & (chunk_bb[s, :, 3] >= c0) & (chunk_bb[s, :, 2] <= c0 + C - 1)
                    ).sum()
                    total_ops += passing * ERR_CHUNK * R * C * OPS_PER_ELEM
                    total_ops += R * C * CORR_OPS
        ops_per_cand = total_ops / gb.shape[0]
        VPU_PEAK = 3.85e12
        vpu_frac = round(ops_per_cand * cand_per_s / VPU_PEAK, 3)
    except Exception as e:
        print(f"# roofline estimate skipped: {type(e).__name__}: {e}", file=sys.stderr)

    # End-to-end per-frame evaluation (full fused SLU recipe, synthetic
    # targets): >=100 fresh random poses, latency p50/p90 + error
    # median/p90 — sampled heavily enough to be stable run-to-run.
    p50_ms = p90_ms = med_err_deg = p90_err_deg = None
    n_frames = int(os.environ.get("ROPES3D_BENCH_FRAMES", "100"))
    try:
        from ropes3d_tpu.simulation.lookup import RobotLookupManager
        from ropes3d_tpu.prediction.synthetic import SyntheticPredictor

        lm = RobotLookupManager()
        lm.get(str(intr), cam, 6, "SLU", divisions=np.array([24, 24, 24, 1, 1, 1]))
        sp = SyntheticPredictor(cam, base_intrin, ds, "SLU", noise=False, seed=1)
        p = sp.predictor

        # Pre-render the input frames: scene generation is the harness's
        # job, not the predictor's — the timed quantity is input -> angles
        # (one fused dispatch + one 6-float read-back per frame).
        poses = [sp._generatePose() for _ in range(n_frames)]
        inputs = []
        for po in poses:
            d, l = sp.renderer.render_batch_angles(
                np.asarray(po, np.float32)[None]
            )
            inputs.append((jnp.array(d[0]), jnp.array(l[0])))
        jax.block_until_ready(inputs[-1])
        p.run_synthetic(*inputs[0])  # warmup/compile

        # Steady-state per-frame latency in a depth-2 pipeline: dispatch
        # frame i, then finish frame i-1 — the tunnel's ~30 ms read-back of
        # one frame overlaps the next frame's device compute.  Results are
        # strictly per-frame and identical to the serial loop; only the
        # wait ordering changes.  Per-frame time = inter-completion gap.
        times = []
        frame_errs = []
        inflight = []

        def _finish_one():
            po0, h0 = inflight.pop(0)
            pred = p.finish(h0)
            nonlocal t_prev
            t_now = time.perf_counter()
            times.append(1e3 * (t_now - t_prev))
            t_prev = t_now
            frame_errs.append(np.degrees(np.abs(pred - po0))[:3])

        t_prev = time.perf_counter()
        for po, (d, l) in zip(poses, inputs):
            inflight.append((po, p.run_synthetic(d, l, block=False)))
            if len(inflight) >= 2:
                _finish_one()
        while inflight:
            _finish_one()
        frame_errs = np.array(frame_errs)  # [N, 3] per-joint SLU errors
        p50_ms = float(np.percentile(times, 50))
        p90_ms = float(np.percentile(times, 90))
        med_err_deg = float(np.median(frame_errs))
        p90_err_deg = float(np.percentile(frame_errs, 90))
    except Exception as e:  # keep the headline metric robust
        print(f"# e2e stage skipped: {type(e).__name__}: {e}", file=sys.stderr)

    # Full neural pipeline (config #1: per-frame segmentation -> staged
    # search, reference predict_dataset.py:17-64 / predict.py:127-375) on
    # held-out cluttered RGB-D scenes — the driver-visible record of the
    # segment-then-predict path.  Skipped (fields None) when no trained
    # segmenter is registered.
    neural = {
        "neural_p50_ms": None,
        "neural_p90_ms": None,
        "neural_median_err_deg": None,
        "neural_p90_err_deg": None,
        "neural_frames": None,
        "seg_model": None,
        "seg_iou_100px": None,
    }
    try:
        from ropes3d_tpu.robot import URDFReader as _UR
        from ropes3d_tpu.simulation.clutter import ClutteredSceneMaker
        from ropes3d_tpu.simulation.noise import NoiseMaker
        from ropes3d_tpu.prediction.predictor import Predictor
        from ropes3d_tpu.training.model_registry import ModelManager

        if ModelManager().dynamicLoad(dataset="bootstrap") is None:
            raise FileNotFoundError("no bootstrap segmenter registered")
        n_neural = int(os.environ.get("ROPES3D_BENCH_NEURAL_FRAMES", "24"))
        rng2 = np.random.default_rng(11)
        rend_real = Renderer("real", cam, base_intrin)
        scenes = ClutteredSceneMaker(720, 1280, rng2)
        noise = NoiseMaker(rng2)
        lim2 = urdf.joint_limits
        pn = Predictor(cam, ds, do_angles="SLU", base_intrin=base_intrin,
                       model_ds="bootstrap")
        neural["seg_model"] = os.path.basename(
            os.path.dirname(getattr(pn.seg, "ckpt_path", "?"))
        )
        frames = []
        for _ in range(n_neural):
            pose = rng2.uniform(lim2[:, 0], lim2[:, 1]) * np.array(
                [1, 1, 1, 0, 0, 0]
            )
            rend_real.setJointAngles(pose)
            color, depth = rend_real.render()
            img, d = scenes.compose(np.asarray(color, float), depth)
            frames.append((pose, img.astype(np.uint8), noise.holes(d)))
        pn.run_real(frames[0][1], frames[0][2])  # warmup/compile
        # Depth-2 pipelined per-frame latency (same methodology as the
        # synthetic e2e block above: inter-completion gap).
        ntimes, nerrs, inflight2 = [], [], []

        def _finish_neural():
            po0, h0 = inflight2.pop(0)
            predded = pn.finish(h0)
            nonlocal t_prev2
            t_now = time.perf_counter()
            ntimes.append(1e3 * (t_now - t_prev2))
            t_prev2 = t_now
            nerrs.append(np.degrees(np.abs(predded - po0))[:3])

        t_prev2 = time.perf_counter()
        for po, img, d in frames:
            inflight2.append((po, pn.run_real(img, d, block=False)))
            if len(inflight2) >= 2:
                _finish_neural()
        while inflight2:
            _finish_neural()
        nerrs = np.array(nerrs)
        neural.update(
            neural_p50_ms=float(np.percentile(ntimes, 50)),
            neural_p90_ms=float(np.percentile(ntimes, 90)),
            neural_median_err_deg=float(np.median(nerrs)),
            neural_p90_err_deg=float(np.percentile(nerrs, 90)),
            neural_frames=n_neural,
        )
        # Segmenter capability on the same held-out clutter distribution.
        from ropes3d_tpu.training.bootstrap import eval_segmenter_iou

        n_iou = int(os.environ.get("ROPES3D_BENCH_IOU_SCENES", "24"))
        neural["seg_iou_100px"] = round(
            eval_segmenter_iou(
                pn.seg.ckpt_path, n=n_iou, cluttered=True, min_gt_area=100.0
            ),
            4,
        )
    except Exception as e:  # keep the headline metric robust
        print(f"# neural stage skipped: {type(e).__name__}: {e}", file=sys.stderr)

    baseline = 1.0 / (intr.size * 1.2e-8 + 0.002)
    result = {
        "metric": "render_and_match_candidates_per_sec_per_chip",
        "value": round(cand_per_s, 1),
        "unit": "candidates/s",
        "vs_baseline": round(cand_per_s / baseline, 2),
        "extra": {
            "resolution": f"{intr.width}x{intr.height}",
            "batch": B,
            "scan_iters": n_iters,
            "dispatch_loop_cand_per_s": round(dispatch_cand_per_s, 1),
            "baseline_model_per_s": round(baseline, 1),
            "e2e_frames": n_frames,
            "e2e_p50_ms_per_frame": p50_ms,
            "e2e_p90_ms_per_frame": p90_ms,
            "e2e_median_err_deg": med_err_deg,
            "e2e_p90_err_deg": p90_err_deg,
            "vpu_roofline_frac": vpu_frac,
            "vpu_peak_tops_assumed": 3.85,
            **neural,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
