"""Measure the staged top-k fused lane: error + pipelined latency.

Usage: python assets/eval_topk.py [n_frames] [topk]
Compares against the single-seed rows saved by tune_escape.py when present.
"""

import os
import sys
import time

os.environ.setdefault("ROPES3D_ROOT", "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ropes3d_tpu.prediction.synthetic import SyntheticPredictor

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    topk = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cam = [0, -1.5, 0.75, 0, 0, 0]
    sp = SyntheticPredictor(
        cam, "1280_720_color", 8, "SLU", noise=False, seed=7,
        lookup_topk=topk,
    )
    p = sp.predictor

    poses = [sp._generatePose() for _ in range(n)]
    inputs = []
    for po in poses:
        d, l = sp.renderer.render_batch_angles(np.asarray(po, np.float32)[None])
        inputs.append((jnp.array(d[0]), jnp.array(l[0])))
    jax.block_until_ready(inputs[-1])
    p.run_synthetic(*inputs[0])  # warmup/compile

    times, errs = [], []
    inflight = []
    t_prev = time.perf_counter()

    def finish_one():
        nonlocal t_prev
        po0, h0 = inflight.pop(0)
        pred = p.finish(h0)
        t_now = time.perf_counter()
        times.append(1e3 * (t_now - t_prev))
        t_prev = t_now
        errs.append(np.degrees(np.abs(pred - po0))[:3])

    for po, (d, l) in zip(poses, inputs):
        inflight.append((po, p.run_synthetic(d, l, block=False)))
        if len(inflight) >= 2:
            finish_one()
    while inflight:
        finish_one()

    errs = np.array(errs)
    print(
        f"staged topk={topk}: err p50={np.median(errs):.3f} "
        f"p90={np.percentile(errs,90):.2f} max={errs.max():.2f} | "
        f"latency p50={np.percentile(times,50):.1f}ms "
        f"p90={np.percentile(times,90):.1f}ms"
    )
    rows_path = "/tmp/escape_rows.npy"
    if os.path.exists(rows_path):
        r = np.load(rows_path)
        m = min(len(r), n)
        print(
            f"(same-seed single: p50={np.median(r[:m,1:4]):.3f} "
            f"p90={np.percentile(r[:m,1:4],90):.2f} max={r[:m,1:4].max():.2f}; "
            f"full-topk4: p50={np.median(r[:m,4:7]):.3f} "
            f"p90={np.percentile(r[:m,4:7],90):.2f} max={r[:m,4:7].max():.2f})"
        )


if __name__ == "__main__":
    main()
