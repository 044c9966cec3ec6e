"""Pick ESCAPE_CONF_THRESH from measured (conf, err, escaped-err) triples.

Runs the fused synthetic lane with adaptive escape *instrumented*: for every
frame we record the wrong-basin confidence ratio, the single-seed error, and
the top-k escape error, then sweep candidate thresholds to find the cheapest
one that pins the p90/max error tail (VERDICT r2 item 5 follow-up: BENCH_r03
showed e2e p90 err 1.60 deg vs the <=1.5 deg ask, with ~20 ms of latency
headroom to spend).
"""

import os
import sys

os.environ.setdefault("ROPES3D_ROOT", "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax.numpy as jnp

    from ropes3d_tpu.prediction.synthetic import SyntheticPredictor

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    cam = [0, -1.5, 0.75, 0, 0, 0]
    sp = SyntheticPredictor(
        cam, "1280_720_color", 8, "SLU", noise=False, seed=7
    )
    p = sp.predictor
    assert p.adaptive_escape

    rows = []
    for i in range(n):
        po = sp._generatePose()
        d, l = sp.renderer.render_batch_angles(np.asarray(po, np.float32)[None])
        a, b = jnp.array(d[0]), jnp.array(l[0])
        pend = p.run_synthetic(a, b, block=False)
        out = np.asarray(pend.out, dtype=float)
        angles, conf = out[:6], out[6]
        esc = pend.escape(*pend.args)
        e0 = np.degrees(np.abs(angles - po))[:3]
        e1 = np.degrees(np.abs(esc - po))[:3]
        rows.append((conf, *e0, *e1))
        if (i + 1) % 25 == 0:
            print(f"{i+1}/{n}", flush=True)

    rows = np.array(rows)  # [N, 7] conf, err_single[3], err_topk[3]
    np.save("/tmp/escape_rows.npy", rows)
    conf, e0, e1 = rows[:, 0], rows[:, 1:4], rows[:, 4:7]
    print(f"conf: p50={np.median(conf):.3f} p90={np.percentile(conf,90):.3f}")

    def stats(e):  # pooled per-joint, matching bench.py's e2e statistic
        return (
            f"p50={np.median(e):.3f} p90={np.percentile(e,90):.2f} "
            f"max={e.max():.2f}"
        )

    print(f"single-seed err: {stats(e0)}")
    print(f"always-topk err: {stats(e1)}")
    for thr in (0.25, 0.3, 0.35, 0.4, 0.45, 0.5, 0.6):
        err = np.where((conf > thr)[:, None], e1, e0)
        frac = float((conf > thr).mean())
        print(f"thr={thr:.2f}: escape_frac={frac:.2f} {stats(err)}")


if __name__ == "__main__":
    main()
