"""Synthetic accuracy eval for the beyond-reference SLUB / SLURB recipes.

The reference leaves these joint sets unimplemented
(robotpose/prediction/stages.py:170-176); ropes3d_tpu ships full-DoF
recipes (prediction/stages.py) that extend SLU with B (and R) sweeps and a
6-DoF final descent.  This harness publishes the per-joint accuracy table
for BENCHMARKS.md — closed-loop synthetic, same methodology as the SLU
e2e numbers.

Usage: python assets/eval_full_dof.py [n_frames] [SLUB|SLURB|both]
"""

import os
import sys
import time

os.environ.setdefault("ROPES3D_ROOT", "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.environ["ROPES3D_ROOT"])

import numpy as np


def _b_wrap(err_deg: np.ndarray) -> np.ndarray:
    """±360/±180 wraparound on the B joint (prediction/analysis.py
    _b_correction) and plain ±360 wrap on R (a full revolution of the
    roll joint is the same physical pose, so a 350 deg reported error is
    really 10 deg): report the nearest-equivalent angular error."""
    offsets = np.array([-360.0, -180.0, 0.0, 180.0, 360.0])
    err_deg = err_deg.copy()
    err_deg[:, 4] = np.abs(err_deg[:, 4:5] + offsets[None]).min(axis=1)
    r_offsets = np.array([-360.0, 0.0, 360.0])
    err_deg[:, 3] = np.abs(err_deg[:, 3:4] + r_offsets[None]).min(axis=1)
    return err_deg


def eval_recipe(do_angles: str, n: int, ds: int = 4):
    from ropes3d_tpu.prediction.synthetic import SyntheticPredictor

    cam = [0, -1.5, 0.75, 0, 0, 0]
    sp = SyntheticPredictor(
        cam, "1280_720_color", ds, do_angles, noise=False, seed=5
    )
    t0 = time.time()
    actual, pred = [], []
    for i in range(n):
        a, p = sp.run()
        actual.append(a)
        pred.append(p)
        if (i + 1) % 25 == 0:
            print(f"{do_angles} {i+1}/{n}", flush=True)
    dt = time.time() - t0
    err = np.degrees(np.asarray(pred) - np.asarray(actual))
    err = np.abs(_b_wrap(err))
    joints = [j for j, c in zip(range(6), "SLURBT") if c in do_angles]
    print(f"\n{do_angles} over {n} frames ({dt / n * 1e3:.0f} ms/frame incl. "
          "first-compile amortization):")
    for j in joints:
        e = err[:, j]
        print(f"  {'SLURBT'[j]}: median {np.median(e):.3f} deg, "
              f"p90 {np.percentile(e, 90):.2f}, max {e.max():.1f}")
    pooled = err[:, joints]
    print(f"  pooled median {np.median(pooled):.3f} deg, "
          f"p90 {np.percentile(pooled, 90):.2f}, max {pooled.max():.1f}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    ds = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    # Default working res for full-DoF is ds 4 (320x180): the wrist links
    # subtend only a handful of pixels at the SLU default (ds 8), which
    # caps R/B basin selection; 4x the pixels fixes observability while
    # the fused evaluator still sustains ~20k cand/s (BENCHMARKS.md).
    for da in (("SLUB", "SLURB") if which == "both" else (which,)):
        eval_recipe(da, n, ds)


if __name__ == "__main__":
    main()
