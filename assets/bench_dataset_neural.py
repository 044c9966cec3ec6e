"""Dataset-scale NEURAL-path validation (VERDICT r2 item 7).

Records a 240-frame shaded ('real'-mode) synthetic capture through the
byte-format-identical raw-zip -> Builder -> h5 pipeline, then batch-predicts
it with the full segmentation pipeline (predict_dataset, NOT -synthetic):
every frame runs segmenter inference -> target prep -> fused staged search,
frame-parallel in chunks.  Prints the per-joint error table + steady-state
fps for BENCHMARKS.md.

Usage: python assets/bench_dataset_neural.py [n_frames] [ds_factor]
"""

import os
import sys
import time

os.environ.setdefault("ROPES3D_ROOT", "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.environ["ROPES3D_ROOT"])

import numpy as np


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 240
    ds_factor = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    name = f"synthr{n_frames}"

    from ropes3d_tpu.config import Paths
    from ropes3d_tpu.data.dataset import Dataset, DatasetInfo

    Paths().create()
    if name not in DatasetInfo().compiled_sets:
        from ropes3d_tpu.data.synth_capture import record_synthetic_dataset

        t0 = time.time()
        record_synthetic_dataset(
            name, n_frames=n_frames, base_intrin="640_480_color",
            do_angles="SLU", mode="real", seed=3,
        )
        print(f"capture+build: {time.time() - t0:.0f}s", flush=True)

    from ropes3d_tpu.cli.predict_dataset import run

    t0 = time.time()
    preds = run(
        name, angs="SLU", ds_factor=ds_factor, chunk=120, plot=False,
        model_ds="bootstrap",
    )
    dt = time.time() - t0

    ds = Dataset(name)
    actual = np.asarray(ds.angles[: len(preds)])
    err = np.degrees(np.abs(preds - actual))
    print(f"\nneural-path per-joint error over {len(preds)} frames "
          f"(ds_factor {ds_factor}, {len(preds) / dt:.2f} fps incl. one-time "
          f"lookup/crop/compile):")
    for j, nm in enumerate("SLU"):
        e = err[:, j]
        print(f"  {nm}: median {np.median(e):.3f} deg, "
              f"p90 {np.percentile(e, 90):.2f}, max {e.max():.1f}")
    e3 = err[:, :3]
    print(f"  overall median {np.median(e3):.3f} deg, "
          f"p90 {np.percentile(e3, 90):.2f}")


if __name__ == "__main__":
    main()
