"""Batch pose estimation over a recorded dataset.

Parity port of reference ``predict_dataset.py:17-64``: predicts every frame
(chunked), saves ``predictions_<ds>.npy``, prints per-joint error stats and
plots against the recorded angles.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def run(dataset: str, angs: str = "SLU", ds_factor: int = 8,
        chunk: int = 120, plot: bool = True, limit: int = None,
        model_ds: str = None, synthetic: bool = False,
        parity: bool = False) -> np.ndarray:
    """``synthetic`` uses the exact-render-color mask path (color_dict)
    instead of the segmentation network — for datasets captured with the
    renderer's 'seg' palette (reference predict.py:91,445-469 branch).

    Default is the ROBUST stack (occlusion-aware error + NMS top-k seeds
    + fine survivor re-rank) even for synthetic masks: the working-res
    parity objective can keep a mirror basin the 2x re-rank separates
    (synth240 frame 62, BENCHMARKS.md round 5).  ``parity`` restores the
    reference-shaped objective/selection."""
    from ..config import ERROR_ROBUST_TAU
    from ..data.dataset import Dataset
    from ..prediction.analysis import Grapher
    from ..prediction.predictor import Predictor

    ds = Dataset(dataset)
    color_dict = None
    if synthetic:
        from ..simulation.renderer import Renderer

        color_dict = Renderer(
            "seg", ds.camera_pose[0], ds.attrs["color_intrinsics"]
        ).color_dict
    pred = Predictor(
        camera_pose=ds.camera_pose[0],
        ds_factor=ds_factor,
        do_angles=angs,
        base_intrin=ds.attrs["color_intrinsics"],
        model_ds=model_ds or dataset,
        color_dict=color_dict,
        **({} if parity else {"robust_tau": ERROR_ROBUST_TAU}),
    )
    n = min(len(ds), limit) if limit else len(ds)
    out = np.zeros((n, 6))
    t0 = time.time()
    # Frames are processed frame-parallel in chunks: every search stage runs
    # vmapped over the chunk (the workload's DP axis).  Chunks are bounded
    # by camera-pose sections (all frames in a batch share one pose).
    start = 0
    while start < n:
        end = min(start + chunk, n)
        pose0 = np.asarray(ds.camera_pose[start])
        while end > start + 1 and np.any(
            np.asarray(ds.camera_pose[end - 1]) != pose0
        ):
            end -= 1
        out[start:end] = pred.run_batch(
            np.asarray(ds.og_img[start:end]),
            np.asarray(ds.depthmaps[start:end]),
            pose0,
        )
        np.save(f"predictions_{dataset}.npy", out)
        rate = end / (time.time() - t0)
        print(f"{end}/{n} frames ({rate:.2f} fps)")
        start = end
    np.save(f"predictions_{dataset}.npy", out)
    if plot:
        Grapher(angs, out[:n], np.asarray(ds.angles[:n])).plot()
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dataset", help="Dataset to predict")
    p.add_argument("-angs", default="SLU", help="Joints to predict")
    p.add_argument("-ds_factor", type=int, default=8)
    p.add_argument("-limit", type=int, default=None)
    p.add_argument("-no_plot", action="store_true")
    p.add_argument("-model_ds", default=None, help="Model dataset criterion")
    p.add_argument(
        "-chunk", type=int, default=120,
        help="Frames per vmapped prediction chunk (HBM-bound: each chunk "
        "frame carries its staged top-k hypothesis batch)",
    )
    p.add_argument(
        "-synthetic", action="store_true",
        help="Exact-render-color masks instead of the segmentation net",
    )
    p.add_argument(
        "-parity", action="store_true",
        help="Reference-shaped objective/selection (no robust stack)",
    )
    a = p.parse_args()
    run(
        a.dataset, a.angs, a.ds_factor, chunk=a.chunk, plot=not a.no_plot,
        limit=a.limit, model_ds=a.model_ds, synthetic=a.synthetic,
        parity=a.parity,
    )


if __name__ == "__main__":
    main()
