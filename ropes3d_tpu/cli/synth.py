"""Synthetic best-case evaluation (reference ``synth.py:18-40``)."""

from __future__ import annotations

import argparse

import numpy as np


def run(
    dataset: str = None,
    num: int = 2500,
    file: str = "synth_test",
    noise: bool = False,
    ds_factor: int = 8,
    angs: str = "SLU",
    intrinsics: str = None,
):
    from ..config import DEFAULT_CAMERA_POSE
    from ..prediction.synthetic import SyntheticPredictor

    if dataset is not None:
        from ..data.dataset import Dataset

        ds = Dataset(dataset)
        camera_pose = ds.camera_pose[0]
        base_intrin = intrinsics or ds.attrs["color_intrinsics"]
    else:
        camera_pose = DEFAULT_CAMERA_POSE
        base_intrin = intrinsics or "1280_720_color"

    sp = SyntheticPredictor(camera_pose, base_intrin, ds_factor, angs, noise)
    return sp.run_batch(num, file)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dataset", nargs="?", default=None)
    p.add_argument("-num", type=int, default=2500)
    p.add_argument("-file", default="synth_test")
    p.add_argument("-noise", action="store_true")
    p.add_argument("-ds_factor", type=int, default=8)
    p.add_argument("-angs", default="SLU")
    p.add_argument("-intrinsics", default=None)
    a = p.parse_args()
    run(a.dataset, a.num, a.file, a.noise, a.ds_factor, a.angs, a.intrinsics)


if __name__ == "__main__":
    main()
