"""Pose-grid generation for data collection (reference
``collection_planner.py:17-40``)."""

from __future__ import annotations

import argparse

import numpy as np


def run(num: int = 1000, file: str = "collection_plan", angs: str = "SLURBT",
        noise: bool = False) -> np.ndarray:
    from ..training.planning import Planner
    from ..utils import str_to_arr

    mask = str_to_arr(angs)
    n_active = int(mask.sum())
    per_joint = max(2, int(round(num ** (1 / max(n_active, 1)))))
    divisions = np.where(mask, per_joint, 1)
    planner = Planner()
    grid = planner.noisyGrid(divisions) if noise else planner.basicGrid(divisions)
    if not file.endswith(".npy"):
        file += ".npy"
    np.save(file, grid)
    print(f"saved {len(grid)} poses to {file}")
    return grid


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-num", type=int, default=1000)
    p.add_argument("-file", default="collection_plan")
    p.add_argument("-angs", default="SLURBT")
    p.add_argument("-noise", action="store_true")
    a = p.parse_args()
    run(a.num, a.file, a.angs, a.noise)


if __name__ == "__main__":
    main()
