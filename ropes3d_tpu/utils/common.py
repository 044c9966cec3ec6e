"""Small shared helpers.

Re-implements the pure-Python helpers from the reference's
``robotpose/utils.py`` (str_to_arr:51-58, get_key:60-62, get_extremes:83-97,
workerCount:40-43, outlier rejection:65-79).  GPU-memory querying
(``get_gpu_memory``) is intentionally absent: device-memory budgeting is
HBM-based and lives in ``ropes3d_tpu/parallel/memory.py``.
"""

from __future__ import annotations

import multiprocessing as mp
from typing import Any, List, Union

import numpy as np

JOINT_LETTERS = ["S", "L", "U", "R", "B", "T"]


def str_to_arr(string: str) -> np.ndarray:
    """Convert a string of SLURBT letters to a (6,) boolean mask."""
    out = np.zeros(6, bool)
    for letter in string.upper():
        out[JOINT_LETTERS.index(letter)] = True
    return out


def arr_to_str(mask: np.ndarray) -> str:
    """Inverse of :func:`str_to_arr`."""
    return "".join(j for j, m in zip(JOINT_LETTERS, mask) if m)


def get_key(d: dict, val: Any) -> Union[str, list]:
    """Return the key of a dictionary value."""
    return list(d.keys())[list(d.values()).index(val)]


def worker_count() -> int:
    """Number of host-side worker processes for IO/annotation pools."""
    cpu = mp.cpu_count()
    return max(1, int(min(cpu - 2, 0.75 * cpu)))


def get_extremes(mat: np.ndarray) -> List[int]:
    """Bounds of truthy data in a 2D boolean array: [min_r, max_r, min_c, max_c]."""
    r, c = np.where(mat)
    return [r.min(), r.max(), c.min(), c.max()]


def reject_outliers_std(data: np.ndarray, m: float = 2) -> np.ndarray:
    return data[np.abs(data - np.mean(data)) < m * np.std(data)]


def reject_outliers_iqr(data: np.ndarray, iqr_mult: float = 1.5) -> np.ndarray:
    hi, lo = np.percentile(data, [75, 25])
    iqr = hi - lo
    data = data[data >= lo - iqr_mult * iqr]
    return data[data <= hi + iqr_mult * iqr]


def outlier_min_max(data: np.ndarray, iqr_mult: float = 1.5):
    data = reject_outliers_iqr(data, iqr_mult)
    return np.min(data), np.max(data)


def folder_size(path: str) -> int:
    import os

    size = 0
    for r, _, files in os.walk(path):
        for f in files:
            size += os.path.getsize(os.path.join(r, f))
    return size


def size_to_str(b: int) -> str:
    postfixes = ["B", "KB", "MB", "GB"]
    vals = [b / (1000**p) for p in range(4)]
    v = min([x for x in vals if x >= 1], default=vals[0])
    return f"{v:0.2f} {postfixes[vals.index(v)]}"
