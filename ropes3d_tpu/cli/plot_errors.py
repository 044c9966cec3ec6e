"""Plot angle + Cartesian errors from a results npy (reference
``plot_errors.py:30-72``).  Handles both the synthetic ``(2, N, 6)``
actual/predicted format and dataset-prediction ``(N, 6)`` format (the
latter compared against the dataset's recorded angles).
"""

from __future__ import annotations

import argparse

import numpy as np


def run(file: str, angs: str = "SLU", dataset: str = None, sort_by: str = None,
        show: bool = True):
    from ..prediction.analysis import Grapher, JointDistance

    data = np.load(file)
    if data.ndim == 3 and data.shape[0] == 2:
        actual, predicted = data[0], data[1]
    else:
        assert dataset is not None, "dataset required for (N,6) prediction files"
        from ..data.dataset import Dataset

        ds = Dataset(dataset)
        predicted = data
        actual = np.asarray(ds.angles[: len(predicted)])
    # Drop all-zero rows (unfinished batches).
    done = ~np.all((actual == 0) & (predicted == 0), axis=1)
    actual, predicted = actual[done], predicted[done]

    if sort_by is not None:
        order = np.argsort(actual[:, "SLURBT".index(sort_by.upper())])
        actual, predicted = actual[order], predicted[order]

    stats = Grapher(angs, predicted, actual).plot(show=show)
    jd = JointDistance()
    jd.plot(predicted, actual, y_lim=0.5, show=show)
    return stats


def main():
    p = argparse.ArgumentParser()
    p.add_argument("file")
    p.add_argument("-angs", default="SLU")
    p.add_argument("-dataset", default=None)
    p.add_argument("-sort_by", default=None)
    p.add_argument("-no_show", action="store_true")
    a = p.parse_args()
    if a.no_show:
        import matplotlib

        matplotlib.use("Agg")
    run(a.file, a.angs, a.dataset, a.sort_by, show=not a.no_show)


if __name__ == "__main__":
    main()
