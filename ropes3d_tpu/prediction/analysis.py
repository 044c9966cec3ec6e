"""Prediction analysis: per-joint error statistics and plots.

Parity port of ``robotpose/prediction/analysis.py:17-144``: ``general_plot``
raw+error panels with mean/std/median/90/95/99/max table, ``Grapher`` with
B-joint ±360/±180 wraparound correction, ``JointDistance`` FK-based
Cartesian per-joint error.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..robot.kinematics import ForwardKinematics
from ..utils import str_to_arr


def error_stats(err: np.ndarray) -> dict:
    """Per-joint |error| statistics (the printed table of general_plot)."""
    err = np.abs(err)
    return {
        "mean": np.mean(err, 0),
        "std": np.std(err, 0),
        "median": np.median(err, 0),
        "p90": np.percentile(err, 90, 0),
        "p95": np.percentile(err, 95, 0),
        "p99": np.percentile(err, 99, 0),
        "max": np.max(err, 0),
    }


def general_plot(
    joints: List[str],
    unit: str,
    given_err: Optional[np.ndarray] = None,
    actual: Optional[np.ndarray] = None,
    predicted: Optional[np.ndarray] = None,
    y_lim=None,
    show: bool = True,
):
    import matplotlib.pyplot as plt

    if isinstance(y_lim, (int, float)):
        y_lim = (-y_lim, y_lim)
    plots = 2 if given_err is None else 1
    fig, axs = plt.subplots(len(joints), plots, squeeze=False)

    if given_err is None:
        assert actual.shape[0] == predicted.shape[0]
        for idx, joint in enumerate(joints):
            axs[idx, 0].set_title(f"Raw {joint}")
            axs[idx, 0].set_ylabel(f"({unit})")
            axs[idx, 0].plot(actual[:, idx])
            axs[idx, 0].plot(predicted[:, idx], color="purple")
        err = predicted - actual
        err_col = 1
    else:
        err = given_err
        err_col = 0

    zeros = np.zeros(err.shape[0])
    for idx, joint in enumerate(joints):
        ax = axs[idx, err_col]
        ax.set_title(f"{joint} Error")
        ax.set_ylabel(f"({unit})")
        ax.plot(zeros)
        ax.plot(err[:, idx], color="purple")
        if y_lim is not None:
            ax.set_ylim(y_lim)

    stats = error_stats(err)
    w = 6
    print(f"\nErr Stats ({unit}):")
    print(
        f"\t   {' ' * (w - 4)}Mean {' ' * (w - 3)}Std | {' ' * (w - 3)}Med "
        f"{' ' * (w - 4)}90th {' ' * (w - 4)}95th {' ' * (w - 4)}99th {' ' * (w - 3)}Max"
    )
    for idx, joint in enumerate(joints):
        print(
            f"\t{joint}: {stats['mean'][idx]:{w}.2f} {stats['std'][idx]:{w}.2f} | "
            f"{stats['median'][idx]:{w}.2f} {stats['p90'][idx]:{w}.2f} "
            f"{stats['p95'][idx]:{w}.2f} {stats['p99'][idx]:{w}.2f} "
            f"{stats['max'][idx]:{w}.2f}"
        )
    if show:
        plt.show()
    return stats


class Grapher:
    """Degrees-domain comparison plots with B-joint wrap correction."""

    def __init__(
        self,
        joints_to_plot: str,
        predictions: np.ndarray,
        ds_angles: np.ndarray = None,
    ):
        self.compare = ds_angles is not None
        self.joints = list(joints_to_plot.upper())
        self.predictions = np.degrees(np.asarray(predictions, float))
        self.true = np.degrees(np.asarray(ds_angles, float)) if self.compare else None
        self._b_correction()
        self._cropComparison()

    def _b_correction(self) -> None:
        """±360/±180 wraps on the B joint (analysis.py:93-101)."""
        if "B" not in self.joints or self.true is None:
            return
        offsets = np.array([-360, -180, 0, 180, 360])
        for idx in range(len(self.predictions)):
            errs = np.abs(self.predictions[idx, 4] + offsets - self.true[idx, 4])
            self.predictions[idx, 4] += offsets[np.argmin(errs)]

    def _cropComparison(self) -> None:
        ang = ["S", "L", "U", "R", "B", "T"]
        l = len(self.predictions)
        true = np.copy(self.true) if self.true is not None else None
        preds = np.copy(self.predictions)
        self.predictions = np.zeros((l, len(self.joints)))
        if true is not None:
            self.true = np.zeros((l, len(self.joints)))
        for idx, joint in enumerate(self.joints):
            self.predictions[:, idx] = preds[:l, ang.index(joint)]
            if true is not None:
                self.true[:, idx] = true[:l, ang.index(joint)]

    def plot(self, ylim=None, show: bool = True):
        return general_plot(
            self.joints, "deg", actual=self.true, predicted=self.predictions,
            y_lim=ylim, show=show,
        )


class JointDistance(ForwardKinematics):
    """FK-based Cartesian per-joint error (analysis.py:119-144)."""

    def __init__(self):
        super().__init__()
        self.joints_str = "LURBT"
        self.joints = list(self.joints_str)

    def distance(self, predicted: np.ndarray, actual: np.ndarray) -> np.ndarray:
        assert predicted.shape[0] == actual.shape[0]
        pa = self.batch_fn(np.asarray(predicted, np.float32))[:, 1:, :3, 3]
        aa = self.batch_fn(np.asarray(actual, np.float32))[:, 1:, :3, 3]
        return np.asarray(np.sqrt(((np.asarray(aa) - np.asarray(pa)) ** 2).sum(-1)))

    def plot(self, predicted: np.ndarray, actual: np.ndarray, y_lim=None, show=True):
        err = self.distance(predicted, actual)
        return general_plot(
            self.joints,
            "cm",
            given_err=err[:, str_to_arr(self.joints_str)] * 100,
            y_lim=[0, y_lim * 100] if y_lim else None,
            show=show,
        )

    def single(self, predicted, actual, joint: str = "T"):
        err = self.distance(np.atleast_2d(predicted), np.atleast_2d(actual))
        return err[..., str_to_arr(joint)][0]
