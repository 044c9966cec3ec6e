"""Prediction stage configurations and canonical recipes.

Stage *configs* are plain descriptions; their execution lives in
``engine.py`` as jitted device programs.  Hyperparameters are parity with
the reference recipes (``robotpose/prediction/stages.py:128-178``) — the
staged-search behavior (lookup init -> perspective flips -> sweeps ->
coordinate descent) is the part of the system the accuracy target depends
on, so the numbers are kept identical.
"""

from __future__ import annotations

from typing import List, Optional, Union

import numpy as np

from ..utils import str_to_arr


class Lookup:
    """Depth comparison against the pre-rendered lookup stack.

    Globally configured (LOOKUP_JOINTS / LOOKUP_NUM_RENDERED in config.py),
    matching reference stages.py:16-24.
    """


class BaseStage:
    def __init__(self, to_render: int):
        self.to_render = to_render


class SFlip(BaseStage):
    """Perspective-flip of the S joint about the camera shadow axis
    (reference stages.py:30-41, executed per predict.py:232-281)."""


class Sweep(BaseStage):
    def __init__(
        self,
        to_render: int,
        divs: int,
        joints: Union[str, np.ndarray],
        range: Optional[float] = None,
    ):
        super().__init__(to_render)
        self.divs, self.range = divs, range
        self.joints = str_to_arr(joints) if isinstance(joints, str) else joints


class InterpolativeSweep(Sweep):
    """Sweep a joint range in ``divs`` steps and cubic-interpolate the error
    curve to predict its true minimum (reference stages.py:50-69)."""


class TensorSweep(Sweep):
    """Sweep a joint range and pick the argmin of the batched sqrt-domain
    depth error (reference stages.py:71-90)."""


class GridSweep(BaseStage):
    """2-D tensor-product sweep over two *coupled* joints (beyond the
    reference, which has only 1-D sweeps).  Evaluates the full
    ``divs_a x divs_b`` grid in ONE batched eval and keeps the argmin if
    it beats the incumbent.  Exists for the wrist pair (R, B): R rotates
    the forearm about its own axis, so its visual effect vanishes at
    B ~= 0 — a 1-D R sweep from the post-SLU state (B = 0) is
    uninformative, while the R x B grid scores every R in the context of
    every candidate B.  A few hundred extra candidates is noise at the
    fused evaluator's throughput."""

    def __init__(
        self,
        to_render: int,
        divs: Union[int, tuple],
        joints: Union[str, np.ndarray],
        range: Optional[float] = None,
    ):
        super().__init__(to_render)
        self.divs = (divs, divs) if isinstance(divs, int) else tuple(divs)
        self.range = range
        self.joints = str_to_arr(joints) if isinstance(joints, str) else joints
        assert int(np.sum(self.joints)) == 2, "GridSweep takes exactly 2 joints"


class Descent(BaseStage):
    """Adaptive-step coordinate descent (reference stages.py:92-119)."""

    def __init__(
        self,
        to_render: int,
        iterations: int,
        joints: Union[str, np.ndarray],
        init_rate: Union[float, int, np.ndarray, list, None] = None,
        rate_reduction: float = 0.5,
        early_stop_thresh: float = 0.01,
    ):
        super().__init__(to_render)
        self.its, self.rate_redux, self.early_stop = (
            iterations,
            rate_reduction,
            early_stop_thresh,
        )
        self.joints = str_to_arr(joints) if isinstance(joints, str) else joints
        self.init_rate = (
            [init_rate] * 6
            if isinstance(init_rate, (float, int)) or init_rate is None
            else init_rate
        )


class Polish(BaseStage):
    """Fine batched pattern search below the descent's min-step floor.

    Beyond the reference: the reference's coordinate descent bottoms out at
    ``min_ang_inc`` (0.005 rad ~= 0.29 deg, predict.py:184-187), which puts
    a floor under the achievable median error.  Polish evaluates ALL
    ``3^k`` combinations of {-r, 0, +r} over the active joints at a ladder
    of shrinking radii — one batched eval per radius — and keeps the
    argmin.  Diagonal moves + sub-min_inc radii cut the median error well
    below the descent floor for ~2 extra device evals.
    """

    def __init__(
        self,
        to_render: int,
        joints: Union[str, np.ndarray] = "SLU",
        radii=(0.003, 0.0012, 0.0005),
    ):
        super().__init__(to_render)
        self.joints = str_to_arr(joints) if isinstance(joints, str) else joints
        self.radii = tuple(float(r) for r in radii)


# Class aliases (reference stages.py:121-124)
IntSweep = InterpolativeSweep
ISweep = InterpolativeSweep
TSweep = TensorSweep


def getStages(angles: str) -> Optional[List]:
    """Canonical stage recipes per joint set (reference stages.py:128-178)."""
    if angles == "SL":
        lookup = Lookup()
        s_flip = SFlip(4)
        s_sweep_narrow = InterpolativeSweep(4, 10, "S", 0.1)
        l_sweep_narrow = InterpolativeSweep(4, 10, "L", 0.1)
        sweeps = [l_sweep_narrow, s_sweep_narrow]
        return [lookup, s_flip, *sweeps, s_flip]

    if angles == "SLU":
        lookup = Lookup()
        s_flip_4 = SFlip(4)
        sl_tune = Descent(
            4, 10, "SL", [0.05, 0.05, 0.1, 0.5, 0.5, 0.5], early_stop_thresh=0.1
        )
        sl_init = [s_flip_4, sl_tune, s_flip_4]

        u_sweep_wide = InterpolativeSweep(6, 25, "U")
        s_flip_6 = SFlip(6)
        u_sweep_narrow = InterpolativeSweep(6, 10, "U", 0.1)
        u_stages = [u_sweep_wide, s_flip_4, s_flip_6, u_sweep_narrow]

        full_tune = Descent(6, 40, "SLU", early_stop_thresh=0.0075)
        return [lookup, *sl_init, *u_stages, full_tune, Polish(6, "SLU")]

    # SLUB / SLURB: full-DoF recipes (beyond the reference, which leaves
    # these undefined — stages.py:170-176).  Extend the SLU recipe with
    # B (and R) refinement sweeps + a full descent.
    if angles == "SLUB":
        # The B landscape at working res is multi-modal (the bend's depth
        # signature is subtle), so the wide pass is dense: 49 divs instead
        # of 25.  isweep keeps the best of {incumbent, grid argmin,
        # interpolated minimum}, so density is what guards against
        # wrong-lobe interpolation — extra candidates are ~free.
        base = getStages("SLU")[:-2]
        b_sweep_wide = InterpolativeSweep(6, 49, "B")
        b_sweep_narrow = InterpolativeSweep(6, 10, "B", 0.1)
        full_tune = Descent(6, 40, "SLUB", early_stop_thresh=0.0075)
        return [*base, b_sweep_wide, b_sweep_narrow, full_tune, Polish(6, "SLUB")]

    if angles == "SLURB":
        # R and B are coupled (R is invisible at B ~= 0): sweep the R x B
        # grid jointly, then narrow 1-D passes, then the full descent.
        base = getStages("SLU")[:-2]
        rb_grid = GridSweep(6, (21, 21), "RB")
        r_sweep_narrow = InterpolativeSweep(6, 10, "R", 0.15)
        b_sweep_narrow = InterpolativeSweep(6, 10, "B", 0.15)
        full_tune = Descent(6, 50, "SLURB", early_stop_thresh=0.0075)
        return [
            *base, rb_grid, r_sweep_narrow, b_sweep_narrow, full_tune,
            Polish(6, "SLURB"),
        ]

    return None
