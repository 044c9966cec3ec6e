"""Collection-time pose planning.

Parity port of ``robotpose/training/planning.py:19-95``: grids of robot
poses for data collection, traversed boustrophedon (direction-alternating)
to minimise joint travel; ``noisyGrid`` adds clipped uniform noise.
"""

from __future__ import annotations

import numpy as np

from ..robot import URDFReader
from ..utils import str_to_arr


class Planner:
    def __init__(self):
        self.u_reader = URDFReader()

    def _uniformGrid(self, divisions: np.ndarray) -> list:
        """Per-joint linspace over limits (1 division -> midpoint 0)."""
        ranges = []
        for idx in range(6):
            if divisions[idx] > 1:
                ranges.append(
                    np.linspace(
                        self.u_reader.joint_limits[idx, 0],
                        self.u_reader.joint_limits[idx, 1],
                        divisions[idx],
                    )
                )
            else:
                ranges.append(np.zeros(1))
        return ranges

    def basicGrid(self, divisions: np.ndarray) -> np.ndarray:
        """Nested boustrophedon traversal: each joint sweeps its range,
        alternating direction so consecutive poses differ in one joint step."""
        divisions = np.asarray(divisions, int)
        ranges = self._uniformGrid(divisions)
        num = int(np.prod([len(r) for r in ranges]))
        out = np.zeros((num, 6))

        idx = np.zeros(6, int)
        direction = np.ones(6, int)
        for i in range(num):
            out[i] = [ranges[j][idx[j]] for j in range(6)]
            # Increment innermost (first) joint; carry with direction flip.
            for j in range(6):
                idx[j] += direction[j]
                if 0 <= idx[j] < len(ranges[j]):
                    break
                direction[j] *= -1
                idx[j] += direction[j]
        return out

    def noisyGrid(self, divisions: np.ndarray, noise_scale: float = 0.1) -> np.ndarray:
        grid = self.basicGrid(divisions)
        lim = self.u_reader.joint_limits
        span = (lim[:, 1] - lim[:, 0])[None, :]
        noise = np.random.uniform(-noise_scale, noise_scale, grid.shape) * span
        active = grid != 0
        return np.clip(grid + noise * active, lim[:, 0], lim[:, 1])
