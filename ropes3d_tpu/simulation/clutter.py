"""Cluttered RGB-D scene composer for neural-path evaluation harnesses.

Z-buffer-composites a shaded robot render into a procedurally cluttered
scene: a sloped far background plane under gradient+speckle shading, plus
colored distractor rectangles at random depths that occlude the robot when
nearer.  Mirrors the training-side ``DeviceSynthPipeline`` z-buffer scene
model (``training/synth_data.py``) but is generated host-side with an
independent RNG, so it is a held-out domain for segmenters trained on the
device pipeline.

The reference evaluates its segmenter on real captures only
(``robotpose/prediction/predict.py:415-442`` consumes camera frames); this
harness is the synthetic stand-in that makes the full
segment-then-predict path benchmarkable without camera hardware.
"""

from __future__ import annotations

import numpy as np


class ClutteredSceneMaker:
    """Compose (robot_color, robot_depth) renders into cluttered RGB-D.

    Parameters mirror the historical ``assets/bench_cluttered.py`` harness
    (round-2/3 numbers were measured against exactly this distribution):
    background plane 3.2-5 m with +-0.8 m slope, 6 distractor rectangles at
    0.5-3.2 m, per-channel speckle sigma 25.
    """

    def __init__(self, height: int, width: int, rng: np.random.Generator,
                 num_distractors: int = 6):
        self.h, self.w = int(height), int(width)
        self.rng = rng
        self.num_distractors = num_distractors
        self._rr, self._cc = np.meshgrid(
            np.arange(self.h), np.arange(self.w), indexing="ij"
        )

    def compose(self, robot_color: np.ndarray, robot_depth: np.ndarray):
        """Returns (image uint8-range float [H,W,3], depth float [H,W])."""
        rng, rr, cc, H, W = self.rng, self._rr, self._cc, self.h, self.w
        img = (np.ones((H, W, 3)) * rng.uniform(0, 255, 3)
               + (cc / W * rng.uniform(-80, 80))[..., None]
               + (rr / H * rng.uniform(-80, 80))[..., None]
               + rng.normal(0, 25, (H, W, 3)))
        dep = (rng.uniform(3.2, 5.0)
               + (rr / H) * rng.uniform(-0.8, 0.8)
               + (cc / W) * rng.uniform(-0.8, 0.8))
        rob = (robot_depth > 0) & (robot_depth < dep)
        img[rob] = robot_color[rob]
        dep = np.where(rob, robot_depth, dep)
        for _ in range(self.num_distractors):
            cy, cx = rng.uniform(0, H), rng.uniform(0, W)
            hh, ww = rng.uniform(30, H / 3), rng.uniform(30, W / 3)
            col = rng.uniform(0, 255, 3)
            z = rng.uniform(0.5, 3.2)
            m = (np.abs(rr - cy) < hh) & (np.abs(cc - cx) < ww) & (z < dep)
            img[m] = col
            dep[m] = z
        return np.clip(img, 0, 255), dep
