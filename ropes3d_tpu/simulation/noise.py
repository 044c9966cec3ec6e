"""Synthetic RealSense-like depth dropout ("holes") noise.

Parity port of the reference ``robotpose/simulation/noise.py:7-31``:
multi-scale thresholded gaussian noise, dilated per scale, unioned, then
morphologically closed at ``connection_factor`` and inverted into a dropout
mask.  Doubles as a fault-injection knob for evaluation (SURVEY.md §5) and a
data-augmentation op for segmentation training.
"""

from __future__ import annotations

import numpy as np

from ..ops.image import dilate as _jdilate, erode as _jerode
import jax.numpy as jnp


class NoiseMaker:
    def __init__(self, rng: np.random.Generator = None):
        self.rng = rng or np.random.default_rng()

    def holes(
        self,
        arr: np.ndarray,
        max_size: int = 25,
        std: float = 0.22,
        thresh_factor: float = 1,
        connection_factor: int = 20,
    ) -> np.ndarray:
        shape = arr.shape
        holes = np.zeros(shape)
        for dilation in np.arange(3, max_size, 3):
            thresh = -thresh_factor / dilation + 1
            noise = np.abs(self.rng.normal(0, std, shape))
            noise = np.clip(noise, 0, 1)
            noise[noise < thresh] = 0
            noise = np.asarray(_jdilate(jnp.asarray(noise), int(dilation)))
            holes += noise
        holes[holes != 0] = 1
        holes = np.asarray(
            _jerode(
                _jdilate(jnp.asarray(holes), connection_factor), connection_factor
            )
        )
        keep = holes == 0
        return arr * keep.astype(float)
