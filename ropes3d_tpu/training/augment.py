"""Detection-aware data augmentation.

Stand-in for the imgaug pipeline PixelLib enables with ``augmentation=True``
(reference train.py:54): horizontal flip, brightness/contrast jitter, and
gaussian noise — all updating boxes/masks consistently.  The depth-hole
noise model (``simulation/noise.py``) can be chained for RGBD robustness.
"""

from __future__ import annotations

import numpy as np


class Augmenter:
    def __init__(
        self,
        flip_prob: float = 0.5,
        brightness: float = 0.2,
        contrast: float = 0.2,
        noise_std: float = 4.0,
        seed: int = 0,
    ):
        self.rng = np.random.default_rng(seed)
        self.flip_prob = flip_prob
        self.brightness = brightness
        self.contrast = contrast
        self.noise_std = noise_std

    def __call__(self, img, boxes, classes, masks):
        img = img.astype(np.float32)
        h, w = img.shape[:2]
        if self.rng.random() < self.flip_prob:
            img = img[:, ::-1]
            masks = masks[:, :, ::-1]
            if len(boxes):
                boxes = boxes.copy()
                x1 = boxes[:, 1].copy()
                boxes[:, 1] = w - boxes[:, 3]
                boxes[:, 3] = w - x1
        if self.brightness:
            img = img + self.rng.uniform(-self.brightness, self.brightness) * 255
        if self.contrast:
            c = 1.0 + self.rng.uniform(-self.contrast, self.contrast)
            img = (img - img.mean()) * c + img.mean()
        if self.noise_std:
            img = img + self.rng.normal(0, self.noise_std, img.shape)
        return (
            np.clip(img, 0, 255).astype(np.uint8),
            boxes,
            classes,
            np.ascontiguousarray(masks),
        )
