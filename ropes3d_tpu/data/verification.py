"""Dataset verification: flag and remove mis-recorded poses.

The reference Verifier is a PySimpleGUI thumbnail grid with render overlays
(``robotpose/data/verification.py:24-226``).  Here the core is headless and
scriptable — overlay generation + deletion via ``Builder.remove_idxs`` —
with an optional matplotlib-based interactive review for humans.
"""

from __future__ import annotations

import os
from typing import Iterable, List, Optional

import numpy as np

from ..config import VERIFIER_ALPHA
from .building import Builder
from .dataset import Dataset


class Verifier:
    def __init__(self, dataset: str):
        self.name = dataset
        self.ds = Dataset(dataset)

    def overlay(self, idx: int) -> np.ndarray:
        """Image blended with the expected render at the recorded pose."""
        from ..simulation.renderer import DatasetRenderer

        if not hasattr(self, "rend"):
            self.rend = DatasetRenderer(self.name, mode="seg")
        color, _ = self.rend.render_at(idx)
        img = np.asarray(self.ds.og_img[idx], float)
        if color.shape != img.shape:
            import cv2

            color = cv2.resize(color, (img.shape[1], img.shape[0]))
        out = VERIFIER_ALPHA * img + (1 - VERIFIER_ALPHA) * color
        return out.astype(np.uint8)

    def auto_flag(self, err_thresh: float = 0.15) -> List[int]:
        """Flag frames whose render disagrees with the recorded depth.

        Uses the silhouette mismatch between the rendered robot and depth
        data — a headless stand-in for eyeballing thumbnails.
        """
        from ..simulation.renderer import DatasetRenderer

        rend = DatasetRenderer(self.name, mode="seg")
        bad = []
        for i in range(self.ds.length):
            rend.setPosesFromDS(i)
            depth, lid = rend.render_batch_angles(
                np.asarray(self.ds.angles[i])[None]
            )
            r = np.asarray(depth[0]) > 0
            d = np.asarray(self.ds.depthmaps[i])
            if r.shape != d.shape:
                import cv2

                d = cv2.resize(d, (r.shape[1], r.shape[0]))
            o = d > 0
            inter = (r & o).sum()
            union = (r | o).sum()
            if union and inter / union < err_thresh:
                bad.append(i)
        return bad

    def remove(self, idxs: Iterable[int]) -> None:
        """Delete frames from the dataset (reference child-confirm flow ends
        in Builder.remove_idxs, verification.py:200-226)."""
        idxs = sorted(set(int(i) for i in idxs))
        if not idxs:
            return
        path = self.ds.path
        self.ds.close()
        Builder().remove_idxs(path, idxs)
        self.ds = Dataset(self.name)

    def run(self, interactive: bool = True) -> Optional[List[int]]:
        """Interactive review (matplotlib) or auto-flagging fallback."""
        if not interactive or os.environ.get("ROPES3D_HEADLESS"):
            return self.auto_flag()
        import matplotlib.pyplot as plt

        flagged: List[int] = []
        cols, rows = 4, 4
        per_page = cols * rows
        for start in range(0, self.ds.length, per_page):
            fig, axs = plt.subplots(rows, cols, figsize=(12, 9))
            idxs = list(range(start, min(start + per_page, self.ds.length)))
            for ax, i in zip(axs.ravel(), idxs):
                ax.imshow(self.overlay(i)[..., ::-1])
                ax.set_title(str(i))
                ax.axis("off")

            def onclick(event, idxs=idxs, axs=axs):
                for ax, i in zip(axs.ravel(), idxs):
                    if event.inaxes is ax:
                        flagged.append(i)
                        ax.set_title(f"{i} [DEL]", color="red")
                        event.canvas.draw()

            fig.canvas.mpl_connect("button_press_event", onclick)
            plt.show()
        return flagged
