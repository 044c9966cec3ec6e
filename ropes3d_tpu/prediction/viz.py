"""Live prediction visualiser.

Parity port of ``ProjectionViz`` (reference predict.py:517-603): a 2x2
composite — input color/depth blend, detected links, render, render-vs-input
depth difference — shown live and optionally written to an AVI.
Headless-safe: display is skipped when no GUI is available.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..config import VIDEO_FPS
from ..ops.image import color_array


class ProjectionViz:
    def __init__(self, video_path: str = None, fps: int = VIDEO_FPS,
                 resolution=(1280, 720)):
        self.write_to_file = video_path is not None
        self.resolution = resolution
        self.writer = None
        if video_path is not None:
            import cv2

            fourcc = cv2.VideoWriter_fourcc(*"XVID")
            self.writer = cv2.VideoWriter(video_path, fourcc, fps, resolution)
        self.res = np.flip(np.array(self.resolution))
        self.resize_to = tuple(np.array(self.resolution) // 2)
        self.frame = np.zeros((*self.res, 3), dtype=np.uint8)
        self.input_side_up_to_date = False
        self._display = not os.environ.get("ROPES3D_HEADLESS")

    def loadTargetColor(self, target_color):
        self.tgt_color = self._as_rgb(target_color)
        self.input_side_up_to_date = False

    def loadTargetDepth(self, target_depth):
        self.tgt_depth = np.asarray(target_depth)
        self.input_side_up_to_date = False

    def loadSegmentedLinks(self, segmented_color):
        self.seg_links = self._as_rgb(segmented_color)
        self.input_side_up_to_date = False

    def loadRenderedColor(self, render_color):
        self.rend_color = self._as_rgb(render_color)

    def loadRenderedDepth(self, render_depth):
        self.rend_depth = np.asarray(render_depth)

    @staticmethod
    def _as_rgb(img):
        img = np.asarray(img)
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        return img.astype(np.uint8)

    def _resize(self, img, nearest=False):
        import cv2

        interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
        return cv2.resize(img, self.resize_to, interpolation=interp)

    def _gen_input(self):
        import cv2

        COLOR_ALPHA = 0.6
        color = self._resize(self.tgt_color)
        depth = color_array(self._resize(self.tgt_depth), percent=5)
        blend = cv2.addWeighted(color, COLOR_ALPHA, depth, 1 - COLOR_ALPHA, 0)
        self.frame[: self.res[0] // 2, : self.res[1] // 2] = blend
        if hasattr(self, "seg_links"):
            self.frame[self.res[0] // 2 :, : self.res[1] // 2] = self._resize(
                self.seg_links
            )
        font = cv2.FONT_HERSHEY_SIMPLEX
        white = (255, 255, 255)
        cv2.putText(self.frame, "Input Color/Depth", (10, 30), font, 1, white, 2)
        cv2.putText(
            self.frame, "Detected Links", (10, self.res[0] // 2 + 30), font, 1, white, 2
        )
        self.input_side_up_to_date = True

    def show(self) -> np.ndarray:
        import cv2

        if not self.input_side_up_to_date:
            self._gen_input()
        self.frame[: self.res[0] // 2, self.res[1] // 2 :] = self._resize(
            self.rend_color
        )
        self.frame[self.res[0] // 2 :, self.res[1] // 2 :] = self._depth_diff()
        white = (255, 255, 255)
        font = cv2.FONT_HERSHEY_SIMPLEX
        cv2.line(self.frame, (0, self.res[0] // 2), (self.res[1], self.res[0] // 2), white, 3)
        cv2.line(self.frame, (self.res[1] // 2, 0), (self.res[1] // 2, self.res[0]), white, 3)
        cv2.putText(self.frame, "Render", (self.res[1] // 2 + 10, 30), font, 1, white, 2)
        cv2.putText(
            self.frame,
            "Render Depth vs. Input Depth",
            (self.res[1] // 2 + 10, self.res[0] // 2 + 30),
            font, 1, white, 2,
        )
        if self._display:
            try:
                cv2.imshow("Projection Matcher", self.frame)
                cv2.waitKey(1)
            except cv2.error:
                self._display = False
        if self.write_to_file:
            self.writer.write(self.frame)
        return self.frame

    def _depth_diff(self):
        tgt = self._resize(self.tgt_depth, nearest=True)
        d = self._resize(self.rend_depth, nearest=True)
        out = tgt - d
        out[out == tgt] = 0
        colored = color_array(out)
        colored[out == tgt] = (55, 55, 55)
        return colored

    def __del__(self):
        if self.writer is not None:
            self.writer.release()
