"""Camera feed abstraction: live RealSense or prerecorded streams.

Parity port of ``robotpose/prediction/feed.py:14-99`` behind an interface so
prerecorded/dataset streams substitute for the hardware SDK (SURVEY.md §7
host/device boundary note).  ``LiveCamera`` uses pyrealsense2 when present;
``DatasetFeed``/``ArrayFeed`` provide the same ``get()`` contract without
hardware.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


class BaseFeed:
    def start(self) -> None: ...

    def stop(self) -> None: ...

    def get(self) -> Tuple[np.ndarray, np.ndarray]:
        """Return (color uint8 [H, W, 3], depth float [H, W] in metres)."""
        raise NotImplementedError

    def get_average(self, n: int = 20) -> Tuple[np.ndarray, np.ndarray]:
        """n-frame depth average (reference feed.py:71-99)."""
        color, acc = self.get()
        acc = acc.astype(float)
        for _ in range(n - 1):
            color, d = self.get()
            acc += d
        return color, acc / n


class LiveCamera(BaseFeed):
    """RealSense 1280x720@30fps RGBD with decimation/spatial/temporal
    filtering (reference feed.py:14-69).  Requires pyrealsense2."""

    def __init__(self, width: int = 1280, height: int = 720, fps: int = 30):
        import pyrealsense2 as rs  # hardware-only dependency

        self.rs = rs
        self.width, self.height, self.fps = width, height, fps
        self.pipeline = rs.pipeline()
        self.config = rs.config()
        self.config.enable_stream(rs.stream.depth, width, height, rs.format.z16, fps)
        self.config.enable_stream(rs.stream.color, width, height, rs.format.bgr8, fps)
        self.align = rs.align(rs.stream.color)
        self.decimation = rs.decimation_filter()
        self.spatial = rs.spatial_filter()
        self.temporal = rs.temporal_filter()
        self.started = False

    def start(self) -> None:
        profile = self.pipeline.start(self.config)
        sensor = profile.get_device().first_depth_sensor()
        self.depth_scale = sensor.get_depth_scale()
        self.started = True

    def stop(self) -> None:
        if self.started:
            self.pipeline.stop()
            self.started = False

    def get(self) -> Tuple[np.ndarray, np.ndarray]:
        frames = self.pipeline.wait_for_frames()
        frames = self.align.process(frames)
        depth = frames.get_depth_frame()
        for f in (self.spatial, self.temporal):
            depth = f.process(depth)
        color = np.asanyarray(frames.get_color_frame().get_data())
        d = np.asanyarray(depth.get_data()).astype(float) * self.depth_scale
        return color, d


class DatasetFeed(BaseFeed):
    """Replays a compiled dataset as a camera feed (frames loop)."""

    def __init__(self, dataset: str):
        from ..data.dataset import Dataset

        self.ds = Dataset(dataset)
        self.idx = 0

    def get(self) -> Tuple[np.ndarray, np.ndarray]:
        i = self.idx % len(self.ds)
        self.idx += 1
        return np.asarray(self.ds.og_img[i]), np.asarray(self.ds.depthmaps[i])

    @property
    def angles(self) -> np.ndarray:
        i = (self.idx - 1) % len(self.ds)
        return np.asarray(self.ds.angles[i])


class ArrayFeed(BaseFeed):
    """Feed over in-memory arrays (tests, synthetic streams)."""

    def __init__(self, colors: np.ndarray, depths: np.ndarray):
        self.colors, self.depths = colors, depths
        self.idx = 0

    def get(self) -> Tuple[np.ndarray, np.ndarray]:
        i = self.idx % len(self.colors)
        self.idx += 1
        return self.colors[i], self.depths[i]
