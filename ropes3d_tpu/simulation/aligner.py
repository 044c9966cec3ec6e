"""Manual camera-extrinsics alignment tool.

Parity port of the reference ``Aligner`` (``robotpose/simulation/render.py:
190-412``): overlay the render on the captured image and nudge the camera
pose with keyboard moves (WASD/ZX translate, QE/RF/GH rotate, +/- step
ladder), saving the pose back into the dataset per *section* (contiguous
frames sharing a camera pose, render.py:390-412).

The core is headless and scriptable (``move``/``overlay``/``save``); ``run``
adds a matplotlib front-end when a display is available.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..data.dataset import Dataset
from .renderer import DatasetRenderer

# Step-size ladder (reference uses a multiplicative ladder on +/-).
_STEPS = [0.1, 0.05, 0.01, 0.005, 0.001]


class Aligner:
    KEYMAP = {
        # key: (index, direction) — x/y/z translate, pitch/roll/yaw rotate
        "w": (1, +1), "s": (1, -1),
        "a": (0, -1), "d": (0, +1),
        "z": (2, -1), "x": (2, +1),
        "q": (3, -1), "e": (3, +1),
        "r": (4, -1), "f": (4, +1),
        "g": (5, -1), "h": (5, +1),
    }

    def __init__(self, dataset: str):
        self.name = dataset
        self.ds = Dataset(dataset, permissions="a")
        self.rend = DatasetRenderer(dataset, mode="seg_full")
        self.step_idx = 2
        self.section = 0
        self.idx = self.sections[0][0]
        self.zoom = 1.0  # display zoom about the image center

    # ------------------------------------------------------------ sections
    @property
    def sections(self) -> List[Tuple[int, int]]:
        """Contiguous [start, end) frame ranges sharing one camera pose."""
        poses = np.asarray(self.ds.camera_pose)
        out = []
        start = 0
        for i in range(1, len(poses)):
            if not np.allclose(poses[i], poses[start]):
                out.append((start, i))
                start = i
        out.append((start, len(poses)))
        return out

    def goto_section(self, s: int) -> None:
        secs = self.sections
        self.section = int(np.clip(s, 0, len(secs) - 1))
        self.idx = secs[self.section][0]

    def goto(self, idx: int) -> None:
        self.idx = int(np.clip(idx, 0, len(self.ds) - 1))
        for i, (a, b) in enumerate(self.sections):
            if a <= self.idx < b:
                self.section = i

    # ------------------------------------------------------------ editing
    @property
    def step(self) -> float:
        return _STEPS[self.step_idx]

    def change_step(self, delta: int) -> None:
        self.step_idx = int(np.clip(self.step_idx + delta, 0, len(_STEPS) - 1))

    @property
    def pose(self) -> np.ndarray:
        return np.array(self.ds.camera_pose[self.idx])

    def move(self, key: str) -> np.ndarray:
        """Apply one keyboard move; returns the new pose (not yet saved)."""
        if key in ("+", "="):
            self.change_step(-1)
            return self.pose
        if key in ("-", "_"):
            self.change_step(+1)
            return self.pose
        if key not in self.KEYMAP:
            return self.pose
        axis, sign = self.KEYMAP[key]
        pose = self.pose
        pose[axis] += sign * self.step
        self._pending = pose
        self.save_pose(pose)
        return pose

    def save_pose(self, pose) -> None:
        """Write the pose to every frame of the current section
        (reference saveCameraPose, render.py:390-412)."""
        a, b = self.sections[self.section]
        for i in range(a, b):
            self.ds.setCameraPose(i, pose)

    def copy_pose_from(self, other_dataset: str, section: int = 0) -> None:
        """Adopt another dataset's camera pose for the current section
        (reference AlignerGUI 'copy pose from other dataset',
        render.py:413-500)."""
        other = Dataset(other_dataset)
        poses = np.asarray(other.camera_pose)
        starts = [0]
        for i in range(1, len(poses)):
            if not np.allclose(poses[i], poses[starts[-1]]):
                starts.append(i)
        section = int(np.clip(section, 0, len(starts) - 1))
        self.save_pose(np.array(poses[starts[section]]))

    def set_pose(self, pose) -> None:
        """Direct numeric pose entry for the current section (reference
        AlignerGUI pose-entry fields, render.py:440-470)."""
        pose = np.asarray(pose, float)
        assert pose.shape == (6,), "camera pose must be 6 values (xyz rpy)"
        self.save_pose(pose)

    def set_zoom(self, zoom: float) -> None:
        self.zoom = float(np.clip(zoom, 1.0, 8.0))

    # ------------------------------------------------------------ display
    def overlay(self, alpha: float = 0.6) -> np.ndarray:
        self.rend.setJointAngles(np.asarray(self.ds.angles[self.idx]))
        self.rend.setCameraPose(self.pose)
        color, _ = self.rend.render()
        img = np.asarray(self.ds.og_img[self.idx], float)
        if color.shape != img.shape:
            import cv2

            color = cv2.resize(color, (img.shape[1], img.shape[0]))
        out = (alpha * img + (1 - alpha) * color).astype(np.uint8)
        if self.zoom > 1.0:
            h, w = out.shape[:2]
            ch, cw = int(h / self.zoom / 2), int(w / self.zoom / 2)
            cy, cx = h // 2, w // 2
            crop = out[cy - ch : cy + ch, cx - cw : cx + cw]
            import cv2

            out = cv2.resize(crop, (w, h), interpolation=cv2.INTER_NEAREST)
        return out

    def run(self) -> None:
        """Interactive matplotlib loop (WASD... keys; arrows change frame)."""
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 7))
        im = ax.imshow(self.overlay()[..., ::-1])
        ax.axis("off")

        def title():
            ax.set_title(
                f"frame {self.idx} section {self.section} step {self.step} "
                f"pose {np.round(self.pose, 3)}"
            )

        title()

        def onkey(event):
            if event.key == "right":
                self.goto(self.idx + 1)
            elif event.key == "left":
                self.goto(self.idx - 1)
            elif event.key in ("pageup", "pagedown"):
                self.goto_section(self.section + (1 if event.key == "pagedown" else -1))
            elif event.key == "[":
                self.set_zoom(self.zoom / 1.5)
            elif event.key == "]":
                self.set_zoom(self.zoom * 1.5)
            elif event.key == "p":
                # Direct pose entry via the launching terminal.
                try:
                    vals = input("pose (x y z r p y): ").split()
                    self.set_pose([float(v) for v in vals])
                except (ValueError, AssertionError) as e:
                    print(f"bad pose: {e}")
            elif event.key == "c":
                try:
                    self.copy_pose_from(input("copy pose from dataset: "))
                except Exception as e:
                    print(f"copy failed: {e}")
            elif event.key == "i":
                try:
                    self.goto(int(input("goto frame: ")))
                except ValueError:
                    pass
            else:
                self.move(event.key or "")
            im.set_data(self.overlay()[..., ::-1])
            title()
            fig.canvas.draw_idle()

        fig.canvas.mpl_connect("key_press_event", onkey)
        plt.show()
