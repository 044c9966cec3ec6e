"""Live prediction loop (reference ``predict_live.py:96-183``).

Busy-polls the robot's reported ``joint_states`` through JSONCoupling,
captures RGBD frames, predicts, and gauges the TCP deviation between the
claimed and predicted pose.  A ``--feed dataset:<name>`` option replays a
recorded dataset instead of requiring RealSense hardware.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

RAD_DEVIATION_WARN = 0.1
RAD_DEVIATION_ALARM = 0.2


class StateWindow:
    """At-a-glance red/green deviation indicator (reference
    predict_live.py:91-93, 149-156: a color-flipping window + per-joint
    deviation gauge).  Uses matplotlib when a display exists; otherwise
    falls back to an ANSI terminal block so the capability works over SSH.
    """

    _COLORS = {"ok": "#2e7d32", "WARN": "#f9a825", "ALARM": "#c62828"}
    _ANSI = {"ok": "\033[42m", "WARN": "\033[43m", "ALARM": "\033[41m"}

    def __init__(self, use_gui: bool = None):
        import os

        if use_gui is None:
            use_gui = bool(os.environ.get("DISPLAY"))
        self.gui = None
        if use_gui:
            try:
                import matplotlib

                matplotlib.use("TkAgg")
                import matplotlib.pyplot as plt

                plt.ion()
                self.fig, self.ax = plt.subplots(figsize=(4, 2))
                self.ax.axis("off")
                self.txt = self.ax.text(
                    0.5, 0.5, "", ha="center", va="center", fontsize=22,
                    transform=self.ax.transAxes,
                )
                self.gui = plt
            except Exception:
                self.gui = None

    def update(self, state: str, dev: "np.ndarray", tcp_mm: float) -> None:
        label = f"{state.upper()}  tcp {tcp_mm:.0f} mm  max {dev.max():.3f} rad"
        if self.gui is not None:
            self.fig.set_facecolor(self._COLORS[state])
            self.txt.set_text(label)
            self.fig.canvas.draw_idle()
            self.fig.canvas.flush_events()
        else:
            print(f"{self._ANSI[state]}  {label}  \033[0m")

    def close(self) -> None:
        if self.gui is not None:
            self.gui.close(self.fig)


class Live:
    def __init__(
        self,
        base_intrin: str = "1280_720_color",
        model_ds: str = "set91",
        do_angles: str = "SLU",
        ds_factor: int = 8,
        feed: str = None,
        coupling_path: str = None,
        camera_pose=None,
        preview: bool = False,
        save_video: str = None,
    ):
        from ..config import DEFAULT_CAMERA_POSE
        from ..prediction.coupling import JSONCoupling
        from ..prediction.feed import DatasetFeed, LiveCamera
        from ..prediction.predictor import Predictor
        from ..prediction.analysis import JointDistance

        self.use_dataset = feed is not None and feed.startswith("dataset:")
        if self.use_dataset:
            self.cam = DatasetFeed(feed.split(":", 1)[1])
            ds = self.cam.ds
            camera_pose = camera_pose if camera_pose is not None else ds.camera_pose[0]
            base_intrin = ds.attrs["color_intrinsics"]
        else:
            self.cam = LiveCamera()
            camera_pose = camera_pose if camera_pose is not None else DEFAULT_CAMERA_POSE
        self.link = None if self.use_dataset else JSONCoupling(coupling_path)
        self.pred = Predictor(
            camera_pose=np.asarray(camera_pose),
            ds_factor=ds_factor,
            do_angles=do_angles,
            base_intrin=base_intrin,
            model_ds=model_ds,
            preview=preview or save_video is not None,
            save_to=save_video,
        )
        self.dist = JointDistance()
        self.preds = []
        self.state_window = StateWindow()

    def run(self, max_frames: int = None) -> None:
        self.cam.start()
        n = 0
        try:
            while max_frames is None or n < max_frames:
                if self.link is not None:
                    claimed = np.array(self.link.get_pose())
                color, depth = self.cam.get()
                if self.use_dataset:
                    claimed = self.cam.angles
                predicted = self.pred.run(color, depth)
                if self.link is not None:
                    self.link.reset()
                dev = np.abs(predicted - claimed)
                tcp_mm = float(self.dist.single(predicted, claimed)) * 1000
                state = (
                    "ALARM" if np.any(dev > RAD_DEVIATION_ALARM)
                    else "WARN" if np.any(dev > RAD_DEVIATION_WARN)
                    else "ok"
                )
                print(
                    f"[{state}] pred={np.round(predicted, 3)} "
                    f"claimed={np.round(claimed, 3)} tcp={tcp_mm:.1f}mm"
                )
                self.state_window.update(state, dev, tcp_mm)
                self.preds.append([claimed, predicted])
                np.save("live_preds.npy", np.array(self.preds).transpose(1, 0, 2))
                n += 1
        finally:
            self.cam.stop()
            self.state_window.close()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-intrin", default="1280_720_color")
    p.add_argument("-model_ds", default="set91")
    p.add_argument("-angs", default="SLU")
    p.add_argument("-ds_factor", type=int, default=8)
    p.add_argument("-feed", default=None, help="e.g. dataset:<name> to replay")
    p.add_argument("-frames", type=int, default=None)
    p.add_argument(
        "-preview", action="store_true",
        help="live ProjectionViz composite (input blend / detected links / "
        "render / depth diff; reference predict.py:517-603)",
    )
    p.add_argument(
        "-save_video", default=None,
        help="write the ProjectionViz composite to this AVI path",
    )
    a = p.parse_args()
    Live(
        a.intrin, a.model_ds, a.angs, a.ds_factor, a.feed,
        preview=a.preview, save_video=a.save_video,
    ).run(a.frames)


if __name__ == "__main__":
    main()
