#!/usr/bin/env python
"""Demo GIF generation (reference assets/make_gif.py): a joint-space sweep
rendered to an animated GIF via matplotlib/imageio."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "ROPES3D_ROOT", os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def main(frames: int = 40):
    import imageio.v2 as imageio

    from ropes3d_tpu.simulation.renderer import Renderer

    rend = Renderer("real", [0, -1.5, 0.75, 0, 0, 0], "640_480_color_2")
    t = np.linspace(0, 2 * np.pi, frames, endpoint=False)
    imgs = []
    for ti in t:
        angles = [0.5 * np.sin(ti), 0.3 * np.sin(2 * ti), 0.6 * np.cos(ti), 0, 0.4 * np.sin(ti), 0]
        rend.setJointAngles(angles)
        color, _ = rend.render()
        imgs.append(color[..., ::-1])
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "demo.gif")
    imageio.mimsave(out, imgs, duration=0.08, loop=0)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
