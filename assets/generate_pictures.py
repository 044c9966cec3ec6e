#!/usr/bin/env python
"""Documentation figure generation (reference assets/generate_pictures.py).

Renders the robot in seg/real/depth views at a few poses and writes PNGs
into assets/.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "ROPES3D_ROOT", os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def main():
    import cv2

    from ropes3d_tpu.ops.image import color_array
    from ropes3d_tpu.simulation.renderer import Renderer

    out = os.path.dirname(os.path.abspath(__file__))
    poses = [
        ("zero", [0, 0, 0, 0, 0, 0]),
        ("reach", [0.6, 0.4, 0.8, 0, 0.5, 0]),
        ("tuck", [-0.4, -0.6, 2.0, 0, -1.0, 0]),
    ]
    for mode in ("seg", "real"):
        rend = Renderer(mode, [0, -1.5, 0.75, 0, 0, 0], "640_480_color")
        for name, p in poses:
            rend.setJointAngles(p)
            color, depth = rend.render()
            cv2.imwrite(os.path.join(out, f"{name}_{mode}.png"), color)
            if mode == "seg":
                cv2.imwrite(
                    os.path.join(out, f"{name}_depth.png"), color_array(depth)
                )
    print(f"wrote figures to {out}")


if __name__ == "__main__":
    main()
