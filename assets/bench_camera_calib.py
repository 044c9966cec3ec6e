"""Modeless camera-calibration accuracy harness (see BENCHMARKS.md).

Synthetic structured-background scene; runs the parity recipe plus the
optional truncated-L1 refine pass.  Usage:
  python assets/bench_camera_calib.py [refine_ds_factor]
"""
import os, sys, time
os.environ["ROPES3D_ROOT"] = "/root/repo"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import numpy as np
from ropes3d_tpu.simulation.renderer import Renderer
from ropes3d_tpu.prediction.camera_pose import ModellessCameraPredictor

TRUE_CAM = [0.07, -1.48, 0.82, 0.0, 0.03, -0.04]
BASE_CAM = [0, -1.5, 0.75, 0, 0, 0]
robot_poses = np.array(
    [[0.3, 0.2, 0.5, 0, 0, 0], [0.8, -0.4, 1.2, 0, 0, 0],
     [-0.4, 0.3, 0.9, 0, 0, 0], [1.3, -0.2, 0.3, 0, 0, 0],
     [-0.7, 0.5, 1.8, 0, 0, 0]]
)
rend = Renderer(camera_pose=TRUE_CAM, camera_intrin="1280_720_color")
colors, depths = [], []
H, W = 720, 1280
rr, cc = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
# Structured scene background: slanted wall + floor-ish gradient (the
# depth-only metric is degenerate against a constant background).
bg = 2.0 + 0.8 * rr / H + 0.3 * cc / W
for p in robot_poses:
    rend.setJointAngles(p)
    c, d = rend.render()
    d = d.copy(); d[d == 0] = bg[d == 0]
    colors.append(c); depths.append(d)
colors = np.stack(colors); depths = np.stack(depths)

refine = int(sys.argv[1]) if len(sys.argv) > 1 else None
mp = ModellessCameraPredictor(
    base_pose=BASE_CAM, ds_factor=8, base_intrinsics="1280_720_color",
    refine_ds_factor=refine,
)
t0 = time.perf_counter()
est = mp.run(colors, depths, robot_poses)
dt = time.perf_counter() - t0
err = np.abs(np.asarray(est) - np.array(TRUE_CAM))
print(f"refine={refine}: t={dt:.1f}s trans err cm: {100*err[:3]}, "
      f"rot err deg: {np.degrees(err[3:])}")
print("max trans err:", 100 * err[:3].max(), "cm")
