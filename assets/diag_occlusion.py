"""Diagnostic: does the cluttered-scene error formula misrank the TRUE pose?

For each cluttered harness frame, prep the target through the production
path (segmentation + depth gates), then evaluate the parity error at (a)
the ground-truth pose and (b) the pose the predictor returned.  If
err(true) > err(pred) on the failing frames, the formula is repelled by
occlusion/clutter (the search "won" with a wrong pose that scores
better); if err(true) < err(pred), the staged search failed to reach the
basin and seeding/descent is the problem.

Usage: python assets/diag_occlusion.py [n_frames]
"""
import os, sys
os.environ["ROPES3D_ROOT"] = "/root/repo"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, "/root/repo")
import numpy as np

sys.argv = [sys.argv[0]]  # keep bench harness defaults
import importlib.util as _ilu
spec = _ilu.spec_from_file_location(
    "clut", os.path.join(os.path.dirname(__file__), "bench_cluttered.py")
)

# Re-create the harness scene generator inline (same RNG seed + params).
from ropes3d_tpu.simulation.renderer import Renderer
from ropes3d_tpu.simulation.noise import NoiseMaker
from ropes3d_tpu.prediction.predictor import Predictor
from ropes3d_tpu.robot import URDFReader

cam = [0, -1.5, 0.75, 0, 0, 0]
urdf = URDFReader()
rend = Renderer("real", cam, "1280_720_color")
rng = np.random.default_rng(11)
noise = NoiseMaker(rng)
lim = urdf.joint_limits
H, W = 720, 1280
rr, cc = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")


def cluttered_scene(robot_color, robot_depth):
    img = (np.ones((H, W, 3)) * rng.uniform(0, 255, 3)
           + (cc / W * rng.uniform(-80, 80))[..., None]
           + (rr / H * rng.uniform(-80, 80))[..., None]
           + rng.normal(0, 25, (H, W, 3)))
    dep = (rng.uniform(3.2, 5.0)
           + (rr / H) * rng.uniform(-0.8, 0.8)
           + (cc / W) * rng.uniform(-0.8, 0.8))
    rob = (robot_depth > 0) & (robot_depth < dep)
    img[rob] = robot_color[rob]
    dep = np.where(rob, robot_depth, dep)
    occl_frac = 0.0
    for _ in range(6):
        cy, cx = rng.uniform(0, H), rng.uniform(0, W)
        hh, ww = rng.uniform(30, H / 3), rng.uniform(30, W / 3)
        col = rng.uniform(0, 255, 3)
        z = rng.uniform(0.5, 3.2)
        m = (np.abs(rr - cy) < hh) & (np.abs(cc - cx) < ww) & (z < dep)
        img[m] = col
        occl = m & rob
        occl_frac += occl.sum()
        dep[m] = z
    occl_frac /= max(rob.sum(), 1)
    return np.clip(img, 0, 255), dep, occl_frac


p = Predictor(cam, 8, do_angles="SLU", base_intrin="1280_720_color",
              model_ds="bootstrap", lookup_topk=4)
n = int(sys.argv[1]) if len(sys.argv) > 1 else 16

print("frame occl%  err_true err_pred  misrank  pred_err_deg")
mis, tot = 0, 0
for i in range(n):
    pose = rng.uniform(lim[:, 0], lim[:, 1]) * np.array([1, 1, 1, 0, 0, 0])
    rend.setJointAngles(pose)
    color, depth = rend.render()
    img, d, occl = cluttered_scene(np.asarray(color, float), depth)
    img = img.astype(np.uint8)
    d = noise.holes(d)
    est = p.run(img, d)
    # Target is now prepped inside the predictor; evaluate both poses.
    tgt = p._target
    errs = p.engine.evaluate(
        np.stack([pose, np.asarray(est)]).astype(np.float32), tgt, 6
    )
    e_true, e_pred = float(errs[0]), float(errs[1])
    deg = np.degrees(np.abs(np.asarray(est) - pose))[:3].max()
    bad = e_true > e_pred and deg > 2.0
    mis += bad
    tot += deg > 2.0
    print(f"{i:3d} {100*occl:5.1f}%  {e_true:8.4f} {e_pred:8.4f}  "
          f"{'MISRANK' if bad else ('  basin' if deg > 2.0 else '     ok')}"
          f"  {deg:7.2f}")
print(f"\nframes with >2 deg error: {tot}; formula-misranked: {mis}")
