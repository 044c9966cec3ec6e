"""A/B: segmenter input resolution (ds-8 working-res vs finer downsample).

The synthetic training pipeline renders natively at the model's 512-canvas
scale (crisp); the predict path feeds the ds-8 working-res image upsampled
3.2x (blurry) — a train/test resolution mismatch that should hit small
links hardest.  This measures per-link IoU on cluttered full-res scenes
with the model input taken at ds 8 / 4 / 2, all masks compared at a common
working-res (ds 8) grid against exact renderer GT.

Usage: python assets/diag_segres.py [n_frames] [model_id]
"""
import os, sys
os.environ["ROPES3D_ROOT"] = "/root/repo"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp

from ropes3d_tpu.models.inference import Segmenter
from ropes3d_tpu.ops.image import downsample
from ropes3d_tpu.simulation.renderer import Renderer
from ropes3d_tpu.simulation.noise import NoiseMaker
from ropes3d_tpu.robot import URDFReader
from ropes3d_tpu.training.model_registry import ModelManager

cam = [0, -1.5, 0.75, 0, 0, 0]
urdf = URDFReader()
rend = Renderer("real", cam, "1280_720_color")
gt_rend = Renderer("seg", cam, "1280_720_color")
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
    for _ in range(6):
        cy, cx = rng.uniform(0, H), rng.uniform(0, W)
        hh, ww = rng.uniform(30, H / 3), rng.uniform(30, W / 3)
        col = rng.uniform(0, 255, 3)
        z = rng.uniform(0.5, 3.2)
        m = (np.abs(rr - cy) < hh) & (np.abs(cc - cx) < ww) & (z < dep)
        img[m] = col
        dep[m] = z
    return np.clip(img, 0, 255), dep


n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
mid = sys.argv[2] if len(sys.argv) > 2 else None
mm = ModelManager()
ckpt = mm.dynamicLoad(id=mid) if mid else mm.dynamicLoad(dataset="bootstrap")
print("ckpt:", ckpt)
seg = Segmenter(ckpt, ["BG"] + urdf.mesh_names[:6])
names = urdf.mesh_names[:6]
factors = (8, 4, 2)
ious = {f: {nm: [] for nm in names} for f in factors}

for i in range(n):
    pose = rng.uniform(lim[:, 0], lim[:, 1]) * np.array([1, 1, 1, 0, 0, 0])
    rend.setJointAngles(pose)
    color, depth = rend.render()
    img, d = cluttered_scene(np.asarray(color, float), depth)
    img = img.astype(np.uint8)
    d = noise.holes(d)
    gt_rend.setJointAngles(pose)
    gcol, gdep = gt_rend.render()
    gcol = np.asarray(gcol)
    vis = (gdep > 0) & ((d == 0) | (np.abs(gdep - d) < 0.02))  # unoccluded
    # GT per-link at working res (ds 8, nearest).
    gts = {}
    for nm in names:
        m = (gcol[..., 0] == gt_rend.color_dict[nm][0]) & vis
        gts[nm] = m[::8, ::8][:90, :160]
    for f in factors:
        small = np.asarray(downsample(jnp.asarray(img), f)).astype(np.uint8)
        small_d = np.asarray(
            downsample(jnp.asarray(d, jnp.float32)[..., None], f)
        )[..., 0]
        per_link, _ = seg.segment(
            small, small_d if seg.cfg.in_channels == 4 else None
        )
        for nm in names:
            pm = per_link.get(nm, {}).get("mask")
            if pm is None:
                pm = np.zeros(small.shape[:2], bool)
            k = 8 // f
            pm8 = pm[::k, ::k][:90, :160] if k > 1 else pm[:90, :160]
            gt = gts[nm]
            if gt.sum() < 4:
                continue
            u = (gt | pm8).sum()
            ious[f][nm].append((gt & pm8).sum() / u if u else np.nan)
    if (i + 1) % 4 == 0:
        print(f"{i+1}/{n}", flush=True)

print(f"\nper-link mean IoU at working-res grid ({n} cluttered frames):")
print("link      " + "".join(f"   ds{f}" for f in factors))
for nm in names:
    row = "".join(
        f"  {np.nanmean(ious[f][nm]):.3f}" if ious[f][nm] else "    n/a"
        for f in factors
    )
    print(f"{nm:<10}{row}")
alls = {f: np.nanmean(sum((ious[f][nm] for nm in names), [])) for f in factors}
print("MEAN      " + "".join(f"  {alls[f]:.3f}" for f in factors))
