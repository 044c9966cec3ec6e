"""Per-term error breakdown at the TRUE pose on cluttered harness frames.

Separates the parity error into its three terms (per-link mask xor,
per-link masked-depth, global mean*std) and reports per-link target mask
quality vs the renderer's exact masks, to locate where the cluttered
target prep loses the signal.

Usage: python assets/diag_terms.py [n_frames]
"""
import os, sys
os.environ["ROPES3D_ROOT"] = "/root/repo"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp

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
    for _ in range(6):
        cy, cx = rng.uniform(0, H), rng.uniform(0, W)
        hh, ww = rng.uniform(30, H / 3), rng.uniform(30, W / 3)
        col = rng.uniform(0, 255, 3)
        z = rng.uniform(0.5, 3.2)
        m = (np.abs(rr - cy) < hh) & (np.abs(cc - cx) < ww) & (z < dep)
        img[m] = col
        dep[m] = z
    return np.clip(img, 0, 255), dep


p = Predictor(cam, 8, do_angles="SLU", base_intrin="1280_720_color",
              model_ds="bootstrap", lookup_topk=4)
n = int(sys.argv[1]) if len(sys.argv) > 1 else 6

import jax
render = jax.jit(p.engine._render_fn(6))
w2c = p.engine._w2c

for i in range(n):
    pose = rng.uniform(lim[:, 0], lim[:, 1]) * np.array([1, 1, 1, 0, 0, 0])
    rend.setJointAngles(pose)
    color, depth = rend.render()
    img, d = cluttered_scene(np.asarray(color, float), depth)
    img = img.astype(np.uint8)
    d = noise.holes(d)
    # Production target prep (host path, as run() does it).
    td = p._downsample(np.asarray(d, np.float32), p.ds_factor)
    p._segmentLoad(img, td)
    tgt = p._target
    # True-pose render at working res.
    rd, rl = render(jnp.asarray(pose, jnp.float32)[None], w2c)
    rd, rl = np.asarray(rd[0]), np.asarray(rl[0])

    masks = np.asarray(tgt.masks)          # [6,h,w]
    mdep = np.asarray(tgt.masked_depth)    # [6,h,w]
    tdep = np.asarray(tgt.depth)           # [h,w]
    pres = np.asarray(tgt.present)

    print(f"\n== frame {i}: true-pose term breakdown ==")
    gm = np.abs(tdep - rd)
    gmean = gm[gm != 0].mean() if (gm != 0).any() else 0.0
    print(f" global: mean_nz {gmean:.4f} * std {gm.std():.4f} = {gmean*gm.std():.4f}")
    for li in range(1, 6):
        rm = rl == li
        tm = masks[li]
        inter, union = (rm & tm).sum(), (rm | tm).sum()
        iou = inter / union if union else float("nan")
        xor = (rm != tm).mean() * 5
        ad = np.abs(mdep[li] - rd * rm)
        nz = ad != 0
        dterm = ad[nz].mean() * 10 if nz.any() else 0.0
        # Depth agreement where mask and render AGREE (true support):
        both = rm & tm & (mdep[li] > 0)
        agree = np.abs(mdep[li] - rd)[both]
        # Target-mask pixels whose gated depth is still nonzero but far off render
        print(f" link{li}: present={bool(pres[li])} IoU={iou:.2f} "
              f"xor={xor:.3f} depth_term={dterm:.3f} "
              f"tgt_px={tm.sum():5d} rnd_px={rm.sum():5d} "
              f"agree_med={np.median(agree) if agree.size else float('nan'):.3f}")
