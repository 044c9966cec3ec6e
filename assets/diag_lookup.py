"""Audit the lookup metric variants on failing cluttered frames.

For each harness frame, prep the target (segmentation path only — no
search), then rank the lookup stack under (a) the parity mean*std metric,
(b) robust truncated-L1, (c) robust truncated-L1 scored only where the
TARGET has data (tests the hide-the-links bias hypothesis: with partial
detections a full stack render pays tau per undetected-link pixel,
favoring self-occluding poses).  Reports the rank of the stack entry
nearest the true pose under each.

Usage: python assets/diag_lookup.py [n_frames]
"""
import os, sys
os.environ["ROPES3D_ROOT"] = "/root/repo"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp

from ropes3d_tpu.ops.error import mean_abs_std
from ropes3d_tpu.prediction.predictor import Predictor
from ropes3d_tpu.simulation.noise import NoiseMaker
from ropes3d_tpu.simulation.renderer import Renderer
from ropes3d_tpu.robot import URDFReader
from ropes3d_tpu.training.model_registry import ModelManager
from ropes3d_tpu.models.inference import Segmenter

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


n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
p = Predictor(cam, 8, do_angles="SLU", base_intrin="1280_720_color",
              model_ds="bootstrap", lookup_topk=4)
p.seg = Segmenter(ModelManager().dynamicLoad(id="bootv2"),
                  class_names=p.classes)

stack = jnp.asarray(p.lookup_depth, jnp.float32)  # [N, ch, cw] sqrt
ang = np.asarray(p.lookup_angles)
TAU = 0.04

def ranks(tgt_raw):
    t = jnp.sqrt(jnp.maximum(tgt_raw.astype(jnp.float32), 0.0))
    # (a) parity
    m, s = mean_abs_std(tgt_raw[None] - stack)
    ea = np.asarray(m * s)
    # (b) robust truncated-L1
    d = jnp.abs(t[None] - stack)
    eb = np.asarray(jnp.sum(jnp.minimum(d, TAU), axis=(1, 2)))
    # (c) target-support-only truncated-L1, normalized by support
    sup = (t > 0).astype(jnp.float32)
    ec = np.asarray(
        jnp.sum(jnp.minimum(d, TAU) * sup[None], axis=(1, 2))
        / jnp.maximum(jnp.sum(sup), 1.0)
    )
    return ea, eb, ec


hdr = False
for i in range(n):
    pose = rng.uniform(lim[:, 0], lim[:, 1]) * np.array([1, 1, 1, 0, 0, 0])
    rend.setJointAngles(pose)
    color, depth = rend.render()
    img, d = cluttered_scene(np.asarray(color, float), depth)
    img = img.astype(np.uint8)
    d = noise.holes(d)
    td = p._downsample(np.asarray(d, np.float32), p.ds_factor)
    p._segmentLoad(img, td)
    tgt = p._tgt_lookup_crop
    d_all = np.degrees(np.abs(ang[:, :3] - pose[None, :3])).max(axis=1)
    near = int(np.argmin(d_all))
    ea, eb, ec = ranks(tgt)
    out = []
    for e in (ea, eb, ec):
        order = np.argsort(e)
        rk = int(np.where(order == near)[0][0])
        top_d = np.degrees(
            np.abs(ang[order[:4], :3] - pose[None, :3])
        ).max(axis=1).min()
        out.append((rk, top_d))
    if not hdr:
        print("frame  nearest | parity rank/best4   robust rank/best4   "
              "support rank/best4")
        hdr = True
    print(f"f{i:02d}  {d_all[near]:4.1f}deg |"
          + "".join(f"   {rk:5d} / {bd:5.1f}deg" for rk, bd in out),
          flush=True)
