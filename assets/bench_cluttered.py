"""Cluttered-background neural-path e2e harness (see BENCHMARKS.md).

Renders shaded robot poses over procedural clutter + depth noise at
1280x720, predicts via the full segmentation pipeline, reports latency
and per-joint error.  Usage: python assets/bench_cluttered.py
"""
import os, time
os.environ["ROPES3D_ROOT"] = "/root/repo"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import numpy as np
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

def cluttered_bg():
    img = (np.ones((H, W, 3)) * rng.uniform(0, 255, 3)
           + (cc / W * rng.uniform(-80, 80))[..., None]
           + (rr / H * rng.uniform(-80, 80))[..., None]
           + rng.normal(0, 25, (H, W, 3)))
    for _ in range(6):
        cy, cx = rng.uniform(0, H), rng.uniform(0, W)
        hh, ww = rng.uniform(30, H/3), rng.uniform(30, W/3)
        col = rng.uniform(0, 255, 3)
        m = (np.abs(rr - cy) < hh) & (np.abs(cc - cx) < ww)
        img[m] = col
    return np.clip(img, 0, 255)

p = Predictor(cam, 8, do_angles="SLU", base_intrin="1280_720_color",
              model_ds="bootstrap", lookup_topk=1)
n = 40
errs, times = [], []
for i in range(n):
    pose = rng.uniform(lim[:, 0], lim[:, 1]) * np.array([1, 1, 1, 0, 0, 0])
    rend.setJointAngles(pose)
    color, depth = rend.render()
    color = np.asarray(color, float)
    bg = cluttered_bg()
    mask = depth > 0
    img = np.where(mask[..., None], color, bg).astype(np.uint8)
    d = noise.holes(depth)
    t0 = time.perf_counter()
    est = p.run_real(img, d)
    dt = 1e3 * (time.perf_counter() - t0)
    times.append(dt)
    errs.append(np.degrees(np.abs(est - pose))[:3])
    if (i + 1) % 10 == 0:
        print(f"{i+1}/{n}", flush=True)
errs = np.array(errs)
print("cluttered real-seg e2e (bootv2):")
print(f"  latency p50 {np.percentile(times[1:], 50):.0f} ms, p90 {np.percentile(times[1:], 90):.0f}")
print(f"  err median {np.median(errs):.3f} deg, p90 {np.percentile(errs, 90):.3f}, max {errs.max():.1f}")
seg_t = []
import jax
for i in range(5):
    img2 = np.where(mask[..., None], color, cluttered_bg()).astype(np.uint8)
    from ropes3d_tpu.ops.image import downsample
    import jax.numpy as jnp
    small = np.asarray(downsample(jnp.asarray(img2), 8)).astype(np.uint8)
    t0 = time.perf_counter()
    p.seg.segment(small)
    seg_t.append(1e3 * (time.perf_counter() - t0))
print(f"  segmenter inference: {np.median(seg_t):.0f} ms")
