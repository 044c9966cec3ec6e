"""Per-frame confidence-signal study on the cluttered 40-frame harness.

The shipped margin confidence ((e1-e0)/e0 over the two fine-polished
survivors) measured ~0 on every frame: both survivors usually descend
into the SAME basin, so the runner-up is a duplicate, not an
alternative.  This harness records richer per-frame signals on the exact
bench_cluttered scene draw so a replacement can be validated offline:

- ``err``      true max-joint error (deg) — the label;
- ``e0, e1``   fine-target errors of the two polished survivors;
- ``vis``      robot visible fraction (un-occluded silhouette pixels /
               total silhouette pixels, from the composed depth buffer);
- ``margin``   (e1-e0)/e0 (the shipped, broken signal).

Usage: python assets/diag_conf.py [n_frames] [topk]
"""
import os, sys
os.environ["ROPES3D_ROOT"] = "/root/repo"
sys.path.insert(0, "/root/repo")
import numpy as np
from ropes3d_tpu.simulation.renderer import Renderer
from ropes3d_tpu.simulation.clutter import ClutteredSceneMaker
from ropes3d_tpu.simulation.noise import NoiseMaker
from ropes3d_tpu.prediction.predictor import Predictor
from ropes3d_tpu.robot import URDFReader

cam = [0, -1.5, 0.75, 0, 0, 0]
urdf = URDFReader()
rend = Renderer("real", cam, "1280_720_color")
rng = np.random.default_rng(11)  # same draw as bench_cluttered
noise = NoiseMaker(rng)
lim = urdf.joint_limits
scenes = ClutteredSceneMaker(720, 1280, rng)

n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
topk = int(sys.argv[2]) if len(sys.argv) > 2 else 8
p = Predictor(cam, 8, do_angles="SLU", base_intrin="1280_720_color",
              lookup_topk=topk)
rows = []
for i in range(n):
    pose = rng.uniform(lim[:, 0], lim[:, 1]) * np.array([1, 1, 1, 0, 0, 0])
    rend.setJointAngles(pose)
    color, depth = rend.render()
    img, d = scenes.compose(np.asarray(color, float), depth)
    sil = depth > 0
    vis = float(((depth > 0) & (d == depth)).sum() / max(sil.sum(), 1))
    d = noise.holes(d)
    est = p.run_real(img.astype(np.uint8), d)
    err = float(np.degrees(np.abs(est - pose))[:3].max())
    e = p.last_errors
    e0, e1 = (float(e[0]), float(e[1])) if e is not None and len(e) > 1 else (
        float("nan"), float("nan"))
    m = p.last_confidence
    rows.append((err, e0, e1, vis, float("nan") if m is None else m))
    print(f"{i:3d} err={err:7.2f} e0={e0:8.4f} e1={e1:8.4f} vis={vis:.2f} "
          f"margin={rows[-1][4]:.3f}", flush=True)
rows = np.array(rows)
np.save("/tmp/conf_rows.npy", rows)
bad = rows[:, 0] > 2.0
print(f"\nbad frames: {bad.sum()}/{n}")
for name, col in [("e0", 1), ("e1", 2), ("vis", 3), ("margin", 4)]:
    g, b = rows[~bad, col], rows[bad, col]
    print(f"  {name}: good median {np.nanmedian(g):.4f} "
          f"(p90 {np.nanpercentile(g, 90):.4f}), "
          f"bad median {np.nanmedian(b):.4f} (p10 {np.nanpercentile(b, 10):.4f})")
