"""Confidence-v2 signal study: segmenter-output quality vs frame failure.

diag_conf.py showed the catastrophic cluttered frames are NOT ambiguous
basins (margin ~0 everywhere) and NOT poor fits (bad frames' fine errors
are *lower* than good frames'): they are evidence failures — the clutter
occludes the robot and/or the segmenter misses links, so the search
happily fits a wrong pose to the few pixels that remain.  The usable
inference-time signals are therefore properties of the segmentation
itself plus expected-vs-observed coverage:

- ``n_links``  links detected (score > 0.5, area >= 16 px @ working res);
- ``area``     union silhouette area of all detected masks (working res);
- ``cover``    area / expected-area, expected = silhouette of the robot
               rendered at the PREDICTED pose (same camera) — "how much
               of the robot the evidence actually showed";
- ``smin``     lowest per-link detection score among the 6 links (missing
               link -> 0);
- ``margin``   fine re-rank margin (kept for completeness).

Usage: python assets/diag_conf2.py [n_frames] [topk]
"""
import os, sys
os.environ["ROPES3D_ROOT"] = "/root/repo"
sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp
from ropes3d_tpu.simulation.renderer import Renderer
from ropes3d_tpu.simulation.clutter import ClutteredSceneMaker
from ropes3d_tpu.simulation.noise import NoiseMaker
from ropes3d_tpu.prediction.predictor import Predictor
from ropes3d_tpu.ops.image import downsample
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
              model_ds="bootstrap", lookup_topk=topk)
ds = 8
rows = []
for i in range(n):
    pose = rng.uniform(lim[:, 0], lim[:, 1]) * np.array([1, 1, 1, 0, 0, 0])
    rend.setJointAngles(pose)
    color, depth = rend.render()
    img, d = scenes.compose(np.asarray(color, float), depth)
    img = img.astype(np.uint8)
    d = noise.holes(d)
    est = p.run_real(img, d)
    err = float(np.degrees(np.abs(est - pose))[:3].max())
    m = p.last_confidence
    # Segmenter-output quality at the predictor's working resolution.
    small = np.asarray(downsample(jnp.asarray(img), ds)).astype(np.uint8)
    small_d = np.asarray(downsample(jnp.asarray(d, jnp.float32)[..., None], ds))[..., 0]
    per_link, _ = p.seg.segment(small, small_d if p.seg.cfg.in_channels == 4 else None)
    areas = {k: int(v["mask"].sum()) for k, v in per_link.items()}
    scores = [per_link.get(nm, {}).get("confidence", 0.0)
              for nm in p.classes[1:]]
    n_links = sum(1 for nm in p.classes[1:]
                  if per_link.get(nm, {}).get("confidence", 0.0) > 0.5
                  and areas.get(nm, 0) >= 16)
    area = int(np.any([v["mask"] for v in per_link.values()], axis=0).sum()) \
        if per_link else 0
    # Expected silhouette at the predicted pose (full res / 64 ~ working).
    rend.setJointAngles(est)
    _, exp_depth = rend.render()
    exp_area = float((exp_depth > 0).sum()) / (ds * ds)
    cover = area / max(exp_area, 1.0)
    rows.append((err, n_links, area, cover, min(scores),
                 float("nan") if m is None else m))
    print(f"{i:3d} err={err:7.2f} links={n_links} area={area:5d} "
          f"cover={cover:.2f} smin={min(scores):.2f} margin={rows[-1][5]:.3f}",
          flush=True)
rows = np.array(rows)
np.save("/tmp/conf2_rows.npy", rows)
bad = rows[:, 0] > 2.0
print(f"\nbad frames: {int(bad.sum())}/{n}")
for name, col in [("n_links", 1), ("area", 2), ("cover", 3), ("smin", 4),
                  ("margin", 5)]:
    g, b = rows[~bad, col], rows[bad, col]
    print(f"  {name}: good median {np.nanmedian(g):.3f} "
          f"(p10 {np.nanpercentile(g, 10):.3f}), "
          f"bad median {np.nanmedian(b):.3f} (p90 {np.nanpercentile(b, 90):.3f})")
