"""Confidence-v3 signal study: per-link explained-fraction vs failure.

diag_conf2 showed ``cover`` (observed seg area / expected area at the
predicted pose) separates evidence-starved frames but misses wrong-basin
frames whose silhouette AREA happens to match (frame 37: 102 deg error,
cover 0.72).  Area ratio ignores WHERE the pixels are.  This pass keeps
the per-link observed masks and the predicted-pose link ids so overlap
signals can be designed offline:

- ``expl``   |seg_sil & render_sil| / |seg_sil| — fraction of observed
             evidence explained by the predicted pose (union level);
- ``lmin``   min over detected links (area >= 32 px) of the per-link
             explained fraction |seg_l & render_l| / |seg_l| — a single
             misplaced link flags the frame even when the big links fit;
- plus diag_conf2's n_links / area / cover.

Usage: python assets/diag_conf3.py [n_frames] [topk]
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
id_rend = Renderer("seg", cam, str(p.intrinsics))  # working-res link ids
rows, dump = [], []
for i in range(n):
    pose = rng.uniform(lim[:, 0], lim[:, 1]) * np.array([1, 1, 1, 0, 0, 0])
    rend.setJointAngles(pose)
    color, depth = rend.render()
    img, d = scenes.compose(np.asarray(color, float), depth)
    img = img.astype(np.uint8)
    d = noise.holes(d)
    est = p.run_real(img, d)
    err = float(np.degrees(np.abs(est - pose))[:3].max())
    small = np.asarray(downsample(jnp.asarray(img), ds)).astype(np.uint8)
    small_d = np.asarray(downsample(jnp.asarray(d, jnp.float32)[..., None], ds))[..., 0]
    per_link, _ = p.seg.segment(small, small_d if p.seg.cfg.in_channels == 4 else None)
    id_rend.setJointAngles(est)
    pred_depth, pred_lid = id_rend.render_ids()
    pred_sil = pred_depth > 0
    seg_masks = {k: v["mask"] for k, v in per_link.items()}
    union = (np.any(list(seg_masks.values()), axis=0)
             if seg_masks else np.zeros_like(pred_sil))
    area = int(union.sum())
    expl = float((union & pred_sil).sum() / max(area, 1))
    lfr = []
    for li, nm in enumerate(p.classes[1:]):
        m = seg_masks.get(nm)
        if m is None or m.sum() < 32:
            continue
        lfr.append(float((m & (pred_lid == li)).sum() / m.sum()))
    lmin = min(lfr) if lfr else 0.0
    exp_area = float(pred_sil.sum())
    cover = area / max(exp_area, 1.0)
    n_links = sum(1 for nm in p.classes[1:]
                  if per_link.get(nm, {}).get("confidence", 0.0) > 0.5
                  and seg_masks.get(nm, np.zeros(1)).sum() >= 16)
    rows.append((err, n_links, area, cover, expl, lmin))
    dump.append((pose, est, {k: np.packbits(v) for k, v in seg_masks.items()},
                 np.asarray(pred_lid, np.int8)))
    print(f"{i:3d} err={err:7.2f} links={n_links} area={area:5d} "
          f"cover={cover:.2f} expl={expl:.2f} lmin={lmin:.2f}", flush=True)
rows = np.array(rows)
np.save("/tmp/conf3_rows.npy", rows)
np.save("/tmp/conf3_dump.npy", np.array(dump, dtype=object), allow_pickle=True)
bad = rows[:, 0] > 2.0
print(f"\nbad frames: {int(bad.sum())}/{n}")
for name, col in [("n_links", 1), ("area", 2), ("cover", 3), ("expl", 4),
                  ("lmin", 5)]:
    g, b = rows[~bad, col], rows[bad, col]
    print(f"  {name}: good median {np.nanmedian(g):.3f} "
          f"(p10 {np.nanpercentile(g, 10):.3f}), "
          f"bad median {np.nanmedian(b):.3f} (p90 {np.nanpercentile(b, 90):.3f})")
