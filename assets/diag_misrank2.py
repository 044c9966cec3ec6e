"""Replay the cluttered harness; on failing frames, split misrank vs
basin-miss under the ROBUST objective and audit the lookup seeding.

For each frame whose prediction is >2 deg off, report:
  - err_robust(true pose) vs err_robust(predicted pose)  (misrank if
    pred scores better)
  - the top-k lookup seeds' SLU distance from the truth (was the right
    basin ever seeded?)
  - the rank of the lookup-stack entry closest to the truth.

Usage: python assets/diag_misrank2.py [n_frames] [model_id]
"""
import os, sys
os.environ["ROPES3D_ROOT"] = "/root/repo"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, "/root/repo")
import numpy as np

from ropes3d_tpu.prediction.predictor import Predictor
from ropes3d_tpu.simulation.clutter import ClutteredSceneMaker
from ropes3d_tpu.simulation.noise import NoiseMaker
from ropes3d_tpu.simulation.renderer import Renderer
from ropes3d_tpu.robot import URDFReader

cam = [0, -1.5, 0.75, 0, 0, 0]
urdf = URDFReader()
rend = Renderer("real", cam, "1280_720_color")
rng = np.random.default_rng(11)
noise = NoiseMaker(rng)
lim = urdf.joint_limits
H, W = 720, 1280
cluttered_scene = ClutteredSceneMaker(H, W, rng).compose


n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
mid = sys.argv[2] if len(sys.argv) > 2 else "bootv2"
p = Predictor(cam, 8, do_angles="SLU", base_intrin="1280_720_color",
              model_ds="bootstrap", lookup_topk=4)
if mid:
    from ropes3d_tpu.training.model_registry import ModelManager
    from ropes3d_tpu.models.inference import Segmenter
    p.seg = Segmenter(ModelManager().dynamicLoad(id=mid), class_names=p.classes)

look_sqrt = p.lookup_depth
look_ang = np.asarray(p.lookup_angles)
k = 4
n_mis = n_basin = n_noseed = 0
for i in range(n):
    pose = rng.uniform(lim[:, 0], lim[:, 1]) * np.array([1, 1, 1, 0, 0, 0])
    rend.setJointAngles(pose)
    color, depth = rend.render()
    img, d = cluttered_scene(np.asarray(color, float), depth)
    img = img.astype(np.uint8)
    d = noise.holes(d)
    est = p.run(img, d)
    err = np.degrees(np.abs(est - pose))[:3]
    if err.max() <= 2.0:
        continue
    e2 = np.asarray(p.engine.evaluate(
        np.stack([pose, est]).astype(np.float32), p._target, 6
    ))
    # Rank under the metric the recipe actually uses (robust truncated-L1
    # in sqrt domain when robust_tau is set — engine._lookup_err).
    lerr = np.asarray(p.engine._lookup_err(
        p._tgt_lookup_crop, look_sqrt, p.engine._lookup_tau()
    ))
    order = np.argsort(lerr)
    seeds = look_ang[order[:k]]
    sd = np.degrees(np.abs(seeds[:, :3] - pose[None, :3])).max(axis=1)
    # rank of the stack entry closest to the truth
    d_all = np.degrees(np.abs(look_ang[:, :3] - pose[None, :3])).max(axis=1)
    near = np.argmin(d_all)
    rank = int(np.where(order == near)[0][0])
    mis = e2[1] < e2[0]
    n_mis += mis
    n_basin += (not mis) and sd.min() <= 15
    n_noseed += sd.min() > 15
    print(f"f{i:02d} err={err.max():6.1f} errR(true)={e2[0]:7.3f} "
          f"errR(pred)={e2[1]:7.3f} {'MISRANK' if mis else 'basin'} "
          f"seed_dists={np.round(sd, 0)} nearest_stack={d_all[near]:.0f}deg "
          f"rank={rank}")
print(f"\nmisranks={n_mis} basin(seeded)={n_basin} no-good-seed={n_noseed}")
