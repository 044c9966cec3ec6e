"""Cluttered-background neural-path e2e harness (see BENCHMARKS.md).

Renders shaded robot poses over procedural clutter + depth noise at
1280x720, predicts via the full segmentation pipeline, reports latency
and per-joint error.  Clutter is z-buffer-composited: every distractor
rectangle carries a real depth, so the depth channel is cluttered (and
can occlude the robot) exactly as the RGB channel is — an RGB-D
segmenter gets no free geometric giveaway.

Usage: python assets/bench_cluttered.py [n_frames] [run|run_real] [topk]
(topk defaults to the Predictor default: staged top-k 4)
"""
import os, sys, time
os.environ["ROPES3D_ROOT"] = "/root/repo"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
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
rng = np.random.default_rng(11)
noise = NoiseMaker(rng)
lim = urdf.joint_limits
H, W = 720, 1280
scenes = ClutteredSceneMaker(H, W, rng)
cluttered_scene = scenes.compose

lane = sys.argv[2] if len(sys.argv) > 2 else "run_real"
topk = int(sys.argv[3]) if len(sys.argv) > 3 else 4
model_id = sys.argv[4] if len(sys.argv) > 4 else None
if model_id:  # pin a specific segmenter (A/B runs); default = dynamicLoad
    from ropes3d_tpu.training.model_registry import ModelManager
    from ropes3d_tpu.models.inference import Segmenter
p = Predictor(cam, 8, do_angles="SLU", base_intrin="1280_720_color",
              model_ds="bootstrap", lookup_topk=topk)
if model_id:
    p.seg = Segmenter(ModelManager().dynamicLoad(id=model_id),
                      class_names=p.classes)
    for a in ("_real_run_key", "_real_prep"):  # drop fused-lane caches
        if hasattr(p, a):
            delattr(p, a)
n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
errs, times, confs = [], [], []
for i in range(n):
    pose = rng.uniform(lim[:, 0], lim[:, 1]) * np.array([1, 1, 1, 0, 0, 0])
    rend.setJointAngles(pose)
    color, depth = rend.render()
    img, d = cluttered_scene(np.asarray(color, float), depth)
    img = img.astype(np.uint8)
    d = noise.holes(d)
    t0 = time.perf_counter()
    est = getattr(p, lane)(img, d)
    dt = 1e3 * (time.perf_counter() - t0)
    times.append(dt)
    errs.append(np.degrees(np.abs(est - pose))[:3])
    c = p.last_confidence
    confs.append(np.nan if c is None else c)
    if (i + 1) % 10 == 0:
        print(f"{i+1}/{n}", flush=True)
errs = np.array(errs)
confs = np.array(confs)
seg_id = os.path.basename(os.path.dirname(getattr(p.seg, "ckpt_path", "?")))
print(f"cluttered real-seg e2e ({seg_id} {lane} topk={topk}):")
print(f"  latency p50 {np.percentile(times[1:], 50):.0f} ms, p90 {np.percentile(times[1:], 90):.0f}")
print(f"  err median {np.median(errs):.3f} deg, p90 {np.percentile(errs, 90):.3f}, max {errs.max():.1f}")
np.save("/tmp/clut_errs.npy", errs)
bad = np.where(errs.max(axis=1) > 2.0)[0]
print(f"  frames with max err > 2 deg: {len(bad)}/{len(errs)} -> "
      + " ".join(f"{i}:{errs[i].max():.0f}" for i in bad))
if np.isfinite(confs).any():
    # Evidence-based confidence gate (Predictor.last_confidence =
    # min(cover, area/A_ref), calibrated threshold CONF_ACCEPT): report
    # separation plus the accepted-set error stats a rejecting caller
    # actually experiences.
    np.save("/tmp/clut_confs.npy", confs)
    good = np.setdiff1d(np.arange(len(errs)), bad)
    thr = Predictor.CONF_ACCEPT
    flagged = np.where(confs < thr)[0]
    caught = np.intersect1d(flagged, bad)
    acc = np.setdiff1d(np.arange(len(errs)), flagged)
    print(f"  confidence: median good {np.nanmedian(confs[good]):.2f}, "
          f"median bad {np.nanmedian(confs[bad]) if len(bad) else float('nan'):.2f}; "
          f"reject@<{thr:.2f} flags {len(flagged)}/{len(errs)} frames, "
          f"catches {len(caught)}/{len(bad)} bad")
    if len(acc):
        ae = errs[acc]
        print(f"  accepted {len(acc)}/{len(errs)}: median {np.median(ae):.3f} deg, "
              f"p90 {np.percentile(ae, 90):.3f}, max {ae.max():.2f}")
seg_t = []
from ropes3d_tpu.ops.image import downsample
import jax.numpy as jnp
for i in range(5):
    img2, d2 = cluttered_scene(np.asarray(color, float), depth)
    small = np.asarray(downsample(jnp.asarray(img2), 8)).astype(np.uint8)
    small_d = np.asarray(downsample(jnp.asarray(d2, jnp.float32)[..., None], 8))[..., 0]
    t0 = time.perf_counter()
    p.seg.segment(small, small_d if p.seg.cfg.in_channels == 4 else None)
    seg_t.append(1e3 * (time.perf_counter() - t0))
print(f"  segmenter inference: {np.median(seg_t):.0f} ms")
