"""Segmenter IoU-vs-latency curve over inference resolution and dtype.

The Mask R-CNN is fully convolutional with config-derived anchors, so
trained weights run at any input size divisible by 64 (models/inference.py
``image_hw_infer``) and in bfloat16 (``infer_bf16``).  This harness
measures what those levers cost in *frame-space* mask quality: GT link
masks come from a paired "seg"-mode render of the SAME 1280x720 cluttered
scenes (occlusion-corrected via the composed depth buffer), so every
inference config is scored against identical pixels — unlike
``eval_segmenter_iou``, whose scene resolution follows ``cfg.image_hw``.

Publishes the curve for BENCHMARKS.md (VERDICT r4 item 5: neural-lane
latency toward the <50 ms north star; reference baseline 0.5-2 s/frame,
GUIDE.md:158).

Usage: python assets/eval_seg_latency.py [n_frames] [model_id]
"""
import os
import sys
import time

os.environ.setdefault("ROPES3D_ROOT", "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.environ["ROPES3D_ROOT"])

import numpy as np


def build_scenes(n: int, seed: int = 123):
    """n cluttered 1280x720 RGB-D frames + per-link occlusion-corrected
    GT masks (dict name -> bool [H, W])."""
    from ropes3d_tpu.robot import URDFReader
    from ropes3d_tpu.simulation.clutter import ClutteredSceneMaker
    from ropes3d_tpu.simulation.noise import NoiseMaker
    from ropes3d_tpu.simulation.renderer import Renderer

    cam = [0, -1.5, 0.75, 0, 0, 0]
    urdf = URDFReader()
    rend = Renderer("real", cam, "1280_720_color")
    seg_rend = Renderer("seg", cam, "1280_720_color")
    rng = np.random.default_rng(seed)
    noise = NoiseMaker(rng)
    scenes = ClutteredSceneMaker(720, 1280, rng)
    lim = urdf.joint_limits
    color_of = seg_rend.color_dict
    frames = []
    for _ in range(n):
        pose = rng.uniform(lim[:, 0], lim[:, 1]) * np.array([1, 1, 1, 0, 0, 0])
        rend.setJointAngles(pose)
        seg_rend.setJointAngles(pose)
        color, depth = rend.render()
        seg_color, _ = seg_rend.render()
        img, d = scenes.compose(np.asarray(color, float), depth)
        visible = (depth > 0) & (d == depth)  # survived z-compositing
        gt = {}
        for name, col in color_of.items():
            m = np.all(np.asarray(seg_color) == np.asarray(col), axis=-1)
            gt[name] = m & visible
        frames.append((img.astype(np.uint8), noise.holes(d), gt))
    return frames


def score(seg, frames, min_gt_area: float = 100.0):
    ious = []
    for img, d, gt in frames:
        per_link, _ = seg.segment(
            img, d if seg.cfg.in_channels == 4 else None
        )
        for name, gm in gt.items():
            if gm.sum() < min_gt_area:
                continue
            pm = per_link.get(name, {}).get(
                "mask", np.zeros_like(gm)
            )
            union = (pm | gm).sum()
            ious.append((pm & gm).sum() / union if union else 1.0)
    return float(np.mean(ious))


def timeit(seg, frames, reps: int = 8):
    """Median segment() wall time, fresh scene per rep (the axon tunnel
    caches identical executions — never time a repeated input)."""
    ts = []
    for i in range(min(reps, len(frames))):
        img, d, _ = frames[i]
        t0 = time.perf_counter()
        seg.segment(img, d if seg.cfg.in_channels == 4 else None)
        ts.append(1e3 * (time.perf_counter() - t0))
    return float(np.median(ts))


def main():
    from ropes3d_tpu.models.inference import Segmenter
    from ropes3d_tpu.robot import URDFReader
    from ropes3d_tpu.training.model_registry import ModelManager

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    model_id = sys.argv[2] if len(sys.argv) > 2 else None
    ckpt = ModelManager().dynamicLoad(id=model_id) if model_id else (
        ModelManager().dynamicLoad()
    )
    classes = ["BG"] + URDFReader().mesh_names[:6]
    print(f"model: {ckpt}; {n} shared cluttered frames", flush=True)
    frames = build_scenes(n)
    configs = [
        ((512, 512), False),
        ((512, 512), True),
        ((448, 448), True),
        ((384, 384), True),
        ((320, 320), True),
    ]
    print(f"{'infer_hw':>10} {'dtype':>6} {'IoU@GT>=100px':>14} {'median ms':>10}")
    for hw, bf16 in configs:
        seg = Segmenter(
            ckpt, classes, image_hw_infer=hw, infer_bf16=bf16
        )
        seg.segment(frames[0][0], frames[0][1])  # compile, untimed
        iou = score(seg, frames)
        ms = timeit(seg, frames)
        print(
            f"{hw[0]:>10} {'bf16' if bf16 else 'fp32':>6} "
            f"{iou:>14.3f} {ms:>10.0f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
