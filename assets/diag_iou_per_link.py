"""Per-link cluttered IoU for registered segmenters (bootv2 vs bootv3).

eval_segmenter_iou reports the pooled mean; this breaks it down per link
and by GT-instance size so the remaining capability gap is attributable
(round-2/3 finding: wrist link_5_b dominates the loss).

Usage: python assets/diag_iou_per_link.py [model_ids...] [--n N]
"""

import os
import sys

os.environ.setdefault("ROPES3D_ROOT", "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.environ["ROPES3D_ROOT"])

import numpy as np


def eval_model(model_id: str, n: int = 32, min_gt_area: float = 100.0):
    import jax

    from ropes3d_tpu.models.inference import Segmenter
    from ropes3d_tpu.robot import URDFReader
    from ropes3d_tpu.training.model_registry import ModelManager
    from ropes3d_tpu.training.synth_data import (
        DeviceSynthPipeline, IMAGENET_MEAN, IMAGENET_STD,
    )

    urdf = URDFReader()
    ckpt = ModelManager().dynamicLoad(id=model_id)
    seg = Segmenter(ckpt, ["BG"] + urdf.mesh_names[:6])
    pipeline = DeviceSynthPipeline(
        seg.cfg, urdf=urdf, base_intrin="1280_720_color", num_distractors=6
    )
    key = jax.random.PRNGKey(123)
    per_link = {name: [] for name in urdf.mesh_names[:6]}
    for i in range(0, n, 4):
        key, sub = jax.random.split(key)
        b = pipeline.batch(sub, 4)
        raw = np.asarray(b["images"])
        imgs = raw[..., :3] * IMAGENET_STD + IMAGENET_MEAN
        deps = None
        if seg.cfg.in_channels == 4:
            from ropes3d_tpu.models.inference import DEPTH_MEAN, DEPTH_STD

            dch = raw[..., 3]
            deps = np.where(dch < -3.0, 0.0, dch * DEPTH_STD + DEPTH_MEAN)
        for j in range(4):
            gt_masks = np.asarray(b["masks"][j]) > 0.5
            gt_cls = np.asarray(b["classes"][j])
            preds, _ = seg.segment(
                np.clip(imgs[j], 0, 255).astype(np.uint8),
                None if deps is None else deps[j],
            )
            for g in range(len(gt_cls)):
                if gt_cls[g] == 0 or gt_masks[g].sum() < min_gt_area:
                    continue
                name = seg.class_names[gt_cls[g]]
                pred = preds.get(name, {}).get(
                    "mask", np.zeros(gt_masks[g].shape, bool)
                )
                union = (gt_masks[g] | pred).sum()
                if union:
                    per_link[name].append(
                        (gt_masks[g] & pred).sum() / union
                    )
    print(f"\n{model_id} (n={n} scenes, GT>={int(min_gt_area)}px):")
    allv = []
    for name, vals in per_link.items():
        if vals:
            allv += vals
            print(f"  {name:12s} IoU {np.mean(vals):.3f}  (n={len(vals)})")
    print(f"  {'MEAN':12s} IoU {np.mean(allv):.3f}")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 32
    if "--n" in sys.argv:
        n = int(sys.argv[sys.argv.index("--n") + 1])
    for mid in (args or ["bootv2", "bootv3"]):
        eval_model(mid, n=n)


if __name__ == "__main__":
    main()
