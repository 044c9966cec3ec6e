"""Train bootv4: RGB-D base segmenter with a high-resolution mask head.

Round-4 evidence says the cluttered-IoU ceiling is *mask boundary
resolution*, not clutter rejection: IoU@GT>=400px plateaus at ~0.80-0.87
for every 28x28-mask model (bootv2/bootv3), and inference-time mask
upsampling alone HURTS (models/inference.py docstring).  bootv4 therefore
trains with ``mask_roi_size=28`` (56x56 in-box masks) — the mask head is
fully convolutional, so bootv3's weights transfer verbatim — plus the
``hard_clutter`` pipeline (textured distractors + capsule occluders,
synth_data.py) and a longer schedule.

Reference capability being matched: the COCO-pretrained Mask R-CNN base
(/root/reference/robotpose/training/__init__.py:10-15, train.py:46-50) —
no pretrained weights exist offline, so capability comes from scaled
synthetic pretraining instead.

Usage:  python assets/train_bootv4.py [--steps N] [--resume ckpt_dir]
        python assets/train_bootv4.py --eval-only   # IoU table, no rewrite
"""

import argparse
import json
import os
import sys
from datetime import datetime

os.environ.setdefault("ROPES3D_ROOT", "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.environ["ROPES3D_ROOT"])


def newest_ckpt(model_dir):
    idx = [
        int(f.split("_")[1])
        for f in os.listdir(model_dir)
        if f.startswith("ckpt_") and f.split("_")[1].isdigit()
    ]
    if not idx:
        raise FileNotFoundError(f"no ckpt_NNNN in {model_dir}")
    return os.path.join(model_dir, f"ckpt_{max(idx):04d}")


def register(out_dir: str, final_ckpt: str, steps_done: int, iou_notes: str,
             resumed_from: str) -> None:
    """Write ModelData.json with provenance derived from THIS run's output
    checkpoint (ADVICE round 4: never from argparse defaults)."""
    from ropes3d_tpu.robot import URDFReader
    from ropes3d_tpu.training.model_registry import ModelData, ModelInfo

    urdf = URDFReader()
    md = ModelData(out_dir)
    md.data = {
        "id": "bootv4",
        "dataset": "bootstrap",
        "classes": ["BG"] + urdf.mesh_names[:6],
        "num_classes": 7,
        "epochs_trained": int(os.path.basename(final_ckpt).split("_")[1]),
        "date": datetime.now().strftime("%Y-%m-%d %H:%M:%S"),
        "notes": (
            f"RGB-D base model v4 (ResNet-101 @512, in_channels=4, "
            f"mask_roi_size=28 high-res mask head; transfer-initialised "
            f"from {resumed_from or 'scratch'}, then {steps_done} steps of "
            f"the hard-clutter on-device pipeline: textured + capsule "
            f"distractors, z-buffered depth compositing, depth sensor "
            f"model, camera-distance scale aug 0.62-1.1). {iou_notes} "
            f"Fine-tune on real RGB-D captures via train.py -cont_from "
            f"bootv4."
        ),
    }
    md.write()
    ModelInfo()  # rebuild models.json (prunes to 3 highest-numbered ckpts)


def evaluate(ckpt: str, n: int = 64) -> str:
    from ropes3d_tpu.training.bootstrap import eval_segmenter_iou

    rows = []
    for thr in (0.0, 100.0, 400.0):
        iou = eval_segmenter_iou(ckpt, n=n, cluttered=True, min_gt_area=thr)
        rows.append(f"IoU@GT>={int(thr)}px {iou:.3f}")
        print(f"cluttered {rows[-1]}", flush=True)
    return f"Cluttered held-out (n={n}) " + ", ".join(rows) + "."


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=24000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--resume", default=None,
                    help="ckpt to init from (default: newest bootv3 ckpt)")
    ap.add_argument("--peak-lr", type=float, default=3e-3)
    ap.add_argument("--warmup", type=int, default=300)
    ap.add_argument("--ckpt-every", type=int, default=2000)
    ap.add_argument("--eval-n", type=int, default=64)
    ap.add_argument("--eval-only", action="store_true")
    args = ap.parse_args()

    from ropes3d_tpu.config import Paths
    from ropes3d_tpu.models import MaskRCNNConfig
    from ropes3d_tpu.training.bootstrap import bootstrap_base_model_device

    out_dir = os.path.join(Paths().MODELS, "bootv4")
    if args.eval_only:
        print(evaluate(newest_ckpt(out_dir), n=args.eval_n))
        return

    resume = args.resume or newest_ckpt(os.path.join(Paths().MODELS, "bootv3"))
    cfg = MaskRCNNConfig(
        num_classes=7, depth=101, in_channels=4, mask_roi_size=28
    )
    path = bootstrap_base_model_device(
        num_steps=args.steps,
        batch=args.batch,
        cfg=cfg,
        out_dir=out_dir,
        peak_lr=args.peak_lr,
        warmup_steps=args.warmup,
        dist_range=(0.62, 1.1),
        resume_from=resume,
        ckpt_every=args.ckpt_every,
        pipeline_kwargs={"hard_clutter": True, "num_distractors": 8},
    )
    print("final ckpt:", path, flush=True)
    notes = evaluate(path, n=args.eval_n)
    register(out_dir, path, args.steps, notes, resumed_from=resume)
    print("registered bootv4:", notes)


if __name__ == "__main__":
    main()
