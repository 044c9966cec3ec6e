"""Train bootv3: the RGB-D base segmenter (ResNet-101 @512, in_channels=4).

bootv2's remaining cluttered-scene gap (IoU 0.78 all-GT, wrist link weak)
is a *visual* ambiguity: flat-tinted robot links vs flat-colored clutter.
The depth channel resolves it geometrically — the synthetic pipeline
z-buffer-composites every scene element at a real distance
(synth_data.DeviceSynthPipeline._compose_one), and the channel carries a
full sensor model (distance noise, speckle/edge holes, quantisation, 8%
full-channel dropout so RGB-only inputs still work).  Same architecture
and schedule as bootv2 otherwise, with camera-distance scale augmentation
(0.62-1.1) active the whole run.

Usage:  python assets/train_bootv3.py [--steps N] [--resume ckpt_dir]
        python assets/train_bootv3.py --eval-only   # IoU table for newest ckpt

Transfer recipe (preferred — the reference's COCO-transfer pattern,
robotpose/training/__init__.py:10-15, applied to our own base): init from
bootv2's RGB weights with the stem conv zero-padded to 4 channels
(assets/init_bootv3_from_bootv2.py), then a short RGB-D fine-tune:
    python assets/init_bootv3_from_bootv2.py
    python assets/train_bootv3.py --resume models/bootv3/ckpt_0000 \
        --steps 6000 --peak-lr 2e-3
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

import numpy as np


def register(out_dir: str, steps_done: int, iou_notes: str,
             transfer: bool = False) -> None:
    """Write bootv3's per-dir ModelData.json and refresh models.json.

    ModelData.json is the canonical registry source — ModelInfo.update()
    rebuilds models.json from the per-model files and DROPS any directory
    without one, so writing models.json alone is not a registration."""
    from ropes3d_tpu.robot import URDFReader
    from ropes3d_tpu.training.model_registry import ModelData, ModelInfo

    urdf = URDFReader()
    md = ModelData(out_dir)
    md.data = {
        "id": "bootv3",
        "dataset": "bootstrap",
        "classes": ["BG"] + urdf.mesh_names[:6],
        "num_classes": 7,
        "epochs_trained": max(1, steps_done // 2000),
        "date": datetime.now().strftime("%Y-%m-%d %H:%M:%S"),
        "notes": (
            f"RGB-D synthetic-pretrained base model v3 (ResNet-101 @512, "
            f"in_channels=4, "
            + (
                f"transfer-initialised from bootv2's RGB weights with a "
                f"zero-padded depth stem, then {steps_done} RGB-D fine-tune "
                f"steps"
                if transfer
                else f"{steps_done} steps"
            )
            + f" on-device domain-randomized "
            f"pipeline with z-buffered depth compositing + depth sensor "
            f"model, camera-distance scale aug 0.62-1.1). {iou_notes} "
            f"Fine-tune on real RGB-D captures via train.py -cont_from bootv3."
        ),
    }
    md.write()
    ModelInfo()  # rebuild models.json (prunes old ckpts too)


def evaluate(out_dir: str, ckpt: str = None) -> str:
    """IoU table for ``ckpt`` (default: highest-numbered ckpt in out_dir)."""
    from ropes3d_tpu.training.bootstrap import eval_segmenter_iou

    if ckpt is None:
        ckpts = sorted(
            f for f in os.listdir(out_dir) if f.startswith("ckpt_")
        )
        ckpt = os.path.join(out_dir, ckpts[-1])
    rows = []
    for thr in (0.0, 100.0, 400.0):
        iou = eval_segmenter_iou(ckpt, n=32, cluttered=True, min_gt_area=thr)
        rows.append(f"IoU@GT>={int(thr)}px {iou:.3f}")
        print(f"cluttered {rows[-1]}", flush=True)
    return "Cluttered held-out " + ", ".join(rows) + "."


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=14000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--peak-lr", type=float, default=8e-3)
    ap.add_argument("--warmup", type=int, default=300)
    ap.add_argument("--ckpt-every", type=int, default=2000)
    ap.add_argument("--eval-only", action="store_true")
    args = ap.parse_args()

    from ropes3d_tpu.config import Paths
    from ropes3d_tpu.models import MaskRCNNConfig
    from ropes3d_tpu.training.bootstrap import bootstrap_base_model_device

    out_dir = os.path.join(Paths().MODELS, "bootv3")
    if args.eval_only:
        # Print-only: re-registering here would rewrite ModelData notes
        # with argparse defaults (wrong provenance — ADVICE round 4).
        print(evaluate(out_dir))
        return

    cfg = MaskRCNNConfig(num_classes=7, depth=101, in_channels=4)
    path = bootstrap_base_model_device(
        num_steps=args.steps,
        batch=args.batch,
        cfg=cfg,
        out_dir=out_dir,
        peak_lr=args.peak_lr,
        warmup_steps=args.warmup,
        dist_range=(0.62, 1.1),
        resume_from=args.resume,
        ckpt_every=args.ckpt_every,
    )
    print("final ckpt:", path, flush=True)
    # Evaluate/register THIS run's final checkpoint, not whatever sorts
    # last in the directory (ADVICE round 4: stale scratch ckpts used to
    # outsort a resumed fine-tune's output).
    notes = evaluate(out_dir, ckpt=path)
    register(out_dir, args.steps, notes, transfer=bool(args.resume))
    print("registered bootv3:", notes)


if __name__ == "__main__":
    main()
