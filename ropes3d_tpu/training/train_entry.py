"""Segmentation fine-tune entry point.

Parity with the reference ``train.py:29-69`` flow: refresh the train/test
split, derive class names from the renderer color dict, resolve
continue-from checkpoints through ``ModelManager.dynamicLoad``, allocate a
model dir, and run the fine-tune (300 epochs default, augmentation on) —
here as a pjit data-parallel loop over the TPU mesh instead of PixelLib.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from ..config import Paths
from ..data.annotation import refresh_split
from ..data.dataset import Dataset
from ..models import MaskRCNNConfig
from ..parallel.mesh import get_mesh
from .augment import Augmenter
from .data_loader import DetectionDataset
from .model_registry import ModelManager
from .train_loop import Trainer


def train(
    dataset: str,
    batch_size: int = 2,
    cont: bool = False,
    cont_from: Optional[str] = None,
    num_epochs: int = 300,
    depth: int = 101,
    image_hw=(512, 512),
    lr: float = 1e-3,
    use_mesh: bool = True,
    log_every: int = 10,
    tiny: bool = False,
) -> str:
    """Fine-tune the link-segmentation Mask R-CNN on a dataset's annotations.

    Returns the model directory.
    """
    refresh_split(dataset)
    ds = Dataset(dataset)

    from ..simulation.renderer import DatasetRenderer

    rend = DatasetRenderer(dataset)
    classes = ["BG"] + list(rend.color_dict.keys())

    mm = ModelManager()
    resume_ckpt = None
    if cont or cont_from:
        criteria = {"dataset": dataset} if not cont_from else {"id": cont_from}
        resume_ckpt = mm.dynamicLoad(**criteria)
    if resume_ckpt is None and not tiny:
        # Start from the bundled base model, mirroring the reference's
        # COCO-base default (train.py:46; base from training/__init__.py).
        from .bootstrap import resolve_base_model

        resume_ckpt = resolve_base_model()

    anno_dir = os.path.join(ds.link_anno_path, "train")
    if tiny:
        cfg = MaskRCNNConfig.tiny(num_classes=len(classes))
    elif resume_ckpt is not None:
        # Continue-from requires architectural parity: adopt the base
        # checkpoint's own config (depth / image size / head shapes).
        cfg_file = os.path.join(
            os.path.dirname(os.path.abspath(resume_ckpt)), "model_config.json"
        )
        if os.path.isfile(cfg_file):
            with open(cfg_file) as f:
                raw = json.load(f)
            raw["image_hw"] = tuple(raw["image_hw"])
            if "anchor_scales" in raw:
                raw["anchor_scales"] = tuple(raw["anchor_scales"])
            cfg = MaskRCNNConfig(**raw)
        else:
            cfg = MaskRCNNConfig(
                num_classes=len(classes), depth=depth, image_hw=tuple(image_hw)
            )
    else:
        cfg = MaskRCNNConfig(
            num_classes=len(classes), depth=depth, image_hw=tuple(image_hw)
        )
    data = DetectionDataset(
        anno_dir, classes, cfg.image_hw, cfg.max_gt, augment=Augmenter(),
        in_channels=cfg.in_channels,
    )

    model_dir = mm.allocateNew(
        dataset, classes, train_size=len(data), depth=cfg.depth
    )
    with open(os.path.join(model_dir, "model_config.json"), "w") as f:
        json.dump(
            {
                "num_classes": cfg.num_classes,
                "in_channels": cfg.in_channels,
                "depth": cfg.depth,
                "image_hw": list(cfg.image_hw),
                "max_gt": cfg.max_gt,
                "pre_nms_topk": cfg.pre_nms_topk,
                "num_proposals": cfg.num_proposals,
                "roi_size": cfg.roi_size,
                "mask_roi_size": cfg.mask_roi_size,
                "max_detections": cfg.max_detections,
                "anchor_scales": list(cfg.anchor_scales),
            },
            f,
        )

    import jax

    mesh = get_mesh(axes=("data",)) if use_mesh and len(jax.devices()) > 1 else None
    if mesh is not None:
        # Round batch to a multiple of the data axis.
        n = mesh.devices.shape[0]
        batch_size = max(batch_size // n, 1) * n
    trainer = Trainer(cfg, model_dir, mesh=mesh, lr=lr)
    if resume_ckpt:
        trainer.load(resume_ckpt)

    step = 0
    for epoch in range(1, num_epochs + 1):
        for batch in data.batches(batch_size):
            metrics = trainer.train_step(batch)
            step += 1
            if step % log_every == 0:
                print(
                    f"epoch {epoch} step {step}: "
                    + " ".join(f"{k}={float(v):.3f}" for k, v in metrics.items())
                )
        trainer.save(epoch)
        mm.update()  # refresh registry + prune old checkpoints
    return model_dir
