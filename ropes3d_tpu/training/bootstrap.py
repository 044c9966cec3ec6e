"""Base-model bootstrap via synthetic pretraining.

The reference downloads PixelLib's COCO-pretrained Mask R-CNN as the
fine-tune base (``robotpose/training/__init__.py:10-15``).  The TPU-native
replacement needs no download: the renderer *is* a labeled-data generator,
so the base model is pretrained on synthetic robot renders with randomized
camera poses, joint angles, lighting-free seg masks, and depth-hole-style
appearance noise.  Fine-tuning on real annotated captures then proceeds
exactly like the reference flow.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from ..config import DEFAULT_CAMERA_POSE, Paths
from ..models import MaskRCNNConfig
from ..robot import URDFReader
from .train_loop import Trainer


def synth_detection_batch(
    renderer,
    urdf: URDFReader,
    cfg: MaskRCNNConfig,
    batch: int,
    rng: np.random.Generator,
    camera_jitter: float = 0.15,
):
    """Render a batch of random poses into padded detection targets."""
    from ..models.inference import IMAGENET_MEAN, IMAGENET_STD

    h, w = cfg.image_hw
    lim = urdf.joint_limits
    images = np.zeros((batch, h, w, 3), np.float32)
    boxes = np.zeros((batch, cfg.max_gt, 4), np.float32)
    classes = np.zeros((batch, cfg.max_gt), np.int32)
    masks = np.zeros((batch, cfg.max_gt, h, w), np.float32)
    base_cam = np.array(DEFAULT_CAMERA_POSE, float)

    for b in range(batch):
        cam = base_cam + rng.uniform(-camera_jitter, camera_jitter, 6)
        renderer.setCameraPose(cam)
        angles = rng.uniform(lim[:, 0], lim[:, 1])
        depth, lid = renderer.render_batch_angles(angles[None])
        lid = np.asarray(lid[0])
        rh, rw = lid.shape
        # Letterbox into the model frame.
        import cv2

        scale = min(h / rh, w / rw)
        nh, nw = int(rh * scale), int(rw * scale)
        pal = renderer.palette
        hit = lid >= 0
        # Random background (solid color + gradient + speckle) so the model
        # learns robot-vs-scene rejection, not black-background shortcuts.
        bg = np.ones((rh, rw, 3), float) * rng.uniform(0, 255, 3)
        gx = np.linspace(0, rng.uniform(-80, 80), rw)[None, :, None]
        gy = np.linspace(0, rng.uniform(-80, 80), rh)[:, None, None]
        bg = bg + gx + gy + rng.normal(0, 25, bg.shape)
        color = bg
        color[hit] = pal[lid[hit]]
        # Appearance noise + occasional blur so the base model doesn't
        # overfit exact flat colors.
        img = color + rng.normal(0, 20, color.shape)
        img = np.clip(img, 0, 255).astype(np.uint8)
        if rng.random() < 0.3:
            k = int(rng.integers(1, 3)) * 2 + 1
            img = cv2.GaussianBlur(img, (k, k), 0)
        img_r = cv2.resize(img, (nw, nh))
        canvas = np.zeros((h, w, 3), np.float32)
        canvas[:nh, :nw] = img_r
        images[b] = (canvas - IMAGENET_MEAN) / IMAGENET_STD

        g = 0
        for li in range(min(6, renderer.num_links)):
            if g >= cfg.max_gt:
                break
            m = (lid == li).astype(np.float32)
            if m.sum() < 4:
                continue
            mr = cv2.resize(m, (nw, nh))
            full = np.zeros((h, w), np.float32)
            full[:nh, :nw] = mr
            ys, xs = np.where(full > 0.5)
            if len(ys) == 0:
                continue
            boxes[b, g] = [ys.min(), xs.min(), ys.max() + 1, xs.max() + 1]
            classes[b, g] = li + 1  # class 0 = BG
            masks[b, g] = full
            g += 1
    return {"images": images, "boxes": boxes, "classes": classes, "masks": masks}


def _write_metrics(out_dir: str, step: int, metrics) -> None:
    """Persist the last train-step losses next to the checkpoints.

    Observable training state (the reference's equivalent signal is the
    Keras progress line): monitors tail ``metrics.json`` instead of parsing
    stdout, and the test suite's loss-sanity check reads it — a NaN/inf
    loss fails the default lane even though the long training runs
    themselves live in the slow lane."""
    import json

    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(
            {"step": int(step),
             **{k: float(v) for k, v in dict(metrics).items()}},
            f,
        )


def set_base_model(ckpt_path: str) -> None:
    """Atomically point ``Paths().BASE_MODEL`` at a checkpoint directory.

    The link is *relative* so it survives clone relocation (the round-1
    absolute symlink dangled on fresh clones).  Replaces the reference's
    downloaded ``mask_rcnn_coco.h5`` base artifact
    (robotpose/training/__init__.py:10-15).
    """
    base = Paths().BASE_MODEL
    os.makedirs(os.path.dirname(base), exist_ok=True)
    rel = os.path.relpath(os.path.abspath(ckpt_path), os.path.dirname(base))
    tmp = base + ".tmp"
    if os.path.lexists(tmp):
        os.remove(tmp)
    os.symlink(rel, tmp)
    os.replace(tmp, base)


def resolve_base_model() -> Optional[str]:
    """Resolve the base segmentation checkpoint for fine-tuning.

    Order: a valid ``Paths().BASE_MODEL`` link/dir; else the newest
    checkpoint of the bundled ``models/boot`` model; else None.  Never
    raises — callers decide whether a missing base is fatal (the reference
    downloads its base lazily, training/__init__.py:10-15).
    """
    base = Paths().BASE_MODEL
    if os.path.isdir(base):  # follows symlinks; dangling links fail this
        return os.path.realpath(base)
    boot = os.path.join(Paths().MODELS, "boot")
    if os.path.isdir(boot):
        epochs = sorted(
            int(f.split("_")[1])
            for f in os.listdir(boot)
            if f.startswith("ckpt_") and f.split("_")[1].isdigit()
        )
        if epochs:
            return os.path.join(boot, f"ckpt_{epochs[-1]:04d}")
    return None


def bootstrap_base_model_device(
    num_steps: int = 8000,
    batch: int = 4,
    cfg: Optional[MaskRCNNConfig] = None,
    peak_lr: float = 8e-3,
    warmup_steps: int = 300,
    seed: int = 0,
    out_dir: Optional[str] = None,
    base_intrin: str = "1280_720_color",
    camera_jitter: float = 0.15,
    log_every: int = 50,
    ckpt_every: int = 1000,
    resume_from: Optional[str] = None,
    dist_range: Tuple[float, float] = (1.0, 1.0),
    pipeline_kwargs: Optional[dict] = None,
) -> str:
    """Pretrain the base segmenter with the on-device domain-randomized
    pipeline (``synth_data.DeviceSynthPipeline``) and a warmup-cosine SGD
    schedule.  Defaults to reference architecture parity: ResNet-101 at
    512x512 (train.py:48-50).  Returns the checkpoint path."""
    import json

    import jax
    import optax

    from .synth_data import DeviceSynthPipeline
    from .train_loop import Trainer

    cfg = cfg or MaskRCNNConfig(num_classes=7, depth=101)
    pipeline = DeviceSynthPipeline(
        cfg, base_intrin=base_intrin, camera_jitter=camera_jitter,
        dist_range=dist_range, **(pipeline_kwargs or {}),
    )
    out_dir = out_dir or os.path.dirname(Paths().BASE_MODEL)
    os.makedirs(out_dir, exist_ok=True)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, peak_lr, warmup_steps, num_steps
    )
    trainer = Trainer(cfg, out_dir, mesh=None, lr=sched, seed=seed)
    if resume_from:
        trainer.load(resume_from)
    with open(os.path.join(out_dir, "model_config.json"), "w") as f:
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
    key = jax.random.PRNGKey(seed + 1)
    # Checkpoint numbering continues above anything already in out_dir —
    # a transfer/resume run must not emit indices that sort below stale
    # scratch checkpoints (registry pruning keeps the highest-numbered
    # three, so a restarted counter would get the new weights pruned and
    # a stale model registered; see ADVICE round 4).
    existing = [
        int(f.split("_")[1])
        for f in os.listdir(out_dir)
        if f.startswith("ckpt_") and f.split("_")[1].isdigit()
    ]
    ck = max(existing, default=-1)
    path = None
    for step in range(1, num_steps + 1):
        key, sub = jax.random.split(key)
        b = pipeline.batch(sub, batch)
        metrics = trainer.train_step(b)
        if step % log_every == 0:
            print(
                f"bootstrap-dev step {step}/{num_steps}: "
                + " ".join(f"{k}={float(v):.3f}" for k, v in metrics.items()),
                flush=True,
            )
            _write_metrics(out_dir, step, metrics)
        if step % ckpt_every == 0 or step == num_steps:
            ck += 1
            path = trainer.save(ck)
            set_base_model(path)
    return path


def eval_segmenter_iou(
    ckpt_path: str,
    n: int = 32,
    cluttered: bool = True,
    seed: int = 123,
    base_intrin: str = "1280_720_color",
    min_gt_area: float = 0.0,
) -> float:
    """Mean per-link IoU of a segmenter checkpoint on held-out synthetic
    scenes (domain-randomized when ``cluttered``; plain shaded renders on a
    random background otherwise).

    ``min_gt_area``: skip ground-truth instances smaller than this many
    pixels.  The raw number scores sub-10x10-px instances (undetectable at
    any threshold) as IoU 0; bootv2 measures 0.78 all-GT vs 0.87 at
    >=400 px — report both when quoting capability."""
    import jax

    from ..models.inference import Segmenter
    from .synth_data import DeviceSynthPipeline, IMAGENET_MEAN, IMAGENET_STD

    urdf = URDFReader()
    seg = Segmenter(ckpt_path, ["BG"] + urdf.mesh_names[:6])
    pipeline = DeviceSynthPipeline(
        seg.cfg,
        urdf=urdf,
        base_intrin=base_intrin,
        num_distractors=6 if cluttered else 0,
    )
    key = jax.random.PRNGKey(seed)
    ious = []
    for i in range(0, n, 4):
        key, sub = jax.random.split(key)
        b = pipeline.batch(sub, 4)
        raw = np.asarray(b["images"])
        imgs = raw[..., :3] * IMAGENET_STD + IMAGENET_MEAN
        deps = None
        if seg.cfg.in_channels == 4:
            # Invert normalize_depth: holes (sentinel) back to 0 m.
            from ..models.inference import DEPTH_MEAN, DEPTH_STD

            dch = raw[..., 3]
            deps = np.where(dch < -3.0, 0.0, dch * DEPTH_STD + DEPTH_MEAN)
        for j in range(4):
            gt_masks = np.asarray(b["masks"][j]) > 0.5
            gt_cls = np.asarray(b["classes"][j])
            per_link, _ = seg.segment(
                np.clip(imgs[j], 0, 255).astype(np.uint8),
                None if deps is None else deps[j],
            )
            for g in range(len(gt_cls)):
                if gt_cls[g] == 0:
                    continue
                if gt_masks[g].sum() < min_gt_area:
                    continue
                name = seg.class_names[gt_cls[g]]
                pred = per_link.get(name, {}).get(
                    "mask", np.zeros(gt_masks[g].shape, bool)
                )
                union = (gt_masks[g] | pred).sum()
                if union:
                    ious.append((gt_masks[g] & pred).sum() / union)
    return float(np.mean(ious)) if ious else 0.0


def bootstrap_base_model(
    num_steps: int = 200,
    batch: int = 4,
    cfg: Optional[MaskRCNNConfig] = None,
    lr: float = 5e-3,
    seed: int = 0,
    out_dir: Optional[str] = None,
    intrinsics: str = "640_480_color_4",
    log_every: int = 20,
) -> str:
    """Pretrain the base segmentation model on synthetic renders.

    Saves to ``Paths().BASE_MODEL`` (a checkpoint directory) and returns the
    checkpoint path.
    """
    from ..simulation.renderer import Renderer

    cfg = cfg or MaskRCNNConfig(num_classes=7, depth=101)
    urdf = URDFReader()
    renderer = Renderer("seg", DEFAULT_CAMERA_POSE, intrinsics)
    rng = np.random.default_rng(seed)

    out_dir = out_dir or os.path.dirname(Paths().BASE_MODEL)
    os.makedirs(out_dir, exist_ok=True)
    trainer = Trainer(cfg, out_dir, mesh=None, lr=lr)
    metrics = {}
    for step in range(num_steps):
        b = synth_detection_batch(renderer, urdf, cfg, batch, rng)
        metrics = trainer.train_step(b)
        if (step + 1) % log_every == 0:
            print(
                f"bootstrap step {step + 1}/{num_steps}: "
                + " ".join(f"{k}={float(v):.3f}" for k, v in metrics.items())
            )
    _write_metrics(out_dir, num_steps, metrics)
    path = trainer.save(0)
    set_base_model(path)
    import json

    with open(os.path.join(out_dir, "model_config.json"), "w") as f:
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
    return path
