"""Segmentation inference wrapper.

Replaces the reference's PixelLib ``custom_segmentation`` usage
(``robotpose/prediction/predict.py:96-98, 415-417``): loads an orbax
checkpoint, runs the jitted Mask R-CNN forward, and reorganises instance
detections into the per-link dict shape the predictor consumes
(``_reorganize_by_link``, predict.py:383-395).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .mask_rcnn import MaskRCNN, MaskRCNNConfig

IMAGENET_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
IMAGENET_STD = np.array([58.395, 57.12, 57.375], np.float32)

# RGB-D models (cfg.in_channels == 4): depth-channel normalisation.  Valid
# depths map to ~[-1.6, 4.7] around the working envelope; holes (0) map to
# a sentinel far outside it so the network can learn hole semantics.
DEPTH_MEAN = 1.5
DEPTH_STD = 0.75
DEPTH_HOLE = -4.0


def normalize_depth(depth: jnp.ndarray) -> jnp.ndarray:
    """Metres -> normalised depth channel; 0/invalid -> DEPTH_HOLE."""
    d = jnp.clip(depth, 0.0, 5.0)
    return jnp.where(d > 0, (d - DEPTH_MEAN) / DEPTH_STD, DEPTH_HOLE)


class Segmenter:
    """Loads a trained checkpoint and segments frames into per-link masks."""

    def __init__(
        self,
        ckpt_path: str,
        class_names: List[str],
        cfg: Optional[MaskRCNNConfig] = None,
        mask_roi_size_infer: int = None,
        image_hw_infer: Optional[Tuple[int, int]] = None,
        infer_bf16: Optional[bool] = None,
    ):
        """``mask_roi_size_infer``: optional inference-time RoIAlign size
        for the mask branch (the head is fully convolutional so any size
        runs).  Measured on bootv2: running finer than trained *hurts*
        (0.90 -> 0.84 large-link IoU at 28 vs the trained 14) — the conv
        features shift scale — so the default keeps the trained size.

        ``image_hw_infer``: optional inference-time input resolution — the
        network is fully convolutional and anchors regenerate from the
        config, so any (h, w) divisible by 64 runs with trained weights.
        Smaller inputs cut detector latency roughly quadratically (the
        neural lane's dominant cost; see BENCHMARKS.md IoU-vs-latency
        curve).  Default: config.SEG_INFER_HW, else the trained size.

        ``infer_bf16``: run the detector forward in bfloat16 (params +
        activations; outputs cast back to float32).  MXU-native on TPU.
        Default: config.SEG_INFER_BF16."""
        import dataclasses

        import orbax.checkpoint as ocp

        from ..config import SEG_INFER_BF16, SEG_INFER_HW

        self.class_names = class_names
        self.ckpt_path = os.path.abspath(ckpt_path)
        model_dir = os.path.dirname(os.path.abspath(ckpt_path))
        cfg_file = os.path.join(model_dir, "model_config.json")
        if cfg is None and os.path.isfile(cfg_file):
            with open(cfg_file) as f:
                raw = json.load(f)
            raw["image_hw"] = tuple(raw["image_hw"])
            for k in ("anchor_scales", "anchor_ratios"):
                if k in raw:
                    raw[k] = tuple(raw[k])
            cfg = MaskRCNNConfig(**raw)
        cfg = cfg or MaskRCNNConfig(num_classes=len(class_names))
        if mask_roi_size_infer and mask_roi_size_infer != cfg.mask_roi_size:
            cfg = dataclasses.replace(cfg, mask_roi_size=mask_roi_size_infer)
        image_hw_infer = (
            image_hw_infer if image_hw_infer is not None else SEG_INFER_HW
        )
        if image_hw_infer and tuple(image_hw_infer) != cfg.image_hw:
            cfg = dataclasses.replace(cfg, image_hw=tuple(image_hw_infer))
        self.cfg = cfg
        self.model = MaskRCNN(self.cfg)
        self.infer_bf16 = bool(
            SEG_INFER_BF16 if infer_bf16 is None else infer_bf16
        )

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.abspath(ckpt_path))
        self.variables = {
            "params": restored["params"],
            "batch_stats": restored.get("batch_stats", {}),
        }
        if self.infer_bf16:
            self.variables_infer = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32
                else x,
                self.variables,
            )
        else:
            self.variables_infer = self.variables
        self._forward = jax.jit(self.forward_core)

    def forward_core(self, img: jnp.ndarray):
        """Traceable detector forward at inference precision: bf16 params +
        activations when ``infer_bf16`` (float32 otherwise), float32 out.
        Shared by :meth:`segment` and the predictor's fused real lane."""
        if self.infer_bf16:
            out = self.model.apply(
                self.variables_infer, img.astype(jnp.bfloat16)
            )
            return jax.tree.map(
                lambda x: x.astype(jnp.float32)
                if x.dtype == jnp.bfloat16
                else x,
                out,
            )
        return self.model.apply(self.variables_infer, img)

    def preprocess(
        self, image: np.ndarray, depth: Optional[np.ndarray] = None
    ) -> Tuple[jnp.ndarray, float, Tuple[int, int]]:
        """Letterbox-resize to the model input and normalise.

        RGB-D models (``cfg.in_channels == 4``) take the registered depth
        map (metres, 0 = hole) as a 4th channel — resized nearest-neighbour
        so hole boundaries stay crisp, normalised by :func:`normalize_depth`.
        A missing depth map degrades to an all-hole channel (the training
        pipeline drops the whole channel at random so this stays
        in-distribution)."""
        h, w = image.shape[:2]
        mh, mw = self.cfg.image_hw
        scale = min(mh / h, mw / w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        img = jax.image.resize(
            jnp.asarray(image, jnp.float32), (nh, nw, 3), method="linear"
        )
        img = (img - IMAGENET_MEAN) / IMAGENET_STD
        if self.cfg.in_channels == 4:
            if depth is None:
                dch = jnp.full((nh, nw, 1), DEPTH_HOLE, jnp.float32)
            else:
                dr = jax.image.resize(
                    jnp.asarray(depth, jnp.float32), (nh, nw), method="nearest"
                )
                dch = normalize_depth(dr)[..., None]
            img = jnp.concatenate([img, dch], axis=-1)
        # Padding stays normalised BLACK (pre-normalisation zero), matching
        # the RGB-only models that normalised after letterboxing.
        pad = [float(v) for v in -IMAGENET_MEAN / IMAGENET_STD]
        if self.cfg.in_channels == 4:
            pad.append(DEPTH_HOLE)
        canvas = jnp.broadcast_to(
            jnp.asarray(pad, jnp.float32), (mh, mw, self.cfg.in_channels)
        )
        canvas = canvas.at[:nh, :nw].set(img)
        return canvas, scale, (h, w)

    def segment(
        self, image: np.ndarray, depth: Optional[np.ndarray] = None
    ) -> Tuple[Dict, np.ndarray]:
        """Run detection: returns (per-link dict, visualisation image).

        The dict maps link name -> {'confidence', 'mask' [H, W] bool},
        merging multiple instances per class exactly as the reference's
        ``_reorganize_by_link`` does (predict.py:383-395).
        """
        canvas, scale, (h, w) = self.preprocess(image, depth)
        out = jax.device_get(self._forward(canvas))
        boxes = out["boxes"] / scale
        per_link: Dict[str, dict] = {}
        vis = np.array(image, copy=True)
        for i in range(len(out["valid"])):
            if not out["valid"][i]:
                continue
            cls = int(out["classes"][i])
            if cls <= 0 or cls >= len(self.class_names):
                continue
            name = self.class_names[cls]
            mask = self._paste_mask(out["masks"][i], boxes[i], h, w)
            if name in per_link:
                per_link[name]["mask"] |= mask
                per_link[name]["confidence"] = max(
                    per_link[name]["confidence"], float(out["scores"][i])
                )
            else:
                per_link[name] = {
                    "confidence": float(out["scores"][i]),
                    "mask": mask,
                }
        for name, d in per_link.items():
            vis[d["mask"]] = 0.5 * vis[d["mask"]] + np.array([0, 127, 0])
        return per_link, vis

    @staticmethod
    def _paste_mask(
        mask28: np.ndarray, box: np.ndarray, h: int, w: int, thresh: float = 0.5
    ) -> np.ndarray:
        """Paste an in-box mask into the full image frame."""
        y1, x1, y2, x2 = [float(v) for v in box]
        y1i, x1i = max(int(np.floor(y1)), 0), max(int(np.floor(x1)), 0)
        y2i, x2i = min(int(np.ceil(y2)), h), min(int(np.ceil(x2)), w)
        out = np.zeros((h, w), bool)
        if y2i <= y1i or x2i <= x1i:
            return out
        # Host-side resize: box sizes vary per detection, and a jitted
        # device resize would recompile per unique size.
        import cv2

        resized = cv2.resize(
            np.asarray(mask28, np.float32), (x2i - x1i, y2i - y1i)
        )
        out[y1i:y2i, x1i:x2i] = resized > thresh
        return out
