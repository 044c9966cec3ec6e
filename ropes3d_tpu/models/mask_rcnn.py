"""Mask R-CNN assembly: forward, losses, and inference postprocessing.

Static-shape, jit/pjit-friendly end to end (SURVEY.md §7 hard part #2:
"dynamic-shaped proposals -> fixed-size padded top-k").  Replaces the
reference's PixelLib/TF Mask R-CNN (train.py:48-54; inference at
predict.py:96-98, 415-417).

Ground truth per image is padded to ``max_gt`` instances: boxes [G, 4],
classes [G] (0 = padding), masks [G, H, W].  Sampling heuristics of the
original paper (256 RPN anchors, 25% positive RoIs) are replaced by masked
loss weighting — equivalent in expectation and shape-static.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .boxes import (
    box_iou,
    clip_boxes,
    decode_boxes,
    encode_boxes,
    generate_anchors,
    nms_fixed,
)
from .fpn import FPN
from .resnet import ResNet
from .roi import BoxHead, MaskHead, multilevel_roi_align, roi_align
from .rpn import RPNHead, generate_proposals


@dataclass(frozen=True)
class MaskRCNNConfig:
    num_classes: int = 7  # BG + 6 links (reference train.py:35-50)
    depth: int = 101
    image_hw: Tuple[int, int] = (512, 512)
    max_gt: int = 8
    pre_nms_topk: int = 1024
    num_proposals: int = 128
    roi_size: int = 7
    mask_roi_size: int = 14
    max_detections: int = 16
    anchor_scales: Tuple[float, ...] = (32, 64, 128, 256, 512)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    fpn_features: int = 256
    score_thresh: float = 0.7
    nms_thresh: float = 0.3
    # Input channels: 3 = RGB (reference parity), 4 = RGB-D.  The pipeline
    # is RGB-D end to end (every capture carries registered depth), so the
    # TPU-native segmenter can consume the depth channel directly — clutter
    # that defeats color segmentation is trivially separable in depth.
    # This replaces the transfer-learning advantage of the reference's
    # COCO-pretrained backbone (training/__init__.py:10-15), which cannot
    # be bundled offline.
    in_channels: int = 3

    @classmethod
    def tiny(cls, **overrides) -> "MaskRCNNConfig":
        """Small config for CI / multi-chip dryruns: depth-18, 64x64 images.
        Keeps every architectural component; only sizes shrink."""
        kw = dict(
            num_classes=7,
            depth=18,
            image_hw=(64, 64),
            max_gt=2,
            pre_nms_topk=64,
            num_proposals=16,
            max_detections=4,
            roi_size=5,
            mask_roi_size=7,
            anchor_scales=(8, 16, 32, 64, 128),
        )
        kw.update(overrides)
        return cls(**kw)

    @property
    def strides(self) -> Tuple[int, ...]:
        return (4, 8, 16, 32, 64)

    def feat_shapes(self):
        h, w = self.image_hw
        return [(-(-h // s), -(-w // s)) for s in self.strides]

    def anchors(self) -> np.ndarray:
        return generate_anchors(
            self.feat_shapes(), self.strides, self.anchor_scales, self.anchor_ratios
        )


class MaskRCNN(nn.Module):
    cfg: MaskRCNNConfig

    def setup(self):
        self.backbone = ResNet(self.cfg.depth)
        self.fpn = FPN(self.cfg.fpn_features)
        self.rpn = RPNHead(len(self.cfg.anchor_ratios), self.cfg.fpn_features)
        self.box_head = BoxHead(self.cfg.num_classes)
        self.mask_head = MaskHead(self.cfg.num_classes)

    def features(self, image: jnp.ndarray):
        """image [H, W, 3] float -> P2..P6 feature maps."""
        c2, c3, c4, c5 = self.backbone(image[None])
        ps = self.fpn([c2, c3, c4, c5])
        return [p[0] for p in ps]

    def __call__(self, image: jnp.ndarray):
        """Inference forward for a single image; returns detection dict."""
        cfg = self.cfg
        feats = self.features(image)
        rpn_logits, rpn_deltas = self.rpn(feats)
        anchors = jnp.asarray(cfg.anchors())
        proposals, _ = generate_proposals(
            rpn_logits,
            rpn_deltas,
            anchors,
            cfg.image_hw,
            cfg.pre_nms_topk,
            cfg.num_proposals,
        )
        roi_feats = multilevel_roi_align(
            feats[:4], cfg.strides[:4], proposals, cfg.roi_size
        )
        logits, deltas = self.box_head(roi_feats)
        probs = jax.nn.softmax(logits, -1)  # [R, K]

        # Per-class decoding + NMS -> max_detections.
        R, K = probs.shape
        cls_ids = jnp.argmax(probs[:, 1:], -1) + 1  # best non-bg class per roi
        best_prob = jnp.take_along_axis(probs, cls_ids[:, None], 1)[:, 0]
        best_deltas = jnp.take_along_axis(
            deltas, cls_ids[:, None, None].repeat(4, -1), 1
        )[:, 0]
        det_boxes = clip_boxes(decode_boxes(best_deltas, proposals), *cfg.image_hw)
        scores = jnp.where(best_prob > cfg.score_thresh, best_prob, -jnp.inf)
        # Class-aware NMS: offset boxes per class so cross-class pairs never
        # suppress each other.
        offset = cls_ids.astype(jnp.float32)[:, None] * max(cfg.image_hw) * 2.0
        sel = nms_fixed(det_boxes + offset, scores, cfg.max_detections, cfg.nms_thresh)
        d_boxes = det_boxes[sel]
        d_scores = jnp.maximum(scores[sel], 0.0)
        d_cls = cls_ids[sel]
        d_valid = jnp.isfinite(scores[sel]) & (scores[sel] > 0)

        mask_feats = multilevel_roi_align(
            feats[:4], cfg.strides[:4], d_boxes, cfg.mask_roi_size
        )
        mask_logits = self.mask_head(mask_feats)  # [D, 2S, 2S, K]
        d_masks = jax.nn.sigmoid(
            jnp.take_along_axis(
                mask_logits, d_cls[:, None, None, None], axis=-1
            )[..., 0]
        )
        return {
            "boxes": d_boxes,
            "scores": d_scores,
            "classes": d_cls,
            "valid": d_valid,
            "masks": d_masks,  # [D, 2S, 2S] in-box masks
        }

    # ------------------------------------------------------------ training
    def loss(
        self,
        image: jnp.ndarray,  # [H, W, 3]
        gt_boxes: jnp.ndarray,  # [G, 4]
        gt_classes: jnp.ndarray,  # [G] (0 = pad)
        gt_masks: jnp.ndarray,  # [G, H, W] float
        rng: jax.Array,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        feats = self.features(image)
        rpn_logits, rpn_deltas = self.rpn(feats)
        anchors = jnp.asarray(cfg.anchors())

        gt_valid = gt_classes > 0
        iou = box_iou(anchors, gt_boxes)  # [A, G]
        iou = jnp.where(gt_valid[None, :], iou, -1.0)
        max_iou = iou.max(-1)
        argmax_gt = iou.argmax(-1)

        # --- RPN losses.
        best_anchor_per_gt = jnp.where(
            gt_valid, iou.argmax(0), -1
        )  # force at least one positive per gt
        pos = max_iou >= 0.7
        pos = pos | jnp.isin(
            jnp.arange(anchors.shape[0]), jnp.where(best_anchor_per_gt >= 0,
                                                    best_anchor_per_gt, -1)
        )
        neg = (max_iou < 0.3) & (~pos)
        obj_labels = pos.astype(jnp.float32)
        obj_w = (pos | neg).astype(jnp.float32)
        obj_loss = optax_sigmoid_bce(rpn_logits, obj_labels)
        rpn_obj_loss = (obj_loss * obj_w).sum() / jnp.maximum(obj_w.sum(), 1.0)

        matched_boxes = gt_boxes[argmax_gt]
        rpn_box_t = encode_boxes(matched_boxes, anchors)
        rpn_box_loss = (
            smooth_l1(rpn_deltas - rpn_box_t).sum(-1) * pos
        ).sum() / jnp.maximum(pos.sum(), 1.0)

        # --- Proposals (stop-gradient through RPN outputs).
        proposals, _ = generate_proposals(
            jax.lax.stop_gradient(rpn_logits),
            jax.lax.stop_gradient(rpn_deltas),
            anchors,
            cfg.image_hw,
            cfg.pre_nms_topk,
            cfg.num_proposals - cfg.max_gt,
        )
        # Append (jittered) gt boxes so the heads always see positives.
        proposals = jnp.concatenate([proposals, gt_boxes[: cfg.max_gt]], 0)

        piou = jnp.where(gt_valid[None, :], box_iou(proposals, gt_boxes), -1.0)
        pmax = piou.max(-1)
        parg = piou.argmax(-1)
        fg = pmax >= 0.5
        roi_cls_t = jnp.where(fg, gt_classes[parg], 0)
        roi_valid = pmax >= 0.0  # proposals matching only padding gt excluded

        roi_feats = multilevel_roi_align(
            feats[:4], cfg.strides[:4], proposals, cfg.roi_size
        )
        logits, deltas = self.box_head(roi_feats)
        ce = cross_entropy(logits, roi_cls_t)
        cls_loss = (ce * roi_valid).sum() / jnp.maximum(roi_valid.sum(), 1.0)

        sel_deltas = jnp.take_along_axis(
            deltas, roi_cls_t[:, None, None].repeat(4, -1), 1
        )[:, 0]
        box_t = encode_boxes(gt_boxes[parg], proposals)
        box_loss = (smooth_l1(sel_deltas - box_t).sum(-1) * fg).sum() / jnp.maximum(
            fg.sum(), 1.0
        )

        # --- Mask loss on foreground proposals.
        mask_feats = multilevel_roi_align(
            feats[:4], cfg.strides[:4], proposals, cfg.mask_roi_size
        )
        mask_logits = self.mask_head(mask_feats)  # [R, 2S, 2S, K]
        pred = jnp.take_along_axis(
            mask_logits, roi_cls_t[:, None, None, None], axis=-1
        )[..., 0]
        # Crop each proposal's matched gt mask to the RoI at 2S x 2S.
        s2 = cfg.mask_roi_size * 2
        tgt = _crop_gt_masks(gt_masks, parg, proposals, s2)
        mloss = optax_sigmoid_bce(pred, tgt)
        mask_loss = (mloss.mean((-1, -2)) * fg).sum() / jnp.maximum(fg.sum(), 1.0)

        total = rpn_obj_loss + rpn_box_loss + cls_loss + box_loss + mask_loss
        return {
            "total": total,
            "rpn_obj": rpn_obj_loss,
            "rpn_box": rpn_box_loss,
            "cls": cls_loss,
            "box": box_loss,
            "mask": mask_loss,
        }


def _crop_gt_masks(gt_masks, parg, proposals, out_size):
    """Crop matched gt masks [G, H, W] to each proposal box at out_size²."""
    matched = gt_masks[parg]  # [R, H, W]

    def one(mask, box):
        return roi_align(mask[..., None], box[None], 1, out_size)[0, ..., 0]

    return jax.vmap(one)(matched.astype(jnp.float32), proposals)


def optax_sigmoid_bce(logits, labels):
    """Numerically-stable sigmoid BCE."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def cross_entropy(logits, labels):
    logp = jax.nn.log_softmax(logits, -1)
    return -jnp.take_along_axis(logp, labels[:, None], 1)[:, 0]


def smooth_l1(x, beta: float = 1.0 / 9.0):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)
