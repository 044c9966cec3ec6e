"""Box utilities: anchors, encode/decode, IoU, fixed-shape NMS.

All ops are static-shape and vmap-friendly.  Boxes are (y1, x1, y2, x2) in
pixel coordinates.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BBOX_STD = np.array([0.1, 0.1, 0.2, 0.2], np.float32)


def generate_anchors(
    feat_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    scales: Sequence[float],
    ratios: Sequence[float] = (0.5, 1.0, 2.0),
) -> np.ndarray:
    """Anchor boxes for an FPN pyramid: -> [A_total, 4] (y1, x1, y2, x2).

    One scale per level, len(ratios) anchors per location.
    """
    out = []
    for (fh, fw), stride, scale in zip(feat_shapes, strides, scales):
        cy = (np.arange(fh) + 0.5) * stride
        cx = (np.arange(fw) + 0.5) * stride
        cy, cx = np.meshgrid(cy, cx, indexing="ij")
        boxes_l = []
        for r in ratios:
            h = scale * np.sqrt(r)
            w = scale / np.sqrt(r)
            boxes_l.append(
                np.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], -1)
            )
        # [fh, fw, R, 4] -> flat
        out.append(np.stack(boxes_l, 2).reshape(-1, 4))
    return np.concatenate(out, 0).astype(np.float32)


def encode_boxes(boxes: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Box -> regression deltas relative to anchors (R-CNN parameterisation)."""
    ah = anchors[..., 2] - anchors[..., 0]
    aw = anchors[..., 3] - anchors[..., 1]
    acy = anchors[..., 0] + ah / 2
    acx = anchors[..., 1] + aw / 2
    bh = boxes[..., 2] - boxes[..., 0]
    bw = boxes[..., 3] - boxes[..., 1]
    bcy = boxes[..., 0] + bh / 2
    bcx = boxes[..., 1] + bw / 2
    eps = 1e-6
    d = jnp.stack(
        [
            (bcy - acy) / jnp.maximum(ah, eps),
            (bcx - acx) / jnp.maximum(aw, eps),
            jnp.log(jnp.maximum(bh, eps) / jnp.maximum(ah, eps)),
            jnp.log(jnp.maximum(bw, eps) / jnp.maximum(aw, eps)),
        ],
        -1,
    )
    return d / BBOX_STD


def decode_boxes(deltas: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`encode_boxes`."""
    deltas = deltas * BBOX_STD
    ah = anchors[..., 2] - anchors[..., 0]
    aw = anchors[..., 3] - anchors[..., 1]
    acy = anchors[..., 0] + ah / 2
    acx = anchors[..., 1] + aw / 2
    cy = deltas[..., 0] * ah + acy
    cx = deltas[..., 1] * aw + acx
    h = jnp.exp(jnp.clip(deltas[..., 2], -10.0, 4.0)) * ah
    w = jnp.exp(jnp.clip(deltas[..., 3], -10.0, 4.0)) * aw
    return jnp.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], -1)


def clip_boxes(boxes: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0, h),
            jnp.clip(boxes[..., 1], 0, w),
            jnp.clip(boxes[..., 2], 0, h),
            jnp.clip(boxes[..., 3], 0, w),
        ],
        -1,
    )


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU: a [N, 4], b [M, 4] -> [N, M]."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    y1 = jnp.maximum(a[:, None, 0], b[None, :, 0])
    x1 = jnp.maximum(a[:, None, 1], b[None, :, 1])
    y2 = jnp.minimum(a[:, None, 2], b[None, :, 2])
    x2 = jnp.minimum(a[:, None, 3], b[None, :, 3])
    inter = jnp.maximum(y2 - y1, 0) * jnp.maximum(x2 - x1, 0)
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def nms_fixed(
    boxes: jnp.ndarray,  # [N, 4]
    scores: jnp.ndarray,  # [N]
    max_out: int,
    iou_thresh: float = 0.5,
) -> jnp.ndarray:
    """Fixed-shape NMS: returns indices [max_out] (repeating the last valid
    selection when fewer survive — callers mask by score).

    Greedy selection as a fori loop over ``max_out`` steps; each step picks
    the argmax of the live scores and suppresses overlapping boxes.
    """
    iou = box_iou(boxes, boxes)

    def body(i, carry):
        live_scores, sel = carry
        best = jnp.argmax(live_scores)
        sel = sel.at[i].set(best)
        suppress = iou[best] > iou_thresh
        live_scores = jnp.where(suppress, -jnp.inf, live_scores)
        live_scores = live_scores.at[best].set(-jnp.inf)
        return live_scores, sel

    _, sel = jax.lax.fori_loop(
        0,
        max_out,
        body,
        (scores, jnp.zeros(max_out, jnp.int32)),
    )
    return sel
