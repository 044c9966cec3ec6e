"""Region Proposal Network head and proposal generation."""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .boxes import clip_boxes, decode_boxes, nms_fixed


class RPNHead(nn.Module):
    """Shared 3x3 conv + objectness/box 1x1 convs, applied per level."""

    anchors_per_loc: int = 3
    features: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        conv = nn.Conv(self.features, (3, 3), name="rpn_conv")
        obj = nn.Conv(self.anchors_per_loc, (1, 1), name="rpn_obj")
        box = nn.Conv(self.anchors_per_loc * 4, (1, 1), name="rpn_box")
        logits, deltas = [], []
        for f in feats:
            x = nn.relu(conv(f))
            logits.append(obj(x).reshape(-1))
            deltas.append(box(x).reshape(-1, 4))
        return jnp.concatenate(logits), jnp.concatenate(deltas, 0)


def generate_proposals(
    logits: jnp.ndarray,  # [A]
    deltas: jnp.ndarray,  # [A, 4]
    anchors: jnp.ndarray,  # [A, 4]
    image_hw: Tuple[int, int],
    pre_nms_topk: int = 1024,
    post_nms: int = 128,
    iou_thresh: float = 0.7,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k -> decode -> clip -> fixed-shape NMS.

    Returns (boxes [post_nms, 4], scores [post_nms]).
    """
    k = min(pre_nms_topk, logits.shape[0])
    scores, idx = jax.lax.top_k(logits, k)
    boxes = decode_boxes(deltas[idx], anchors[idx])
    boxes = clip_boxes(boxes, *image_hw)
    # Degenerate boxes get -inf score.
    ok = (boxes[:, 2] > boxes[:, 0] + 1e-3) & (boxes[:, 3] > boxes[:, 1] + 1e-3)
    scores = jnp.where(ok, scores, -jnp.inf)
    sel = nms_fixed(boxes, scores, post_nms, iou_thresh)
    return boxes[sel], jax.nn.sigmoid(scores[sel])
