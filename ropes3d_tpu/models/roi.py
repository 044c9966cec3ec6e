"""RoIAlign and RoI heads (box + mask), static shapes throughout."""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def bilinear_sample(feat: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample feat [H, W, C] at float coords (ys, xs) [...]: -> [..., C].

    Out-of-bounds coordinates clamp to the edge (RoIAlign convention).
    """
    h, w = feat.shape[0], feat.shape[1]
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = ys - y0
    wx = xs - x0
    f00 = feat[y0, x0]
    f01 = feat[y0, x1]
    f10 = feat[y1, x0]
    f11 = feat[y1, x1]
    return (
        f00 * ((1 - wy) * (1 - wx))[..., None]
        + f01 * ((1 - wy) * wx)[..., None]
        + f10 * (wy * (1 - wx))[..., None]
        + f11 * (wy * wx)[..., None]
    )


def roi_align(
    feat: jnp.ndarray,  # [H, W, C] single level
    boxes: jnp.ndarray,  # [R, 4] in image pixels
    stride: int,
    out_size: int,
    samples: int = 2,
) -> jnp.ndarray:
    """RoIAlign one level: -> [R, out_size, out_size, C]."""
    b = boxes / stride
    y1, x1, y2, x2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    bh = jnp.maximum(y2 - y1, 1e-4)
    bw = jnp.maximum(x2 - x1, 1e-4)
    n = out_size * samples
    # Sub-sample grid centers within each bin.
    grid = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    ys = y1[:, None] + bh[:, None] * grid[None, :]  # [R, n]
    xs = x1[:, None] + bw[:, None] * grid[None, :]
    yy = jnp.broadcast_to(ys[:, :, None], (boxes.shape[0], n, n))
    xx = jnp.broadcast_to(xs[:, None, :], (boxes.shape[0], n, n))
    sampled = bilinear_sample(feat, yy - 0.5, xx - 0.5)  # [R, n, n, C]
    # Average the samples x samples sub-grid per bin.
    R, _, _, C = sampled.shape
    sampled = sampled.reshape(R, out_size, samples, out_size, samples, C)
    return sampled.mean(axis=(2, 4))


def multilevel_roi_align(
    feats: Sequence[jnp.ndarray],  # P2..P5, [H_l, W_l, C]
    strides: Sequence[int],
    boxes: jnp.ndarray,  # [R, 4]
    out_size: int,
) -> jnp.ndarray:
    """FPN-level-assigned RoIAlign: -> [R, S, S, C].

    level = clamp(floor(4 + log2(sqrt(area)/224)), 2, 5); computed for all
    levels then selected per RoI (static shapes over dynamic gathers).
    """
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    lvl = jnp.floor(4 + jnp.log2(jnp.sqrt(jnp.maximum(area, 1e-6)) / 224.0))
    lvl = jnp.clip(lvl, 2, 2 + len(feats) - 1).astype(jnp.int32) - 2
    per_level = jnp.stack(
        [roi_align(f, boxes, s, out_size) for f, s in zip(feats, strides)]
    )  # [L, R, S, S, C]
    return jnp.take_along_axis(
        per_level, lvl[None, :, None, None, None], axis=0
    )[0]


class BoxHead(nn.Module):
    num_classes: int  # including background
    hidden: int = 1024

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x [R, S, S, C] -> (class logits [R, K], box deltas [R, K, 4])."""
        r = x.shape[0]
        x = x.reshape(r, -1)
        x = nn.relu(nn.Dense(self.hidden)(x))
        x = nn.relu(nn.Dense(self.hidden)(x))
        logits = nn.Dense(self.num_classes)(x)
        deltas = nn.Dense(self.num_classes * 4)(x).reshape(r, self.num_classes, 4)
        return logits, deltas


class MaskHead(nn.Module):
    num_classes: int  # including background (bg slot unused)
    features: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x [R, S, S, C] -> mask logits [R, 2S, 2S, K]."""
        for _ in range(4):
            x = nn.relu(nn.Conv(self.features, (3, 3))(x))
        x = nn.relu(nn.ConvTranspose(self.features, (2, 2), strides=(2, 2))(x))
        return nn.Conv(self.num_classes, (1, 1))(x)
