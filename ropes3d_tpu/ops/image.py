"""Image ops in XLA: resize, morphology, colormap.

Replaces the reference's OpenCV calls on the hot path:
- ``cv2.resize`` downsampling (reference predict.py:378-381)
- ``cv2.dilate``/``cv2.erode`` robot-mask cleanup (predict.py:419-438)
- ``cv2.applyColorMap(TURBO)`` visualisation (utils.py:185-226)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def downsample(img: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Downscale by an integer factor with cv2.resize INTER_LINEAR semantics.

    cv2's INTER_LINEAR point-samples a 2x2 source neighbourhood at
    ``(i + .5) * factor - .5`` — it does *not* anti-alias over the whole
    footprint (unlike jax.image.resize).  This matters: the synthetic
    predictor recovers per-link masks by exact color equality on the
    downsampled render (reference predict.py:445-469), which only survives
    point-sampling.  For integer factors the sample point interpolates the
    two central source pixels (even factor) or hits one exactly (odd).

    Works for [H, W] and [H, W, C].
    """
    f = factor
    if f == 1:
        return img.astype(jnp.float32)
    h, w = img.shape[0] // f, img.shape[1] // f
    x = img.astype(jnp.float32)
    if f % 2 == 1:
        return x[f // 2 :: f, f // 2 :: f][:h, :w]
    r0 = f // 2 - 1
    a = x[r0::f, r0::f][:h, :w]
    b = x[r0::f, r0 + 1 :: f][:h, :w]
    c = x[r0 + 1 :: f, r0::f][:h, :w]
    d = x[r0 + 1 :: f, r0 + 1 :: f][:h, :w]
    return 0.25 * (a + b + c + d)


def _morph(img: jnp.ndarray, size: int, op) -> jnp.ndarray:
    init = -jnp.inf if op is jax.lax.max else jnp.inf
    x = img.astype(jnp.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None, ..., None]
    out = jax.lax.reduce_window(
        x,
        init,
        op,
        window_dimensions=(1, size, size, 1),
        window_strides=(1, 1, 1, 1),
        padding="SAME",
    )
    return out[0, ..., 0] if squeeze else out


def dilate(img: jnp.ndarray, size: int) -> jnp.ndarray:
    """Grayscale dilation with a size x size square kernel (cv2.dilate parity)."""
    return _morph(img, size, jax.lax.max)


def erode(img: jnp.ndarray, size: int) -> jnp.ndarray:
    """Grayscale erosion with a size x size square kernel (cv2.erode parity)."""
    return _morph(img, size, jax.lax.min)


@functools.partial(jax.jit, static_argnames=("dilate_by", "erode_by"))
def close_mask(mask: jnp.ndarray, dilate_by: int = 8, erode_by: int = 7) -> jnp.ndarray:
    """Dilate-then-erode a boolean mask (predict.py:419-429 body cleanup)."""
    return erode(dilate(mask.astype(jnp.float32), dilate_by), erode_by) > 0


def gate_depth(
    mask: jnp.ndarray, depth: jnp.ndarray, half_window: float
) -> jnp.ndarray:
    """Zero depth pixels inside ``mask`` that deviate from the mask's median
    masked depth by more than ``half_window`` metres.

    Robust occluder / mask-spill rejection for *real* depth frames: clutter
    carries valid range values, so a dilated segmentation mask (or an
    occluder inside a detection) feeds wrong depths into the error terms.
    Zero depth is ignored by every error formula (ops/error.py
    ``_safe_mean_nonzero``), so gating to 0 reproduces the clean-background
    behavior.  An empty mask passes depth through unchanged.  Traceable
    (static shapes; median via sort with +inf padding).
    """
    vals = jnp.where(mask & (depth > 0), depth, jnp.inf)
    cnt = jnp.sum(jnp.isfinite(vals))
    med = jnp.sort(vals.ravel())[jnp.maximum((cnt - 1) // 2, 0)]
    ok = (jnp.abs(depth - med) <= half_window) | (cnt == 0)
    return jnp.where(ok, depth, 0.0)


def paste_box_masks(
    masks: jnp.ndarray, boxes: jnp.ndarray, valid: jnp.ndarray,
    h: int, w: int,
) -> jnp.ndarray:
    """Paste per-detection in-box masks [K, S, S] into frame masks [K, h, w].

    Device equivalent of the host lane's per-detection
    ``cv2.resize`` paste (``models.inference.Segmenter._paste_mask``):
    the paste box is the integer floor/ceil of the float box clamped to the
    frame, and the S x S mask samples with the (x+0.5)*src/dst-0.5 bilinear
    convention over that INTEGER box — identical geometry, so fused-lane
    masks match the canonical path instead of rounding differently at box
    edges.  Fixed shapes; one program for any detection count.
    """
    S = masks.shape[-1]
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]

    def paste(mask_ss, box, ok):
        from jax.scipy.ndimage import map_coordinates

        y1i = jnp.maximum(jnp.floor(box[0]), 0.0)
        x1i = jnp.maximum(jnp.floor(box[1]), 0.0)
        y2i = jnp.minimum(jnp.ceil(box[2]), float(h))
        x2i = jnp.minimum(jnp.ceil(box[3]), float(w))
        bh = jnp.maximum(y2i - y1i, 1.0)
        bw = jnp.maximum(x2i - x1i, 1.0)
        sy = (yy - y1i + 0.5) * (S / bh) - 0.5
        sx = (xx - x1i + 0.5) * (S / bw) - 0.5
        val = map_coordinates(
            mask_ss.astype(jnp.float32),
            [jnp.broadcast_to(sy, (h, w)), jnp.broadcast_to(sx, (h, w))],
            order=1, mode="nearest",
        )
        inside = (yy >= y1i) & (yy < y2i) & (xx >= x1i) & (xx < x2i)
        return inside & ok & (val > 0.5)

    return jax.vmap(paste)(masks, boxes, valid)


# ---------------------------------------------------------------- colormap
# 16-entry turbo colormap control points (public matplotlib 'turbo' samples),
# linearly interpolated — close visual parity with cv2.COLORMAP_TURBO.
_TURBO = np.array(
    [
        [48, 18, 59], [65, 69, 171], [70, 117, 237], [57, 162, 252],
        [27, 207, 212], [36, 236, 166], [97, 252, 108], [164, 252, 59],
        [209, 232, 52], [243, 198, 35], [255, 154, 0], [239, 104, 0],
        [211, 66, 0], [166, 30, 0], [122, 4, 3], [122, 4, 3],
    ],
    dtype=np.float32,
)


def color_array(
    x: np.ndarray,
    mn: float = None,
    mx: float = None,
    percent: float = 3,
    ignore_zero: bool = True,
) -> np.ndarray:
    """Apply a turbo colormap to an array (reference utils.py:185-226).

    Host-side visualisation helper; returns uint8 [H, W, 3] (BGR-ish order
    consistent with the reference's cv2 output is unimportant — RGB here).
    """
    x = np.asarray(x, dtype=float)
    mask = x == 0 if ignore_zero else None
    nz = x[x != 0] if ignore_zero else x
    if nz.size == 0:
        return np.zeros((*x.shape, 3), np.uint8)
    if mn is None:
        mn = np.percentile(nz, percent) if ignore_zero else float(np.min(x))
    if mx is None:
        mx = np.percentile(x, 100 - percent) if ignore_zero else float(np.max(x))
    t = np.clip((x - mn) / max(mx - mn, 1e-12), 0, 1) * (len(_TURBO) - 1)
    lo = np.floor(t).astype(int)
    hi = np.minimum(lo + 1, len(_TURBO) - 1)
    frac = (t - lo)[..., None]
    out = (_TURBO[lo] * (1 - frac) + _TURBO[hi] * frac).astype(np.uint8)
    if ignore_zero:
        out[mask] = 0
    return out
