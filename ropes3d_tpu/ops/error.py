"""On-device error ("loss") functions for the render-and-match search.

Exact ports of the reference's three error formulas (SURVEY.md §2.6a),
reformulated as pure jnp so they fuse with the rasterizer under jit and
vmap over the candidate axis:

1. Per-link matched + unmatched error — ``Predictor._error``
   (reference robotpose/prediction/predict.py:475-509).  The reference
   matched render pixels to links via blue-channel equality
   (predict.py:486-488); here the rasterizer emits an integer link-id map so
   matching is ``link_id == index``.
2. Lookup tensor error — ``mean(|diff|) * std(|diff|)`` per candidate on
   sqrt-domain depth (predict.py:167-171).
3. TensorSweep error — ``mean(|diff|) * -std(|diff|)`` variant
   (predict.py:363-369).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

NUM_SEG_LINKS = 6  # base_link .. link_5_b (tool link excluded from seg)


class TargetBundle(NamedTuple):
    """Preprocessed per-frame targets (device-resident).

    masks : [6, H, W] bool — per-link segmentation masks (index 0 =
        base_link), zero where link undetected
    masked_depth : [6, H, W] float32 — per-link masked observed depth
    present : [6] bool — link was detected by the segmenter
    depth : [H, W] float32 — robot-body-masked observed depth
    occ : [H, W] float32 or None — occlusion-evidence plane for the
        robust error's occlusion-aware mode (see :func:`link_error`):
        ``-1`` where the segmenter detected ANY robot link, ``0`` where
        there is no depth evidence (sensor hole), ``> 0`` the raw
        observed non-robot surface depth in meters.  ``None`` (parity
        and plain-robust modes) disables occlusion awareness.
    """

    masks: jnp.ndarray
    masked_depth: jnp.ndarray
    present: jnp.ndarray
    depth: jnp.ndarray
    occ: jnp.ndarray | None = None


def _safe_mean_nonzero(x: jnp.ndarray) -> jnp.ndarray:
    """mean(x[x != 0]) with 0 fallback for an all-zero array."""
    nz = x != 0
    cnt = jnp.sum(nz)
    return jnp.where(cnt > 0, jnp.sum(jnp.where(nz, x, 0.0)) / jnp.maximum(cnt, 1), 0.0)


def link_error(
    target: TargetBundle,
    render_depth: jnp.ndarray,  # [H, W]
    render_link_id: jnp.ndarray,  # [H, W] int32, -1 background
    link_active: jnp.ndarray,  # [6] bool — links scored (reference
    #   link_names[1:num_joints]; index 0/base never scored)
    tau: float | jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Scalar visual+depth error of one render vs the target frame.

    Formula parity with Predictor._error (predict.py:475-509):
      per active+present link:  mean(seg_mask != render_mask) * 5
        + (if >=5% of mask pixels have depth) mean_nonzero(|d_tgt - d_rnd|) * 10
      global:  mean_nonzero(|depth diff|) * std(|depth diff|)

    ``tau`` (meters) truncates every depth residual at ``min(|diff|, tau)``
    — the robust mode for neural-segmented targets.  With imperfect masks
    the parity depth term is dominated by mask-xor pixels contributing the
    full depth magnitude (~1.5-2 m each x10), a pose-independent floor
    ~50x the pose signal (measured: err(true pose) ~= err(80-deg-wrong
    pose) on cluttered frames, assets/diag_terms.py).  Truncation caps
    each xor pixel at tau so the term scales with xor *count* (pose
    geometry) instead of depth magnitude, while small true residuals stay
    exact.  ``tau=None``/inf is bit-exact reference parity.

    Robust + ``target.occ`` set — OCCLUSION-AWARE mode.  Plain robust
    still charges the TRUE pose full xor for every robot pixel the
    segmenter missed (occluded by clutter, or recall-dropped), so on
    cluttered frames poses that "hide" can outrank it (round-4
    diag_misrank2: final-error misranks with <=1-10% gaps were the
    residual failure mode after the lookup fix).  With the occ plane
    (semantics in :class:`TargetBundle`), a render-covered pixel the
    segmenter did NOT claim is charged by free-space violation instead
    of unconditionally:

    - ``occ < 0`` (detected as another link): full charge — coverage
      duty and mislabels keep their cost;
    - ``occ == 0`` (sensor hole): no evidence, no charge;
    - ``occ > 0``: charge ``min(max(occ - render, 0), tau)`` — an
      observed surface BEHIND the hypothesized robot proves the robot
      isn't there (the camera saw through it); a surface at or in front
      of the render depth legitimately explains the missing detection
      (occluder, or the undetected robot itself) and costs nothing.

    Segmenter-claimed pixels keep their exact robust terms — the pose is
    still scored by how well it covers every detected fragment.
    """
    render_depth = render_depth.astype(jnp.float32)
    robust = tau is not None
    occl = robust and target.occ is not None
    tau = jnp.float32(jnp.inf if tau is None else tau)

    # Vectorised over the link axis (indices 1..5; base never scored) —
    # one fused pass instead of per-link kernels, which matters inside the
    # descent loop where evals run at B=2.
    li = jnp.arange(1, NUM_SEG_LINKS)
    score = link_active[li] & target.present[li]  # [5]
    joint_masks = target.masks[1:]  # [5, H, W]
    render_masks = render_link_id[None] == li[:, None, None]  # [5, H, W]
    P = float(render_depth.shape[0] * render_depth.shape[1])
    if occl:
        # Graded charge for render-claimed, segmenter-unclaimed pixels
        # (free-space violation; see docstring).  Detected-but-uncovered
        # pixels keep the full coverage charge.
        cpx = jnp.where(
            target.occ < 0,
            1.0,
            jnp.where(
                target.occ > 0,
                jnp.minimum(jnp.maximum(target.occ - render_depth, 0.0), tau)
                / tau,
                0.0,
            ),
        )  # [H, W]
        xor = jnp.sum(
            (joint_masks & ~render_masks).astype(jnp.float32), axis=(1, 2)
        ) + jnp.sum((render_masks & ~joint_masks) * cpx[None], axis=(1, 2))
        mask_errs = xor / P * 5.0
    else:
        mask_errs = jnp.mean(joint_masks != render_masks, axis=(1, 2)) * 5.0

    target_masked = target.masked_depth[1:]  # [5, H, W]
    render_masked = render_depth[None] * render_masks
    enough_depth = jnp.sum(target_masked != 0, axis=(1, 2)) > 0.05 * jnp.sum(
        joint_masks, axis=(1, 2)
    )
    adiff = jnp.abs(target_masked - render_masked)
    nz = adiff != 0
    adiff = jnp.minimum(adiff, tau)
    cnt = jnp.sum(nz, axis=(1, 2))
    mean_nz = jnp.sum(jnp.where(nz, adiff, 0.0), axis=(1, 2)) / jnp.maximum(cnt, 1)
    depth_errs = jnp.where(enough_depth & (cnt > 0), mean_nz * 10.0, 0.0)

    err = jnp.sum(jnp.where(score, mask_errs + depth_errs, 0.0))

    diff = jnp.minimum(jnp.abs(target.depth - render_depth), tau)
    if robust:
        if occl:
            # Render over a body-depth hole: charge by free-space
            # violation instead of the full |0 - render| truncation.
            g2 = jnp.where(
                target.occ < 0,
                jnp.minimum(render_depth, tau),
                jnp.where(
                    target.occ > 0,
                    jnp.minimum(
                        jnp.maximum(target.occ - render_depth, 0.0), tau
                    ),
                    0.0,
                ),
            )
            diff = jnp.where((target.depth == 0) & (render_depth > 0), g2, diff)
        # Sum-form global term: mean-over-nonzero saturates at tau once
        # every residual exceeds it, and the parity std factor then
        # COLLAPSES (std of a near-constant field -> 0), actively rewarding
        # grossly wrong poses — catastrophic on frames where no links were
        # detected and the global term is the only signal.  sum/P is
        # monotone in both disagreement area and (capped) magnitude.
        err += jnp.sum(diff) / float(diff.shape[0] * diff.shape[1])
    else:
        err += _safe_mean_nonzero(diff) * jnp.std(diff)
    return err


@functools.partial(jax.jit, static_argnames=())
def link_error_batch(
    target: TargetBundle,
    render_depth: jnp.ndarray,  # [B, H, W]
    render_link_id: jnp.ndarray,  # [B, H, W]
    link_active: jnp.ndarray,  # [6]
    tau: float | jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Vmapped link_error over a candidate batch: -> err [B]."""
    return jax.vmap(lambda d, l: link_error(target, d, l, link_active, tau))(
        render_depth, render_link_id
    )


def link_error_from_parts(
    parts: jnp.ndarray,  # [B, 18] kernel partials (rasterizer_pallas)
    target: TargetBundle,
    link_active: jnp.ndarray,  # [6] bool
    num_pixels: int,
    tau: float | None = None,
) -> jnp.ndarray:
    """Assemble the exact reference error from fused-kernel partial sums.

    Numerically identical to :func:`link_error` on the rendered maps: the
    kernel emits, per candidate, the per-link xor counts / masked-depth
    |diff| sums / nonzero counts and the global diff (sum, nonzero count,
    sum of squares); everything else is target-side statistics computed
    here (predict.py:475-509 formula parity).
    """
    P = float(num_pixels)
    xor = parts[:, 0:5]
    s_ad = parts[:, 5:10]
    c_ad = parts[:, 10:15]
    sd, cd, sd2 = parts[:, 15], parts[:, 16], parts[:, 17]

    score = link_active[1:] & target.present[1:]  # [5]
    tgt_nz = jnp.sum(target.masked_depth[1:] != 0, axis=(1, 2))
    tmask_sum = jnp.sum(target.masks[1:], axis=(1, 2))
    enough = tgt_nz > 0.05 * tmask_sum  # [5]

    mask_errs = xor / P * 5.0
    mean_nz = s_ad / jnp.maximum(c_ad, 1.0)
    depth_errs = jnp.where(enough[None] & (c_ad > 0), mean_nz * 10.0, 0.0)
    err = jnp.sum(jnp.where(score[None], mask_errs + depth_errs, 0.0), axis=1)

    if tau is not None:
        # Robust mode (kernel already truncated sd at tau): sum-form global
        # term — see link_error for why mean*std breaks under truncation.
        return err + sd / P
    gmean = jnp.where(cd > 0, sd / jnp.maximum(cd, 1.0), 0.0)
    gstd = jnp.sqrt(jnp.maximum(sd2 / P - (sd / P) ** 2, 0.0))
    return err + gmean * gstd


def mean_abs_std(diff: jnp.ndarray, axes=(1, 2)) -> jnp.ndarray:
    """``mean(|diff|) , std(|diff|)`` in ONE pass over ``diff``.

    ``jnp.std`` re-reads its (possibly huge) input after the mean pass; for
    the [N, ch, cw] lookup stacks that means ~3x the HBM traffic of the
    fused sum/sum-of-squares form used here (population variance —
    identical to ``jnp.std`` up to roundoff)."""
    n = 1
    for ax in axes:
        n *= diff.shape[ax]
    d = jnp.abs(diff)
    s1 = jnp.sum(d, axis=axes)
    s2 = jnp.sum(d * d, axis=axes)
    m = s1 / n
    return m, jnp.sqrt(jnp.maximum(s2 / n - m * m, 0.0))


def lookup_error(tgt_sqrt: jnp.ndarray, lookup_sqrt: jnp.ndarray) -> jnp.ndarray:
    """Lookup-stage candidate error: err[N] = mean(|diff|) * std(|diff|).

    Both inputs are sqrt-domain depth (reference predict.py:117,167-171);
    ``tgt_sqrt`` is the cropped target [H, W], ``lookup_sqrt`` the
    pre-rendered stack [N, H, W] — broadcasting replaces the reference's
    explicit ``tf.stack([target]*N)`` upload (predict.py:406).  Callers may
    pass a bfloat16 stack (config.LOOKUP_STACK_DTYPE); the arithmetic here
    upcasts to f32, but quantized inputs can flip near-tied candidates vs
    an all-f32 comparison.
    """
    m, s = mean_abs_std(tgt_sqrt[None] - lookup_sqrt)
    return m * s


def tensor_sweep_error(tgt_sqrt: jnp.ndarray, sweep_sqrt: jnp.ndarray) -> jnp.ndarray:
    """TensorSweep error: mean(|diff|) * -std(|diff|) (predict.py:363-369)."""
    m, s = mean_abs_std(tgt_sqrt[None] - sweep_sqrt)
    return m * -s
