"""Fused Pallas TPU rasterizer.

Same math as the XLA backend (``rasterizer.py``) but fused into one kernel:
per (candidate, row-tile, col-tile) grid cell, the triangle-coefficient
matrix stays in VMEM, edge/inverse-depth planes are evaluated as
``[4C, 3] @ [3, TILE_R*TILE_C]`` MXU dots, and the packed
(inverse-depth | link-id) key max-reduction happens in registers — the
[N, P] intermediate never exists.

Chunk-level culling: triangles are processed in chunks of ``CHUNK``; a chunk
whose screen bbox (row *and* column extents from ``triangle_setup``) misses
the 2-D pixel tile is skipped with ``pl.when``.  Mesh-local triangle
ordering makes chunks spatially coherent, so most chunks skip most tiles —
the win grows with resolution (full-res input renders cull ~95%).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 32  # triangles per inner step of the depth-map kernels
# (empirically best on v5e: larger chunks coarsen bbox culling and lose
# more than the loop rounds save)
ERR_CHUNK = 64  # triangles per inner step of the fused-error kernel; its
# FMA plane evaluation has lower per-chunk fixed cost than the MXU dot, so
# the optimum shifts coarser (v5e sweep: 16=14.8k, 32=17.9k, 64=19.7k,
# 128=14.1k cand/s on the 6-link headline eval)
TILE_R = 8  # pixel-tile rows
TILE_C = 128  # pixel-tile cols (one lane register width)


def _raster_kernel(
    origin_ref,  # SMEM [2] f32 — (row0, col0) crop origin
    chunk_bbox_ref,  # SMEM [n_chunks, 4] f32 — (vmin, vmax, umin, umax)
    coeffs_ref,  # VMEM [N, 4, 3] f32
    qrange_ref,  # VMEM [N, 2] f32
    lids_ref,  # VMEM [N, 1] i32
    key_ref,  # VMEM out [1, TILE_R, TILE_C] i32
    *,
    n_chunks: int,
    h: int,
    w: int,
):
    tr = pl.program_id(1)
    tc = pl.program_id(2)
    rows = tr * TILE_R + jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 0)
    cols = tc * TILE_C + jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 1)
    py = rows.astype(jnp.float32) + (origin_ref[0] + 0.5)
    px = cols.astype(jnp.float32) + (origin_ref[1] + 0.5)
    P = TILE_R * TILE_C
    X = jnp.stack(
        [px.reshape(P), py.reshape(P), jnp.ones((P,), jnp.float32)], axis=0
    )  # [3, P]

    row_min = origin_ref[0] + tr * TILE_R + 0.5
    row_max = row_min + (TILE_R - 1)
    col_min = origin_ref[1] + tc * TILE_C + 0.5
    col_max = col_min + (TILE_C - 1)

    def body(c, acc):
        @pl.when(
            (chunk_bbox_ref[c, 1] >= row_min)
            & (chunk_bbox_ref[c, 0] <= row_max)
            & (chunk_bbox_ref[c, 3] >= col_min)
            & (chunk_bbox_ref[c, 2] <= col_max)
        )
        def _():
            A = coeffs_ref[pl.ds(c * CHUNK, CHUNK)].reshape(CHUNK * 4, 3)
            E = jnp.dot(
                A, X,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [4C, P]
            E4 = E.reshape(CHUNK, 4, P)
            covered = (E4[:, 0] >= 0.0) & (E4[:, 1] >= 0.0) & (E4[:, 2] >= 0.0)
            qlo = qrange_ref[pl.ds(c * CHUNK, CHUNK), 0][:, None]
            qhi = qrange_ref[pl.ds(c * CHUNK, CHUNK), 1][:, None]
            q = jnp.clip(E4[:, 3], qlo, qhi)
            qv = jnp.where(covered & (q > 0), q, 0.0)
            lid = lids_ref[pl.ds(c * CHUNK, CHUNK), 0][:, None]
            key = (jax.lax.bitcast_convert_type(qv, jnp.int32) & ~7) | lid
            key = jnp.where(qv > 0, key, -1)
            acc[:] = jnp.maximum(
                acc[:], jnp.max(key, axis=0).reshape(1, TILE_R, TILE_C)
            )

        return acc

    def run(acc):
        acc[:] = jnp.full((1, TILE_R, TILE_C), -1, jnp.int32)
        jax.lax.fori_loop(0, n_chunks, body, acc)
        # Mask pixels beyond the real image (tile padding).
        valid = (rows < h) & (cols < w)
        key_ref[:] = jnp.where(valid[None], acc[:], -1)

    pl.run_scoped(run, pltpu.VMEM((1, TILE_R, TILE_C), jnp.int32))


def _raster_kernel_batch(
    origin_ref,  # SMEM [2] f32 — (row0, col0) crop origin
    chunk_bbox_ref,  # SMEM [1, n_chunks, 4] f32 (per-candidate block)
    coeffs_ref,  # VMEM [1, N, 4, 3] f32 (per-candidate block)
    qrange_ref,  # VMEM [1, N, 2] f32
    lids_ref,  # VMEM [N, 1] i32 (shared)
    key_ref,  # VMEM out [1, TILE_R, TILE_C] i32
    *,
    n_chunks: int,
    h: int,
    w: int,
):
    """Candidate-batched fused rasterizer: grid (B, tr, tc).

    Identical math to ``_raster_kernel`` but the candidate axis lives in the
    kernel grid instead of an outer ``vmap`` of separate pallas_calls — one
    launch renders the whole candidate batch (VERDICT round-1 item 7)."""
    tr = pl.program_id(1)
    tc = pl.program_id(2)
    rows = tr * TILE_R + jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 0)
    cols = tc * TILE_C + jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 1)
    py = rows.astype(jnp.float32) + (origin_ref[0] + 0.5)
    px = cols.astype(jnp.float32) + (origin_ref[1] + 0.5)
    P = TILE_R * TILE_C
    X = jnp.stack(
        [px.reshape(P), py.reshape(P), jnp.ones((P,), jnp.float32)], axis=0
    )

    row_min = origin_ref[0] + tr * TILE_R + 0.5
    row_max = row_min + (TILE_R - 1)
    col_min = origin_ref[1] + tc * TILE_C + 0.5
    col_max = col_min + (TILE_C - 1)

    def body(c, acc):
        @pl.when(
            (chunk_bbox_ref[0, c, 1] >= row_min)
            & (chunk_bbox_ref[0, c, 0] <= row_max)
            & (chunk_bbox_ref[0, c, 3] >= col_min)
            & (chunk_bbox_ref[0, c, 2] <= col_max)
        )
        def _():
            A = coeffs_ref[0, pl.ds(c * CHUNK, CHUNK)].reshape(CHUNK * 4, 3)
            E = jnp.dot(
                A, X,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            E4 = E.reshape(CHUNK, 4, P)
            covered = (E4[:, 0] >= 0.0) & (E4[:, 1] >= 0.0) & (E4[:, 2] >= 0.0)
            qlo = qrange_ref[0, pl.ds(c * CHUNK, CHUNK), 0][:, None]
            qhi = qrange_ref[0, pl.ds(c * CHUNK, CHUNK), 1][:, None]
            q = jnp.clip(E4[:, 3], qlo, qhi)
            qv = jnp.where(covered & (q > 0), q, 0.0)
            lid = lids_ref[pl.ds(c * CHUNK, CHUNK), 0][:, None]
            key = (jax.lax.bitcast_convert_type(qv, jnp.int32) & ~7) | lid
            key = jnp.where(qv > 0, key, -1)
            acc[:] = jnp.maximum(
                acc[:], jnp.max(key, axis=0).reshape(1, TILE_R, TILE_C)
            )

        return acc

    def run(acc):
        acc[:] = jnp.full((1, TILE_R, TILE_C), -1, jnp.int32)
        jax.lax.fori_loop(0, n_chunks, body, acc)
        valid = (rows < h) & (cols < w)
        key_ref[:] = jnp.where(valid[None], acc[:], -1)

    pl.run_scoped(run, pltpu.VMEM((1, TILE_R, TILE_C), jnp.int32))


def _pad_tris(coeffs, qrange, vrange, link_ids, chunk=CHUNK):
    """Pad the triangle axis (last-but-batch) to a ``chunk`` multiple."""
    N = coeffs.shape[-3]
    pad = (-N) % chunk
    if pad:
        batch = coeffs.shape[:-3]
        dead = jnp.broadcast_to(
            jnp.array([0.0, 0.0, -1.0]), (*batch, pad, 4, 3)
        )
        coeffs = jnp.concatenate([coeffs, dead], axis=-3)
        qrange = jnp.concatenate(
            [qrange, jnp.zeros((*batch, pad, 2), qrange.dtype)], axis=-2
        )
        empty = jnp.broadcast_to(
            jnp.array([jnp.inf, -jnp.inf, jnp.inf, -jnp.inf]), (*batch, pad, 4)
        )
        vrange = jnp.concatenate([vrange, empty], axis=-2)
        link_ids = jnp.concatenate(
            [link_ids, jnp.zeros((pad,), link_ids.dtype)]
        )
    return coeffs, qrange, vrange, link_ids


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def rasterize_pallas_batch(
    coeffs: jnp.ndarray,  # [B, N, 4, 3]
    qrange: jnp.ndarray,  # [B, N, 2]
    vrange: jnp.ndarray,  # [B, N, 4]
    link_ids: jnp.ndarray,  # [N] int32 (shared across candidates)
    h: int,
    w: int,
    row0=0,
    col0=0,
    interpret: bool = False,
):
    """Candidate-batched rasterize: -> (depth [B, H, W], link_id [B, H, W]).

    One pallas_call with grid (B, tiles_r, tiles_c); per-launch overhead is
    amortised over the whole batch (vs. B separate launches via vmap)."""
    coeffs, qrange, vrange, link_ids = _pad_tris(coeffs, qrange, vrange, link_ids)
    B, Np = coeffs.shape[0], coeffs.shape[1]
    n_chunks = Np // CHUNK

    cb = vrange.reshape(B, n_chunks, CHUNK, 4)
    chunk_bbox = jnp.stack(
        [cb[..., 0].min(2), cb[..., 1].max(2), cb[..., 2].min(2), cb[..., 3].max(2)],
        axis=-1,
    )  # [B, n_chunks, 4]

    n_tr = -(-h // TILE_R)
    n_tc = -(-w // TILE_C)

    kernel = functools.partial(_raster_kernel_batch, n_chunks=n_chunks, h=h, w=w)
    origin = jnp.asarray(
        [jnp.asarray(row0, jnp.float32), jnp.asarray(col0, jnp.float32)]
    )
    keys = pl.pallas_call(
        kernel,
        grid=(B, n_tr, n_tc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, n_chunks, 4), lambda b, tr, tc: (b, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, Np, 4, 3), lambda b, tr, tc: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, Np, 2), lambda b, tr, tc: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_R, TILE_C), lambda b, tr, tc: (b, tr, tc),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_tr * TILE_R, n_tc * TILE_C), jnp.int32
        ),
        interpret=interpret,
    )(origin, chunk_bbox, coeffs, qrange, link_ids[:, None].astype(jnp.int32))

    kmax = keys[:, :h, :w]
    hit = kmax >= 0
    qmax = jax.lax.bitcast_convert_type(kmax & ~7, jnp.float32)
    depth = jnp.where(hit, 1.0 / jnp.maximum(qmax, 1e-12), 0.0)
    lid = jnp.where(hit, kmax & 7, -1)
    return depth, lid


NUM_PARTS = 18  # 5 xor + 5 sum|d| + 5 cnt + (sum, cnt, sum²) of global diff
_PARTS_LANES = 128  # lane-aligned partials row


ERR_TILE_R = 8  # row-tile height of the fused-error kernel's inner loop


def _raster_error_kernel(
    origin_ref,  # SMEM [3] f32 — row0, col0, tau (residual truncation)
    gbbox_ref,  # SMEM [1, 1, 4] f32 — per-candidate silhouette bbox
    chunk_bbox_ref,  # SMEM [1, n_chunks, 4] f32 (per-candidate block)
    coeffs_ref,  # VMEM [1, N, 12] f32 (per-candidate block, planar coefs)
    qrange_ref,  # VMEM [1, N, 2] f32
    lids_ref,  # VMEM [N, 1] i32 (shared)
    tmask_ref,  # VMEM [6, Hp, Wp] f32 — full target link masks (shared)
    tmasked_ref,  # VMEM [6, Hp, Wp] f32 — full target masked depth
    tdepth_ref,  # VMEM [Hp, Wp] f32 — full target body depth
    *rest,  # [tocc_ref,] parts_ref — occ plane present iff ``occl``
    n_chunks: int,
    h: int,
    w: int,
    hp: int,
    wp: int,
    occl: bool = False,
):
    """Fused raster + error reduction, ONE grid program per candidate.

    ``occl`` (static) enables the robust error's occlusion-aware mode:
    an extra VMEM occ plane (TargetBundle.occ semantics) grades the
    render-only xor/global charges by free-space violation — see
    ops.error.link_error.  Only valid with finite tau.

    Every term of the reference error (predict.py:475-509) decomposes as

        term = (target-only total over the frame)
             + (correction on render-covered pixels only)

    e.g. ``sum(|t_masked - d*rm|) = sum(t_masked) + sum_rm(|t_masked-d| -
    t_masked)`` — the kernel accumulates ONLY the corrections (the
    candidate-independent frame totals are added by the caller, which
    keeps every kernel operand either per-candidate or target-map-shaped
    and the call vmappable over batched targets), and the tile loop
    visits ONLY tiles intersecting the candidate's silhouette bbox
    (dynamic trip count from ``gbbox_ref``), adding corrections where the
    render actually lands.  The robot covers a small fraction of the
    frame, so per-candidate tile work tracks silhouette size, not image
    size — the inner loop of every descent stage.

    Edge/inverse-depth planes are evaluated as broadcast FMAs on the VPU:
    a K=3 MXU dot wastes ~98% of the systolic array and was measured ~2x
    slower than the elementwise form at these shapes.  The packed
    (inverse-depth | link-id) key uses 0 as the background sentinel (a
    covered pixel's key is >= 2^23; an empty slot's is its link id < 8),
    which drops a per-chunk select from the hot loop."""
    tocc_ref = rest[0] if occl else None
    parts_ref = rest[-1]
    R = ERR_TILE_R
    C = 128  # lane width — reshapes must keep 128 lanes (Mosaic layout rule)
    n_rt = hp // R
    n_ct = wp // C
    P = R * C

    def run(kacc, pacc):
        pacc[:] = jnp.zeros((1, 8, _PARTS_LANES), jnp.float32)

        o0 = origin_ref[0]
        o1 = origin_ref[1]
        tau = origin_ref[2]  # +inf = exact reference parity
        vmin = gbbox_ref[0, 0, 0]
        vmax = gbbox_ref[0, 0, 1]
        umin = gbbox_ref[0, 0, 2]
        umax = gbbox_ref[0, 0, 3]
        # Tile-index ranges intersecting the bbox.  Clamp in f32 BEFORE the
        # int cast: an off-screen candidate has an (inf, -inf) bbox, which
        # must clamp to an empty range, not overflow the cast.
        tr_lo = jnp.clip(jnp.ceil((vmin - o0 - 0.5 - (R - 1)) / R), 0.0, n_rt)
        tr_hi = jnp.clip(jnp.floor((vmax - o0 - 0.5) / R), -1.0, n_rt - 1.0)
        tc_lo = jnp.clip(jnp.ceil((umin - o1 - 0.5 - (C - 1)) / C), 0.0, n_ct)
        tc_hi = jnp.clip(jnp.floor((umax - o1 - 0.5) / C), -1.0, n_ct - 1.0)
        tr0 = tr_lo.astype(jnp.int32)
        tc0 = tc_lo.astype(jnp.int32)
        ntr = jnp.maximum(tr_hi.astype(jnp.int32) - tr0 + 1, 0)
        ntc = jnp.maximum(tc_hi.astype(jnp.int32) - tc0 + 1, 0)

        def tile(i, _):
            t_r = tr0 + i // jnp.maximum(ntc, 1)
            t_c = tc0 + i % jnp.maximum(ntc, 1)
            row_min = o0 + t_r.astype(jnp.float32) * R + 0.5
            row_max = row_min + (R - 1)
            col_min = o1 + t_c.astype(jnp.float32) * C + 0.5
            col_max = col_min + (C - 1)

            rows = t_r * R + jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
            cols = t_c * C + jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
            py = rows.astype(jnp.float32) + (o0 + 0.5)
            px = cols.astype(jnp.float32) + (o1 + 0.5)
            pxf = px.reshape(1, P)
            pyf = py.reshape(1, P)
            kacc[:] = jnp.zeros((R, C), jnp.int32)

            def chunk(c, _):
                @pl.when(
                    (chunk_bbox_ref[0, c, 1] >= row_min)
                    & (chunk_bbox_ref[0, c, 0] <= row_max)
                    & (chunk_bbox_ref[0, c, 3] >= col_min)
                    & (chunk_bbox_ref[0, c, 2] <= col_max)
                )
                def _():
                    A = coeffs_ref[0, pl.ds(c * ERR_CHUNK, ERR_CHUNK), :]
                    e0 = A[:, 0:1] * pxf + A[:, 1:2] * pyf + A[:, 2:3]
                    e1 = A[:, 3:4] * pxf + A[:, 4:5] * pyf + A[:, 5:6]
                    e2 = A[:, 6:7] * pxf + A[:, 7:8] * pyf + A[:, 8:9]
                    m = jnp.minimum(jnp.minimum(e0, e1), e2)
                    q = A[:, 9:10] * pxf + A[:, 10:11] * pyf + A[:, 11:12]
                    qlo = qrange_ref[0, pl.ds(c * ERR_CHUNK, ERR_CHUNK), 0][:, None]
                    qhi = qrange_ref[0, pl.ds(c * ERR_CHUNK, ERR_CHUNK), 1][:, None]
                    q = jnp.clip(q, qlo, qhi)
                    qv = jnp.where(m >= 0.0, q, 0.0)
                    lidv = lids_ref[pl.ds(c * ERR_CHUNK, ERR_CHUNK), 0][:, None]
                    # Background key = link id (< 8); any covered pixel's
                    # key is >= 2^23 (positive normal f32 bit pattern).
                    key = (jax.lax.bitcast_convert_type(qv, jnp.int32) & ~7) | lidv
                    kacc[:] = jnp.maximum(
                        kacc[:], jnp.max(key, axis=0).reshape(R, C)
                    )

                return 0

            jax.lax.fori_loop(0, n_chunks, chunk, 0)

            kmax = kacc[:]
            validpix = (rows < h) & (cols < w)
            hit = (kmax >= 8) & validpix
            hitf = hit.astype(jnp.float32)
            qmax = jax.lax.bitcast_convert_type(kmax & ~7, jnp.float32)
            depth = jnp.where(hit, 1.0 / jnp.maximum(qmax, 1e-12), 0.0)
            lid = kmax & 7
            rs_ = pl.ds(t_r * R, R)
            cs_ = pl.ds(t_c * C, C)

            # Corrections on render-covered pixels (see kernel docstring).
            corr = []
            rms = [(hit & (lid == li)).astype(jnp.float32) for li in range(1, 6)]
            if occl:
                # Graded render-only charge (free-space violation;
                # ops.error.link_error occlusion-aware mode).
                to = tocc_ref[rs_, cs_]
                cpx = jnp.where(
                    to < 0.0,
                    1.0,
                    jnp.where(
                        to > 0.0,
                        jnp.minimum(jnp.maximum(to - depth, 0.0), tau) / tau,
                        0.0,
                    ),
                )
            for li, rmf in zip(range(1, 6), rms):
                tm = tmask_ref[li, rs_, cs_]
                if occl:
                    corr.append(jnp.sum(rmf * ((1.0 - tm) * cpx - tm)))
                else:
                    corr.append(jnp.sum(rmf) - 2.0 * jnp.sum(rmf * tm))
            for li, rmf in zip(range(1, 6), rms):
                a = tmasked_ref[li, rs_, cs_]
                ad = jnp.abs(a - depth)
                # Truncated residuals (robust mode; tau=inf is parity):
                # sum(min(|t-d*rm|,tau)) = sum(min(t,tau)) [in base]
                #   + sum_rm(min(|t-d|,tau) - min(t,tau)).
                corr.append(
                    jnp.sum(rmf * (jnp.minimum(ad, tau) - jnp.minimum(a, tau)))
                )
            for li, rmf in zip(range(1, 6), rms):
                a = tmasked_ref[li, rs_, cs_]
                ad = jnp.abs(a - depth)
                corr.append(
                    jnp.sum(
                        rmf
                        * (
                            (ad != 0.0).astype(jnp.float32)
                            - (a != 0.0).astype(jnp.float32)
                        )
                    )
                )
            t = tdepth_ref[rs_, cs_]
            d = jnp.abs(t - depth)
            dt_, tt_ = jnp.minimum(d, tau), jnp.minimum(t, tau)
            if occl:
                g2 = jnp.where(
                    to < 0.0,
                    jnp.minimum(depth, tau),
                    jnp.where(
                        to > 0.0,
                        jnp.minimum(jnp.maximum(to - depth, 0.0), tau),
                        0.0,
                    ),
                )
                corr.append(jnp.sum(hitf * jnp.where(t > 0.0, dt_ - tt_, g2)))
            else:
                corr.append(jnp.sum(hitf * (dt_ - tt_)))
            corr.append(
                jnp.sum(
                    hitf
                    * (
                        (d != 0.0).astype(jnp.float32)
                        - (t != 0.0).astype(jnp.float32)
                    )
                )
            )
            corr.append(jnp.sum(hitf * (dt_ * dt_ - tt_ * tt_)))

            vec = jnp.stack(corr).reshape(1, 1, NUM_PARTS)
            vec = jnp.pad(
                vec, ((0, 0), (0, 7), (0, _PARTS_LANES - NUM_PARTS))
            )
            pacc[:] = pacc[:] + vec
            return 0

        jax.lax.fori_loop(0, ntr * ntc, tile, 0)
        parts_ref[:] = pacc[:]

    pl.run_scoped(
        run,
        pltpu.VMEM((R, C), jnp.int32),
        pltpu.VMEM((1, 8, _PARTS_LANES), jnp.float32),
    )


def _raster_error_kernel_hbm(
    origin_ref,  # SMEM [3] f32 — row0, col0, tau
    gbbox_ref,  # SMEM [1, 1, 4] f32 — per-candidate silhouette bbox
    chunk_bbox_ref,  # SMEM [1, n_chunks, 4] f32 (per-candidate block)
    coeffs_ref,  # VMEM [1, N, 12] f32 (per-candidate block, planar coefs)
    qrange_ref,  # VMEM [1, N, 2] f32
    lids_ref,  # VMEM [N, 1] i32 (shared)
    target_ref,  # ANY/HBM [11|12, Hp, Wp] f32 — stacked target planes:
    #   [0:5] link masks 1..5, [5:10] masked depth 1..5, [10] body depth,
    #   [11] occ plane (only when ``occl``)
    parts_ref,  # VMEM out [1, 8, _PARTS_LANES] f32
    *,
    n_chunks: int,
    h: int,
    w: int,
    hp: int,
    wp: int,
    occl: bool = False,
):
    """High-resolution variant of :func:`_raster_error_kernel`.

    Identical math and tile-culling structure, but the target maps live in
    HBM and each visited tile DMAs its [11, R, C] target block into VMEM
    scratch — VMEM use is O(tile), not O(frame), so the fused path scales
    to full-resolution targets (wp > 512) where whole-map residency
    doesn't fit.  The DMA is issued BEFORE the triangle chunk loop and
    awaited after it, so the ~45 KB fetch rides under the raster compute.
    Only silhouette-intersecting tiles are visited, so HBM traffic tracks
    silhouette size — the same property that makes the resident variant
    fast."""
    R = ERR_TILE_R
    C = 128
    n_rt = hp // R
    n_ct = wp // C
    P = R * C

    def run(kacc, tgt, dsem, pacc):
        pacc[:] = jnp.zeros((1, 8, _PARTS_LANES), jnp.float32)

        o0 = origin_ref[0]
        o1 = origin_ref[1]
        tau = origin_ref[2]
        vmin = gbbox_ref[0, 0, 0]
        vmax = gbbox_ref[0, 0, 1]
        umin = gbbox_ref[0, 0, 2]
        umax = gbbox_ref[0, 0, 3]
        tr_lo = jnp.clip(jnp.ceil((vmin - o0 - 0.5 - (R - 1)) / R), 0.0, n_rt)
        tr_hi = jnp.clip(jnp.floor((vmax - o0 - 0.5) / R), -1.0, n_rt - 1.0)
        tc_lo = jnp.clip(jnp.ceil((umin - o1 - 0.5 - (C - 1)) / C), 0.0, n_ct)
        tc_hi = jnp.clip(jnp.floor((umax - o1 - 0.5) / C), -1.0, n_ct - 1.0)
        tr0 = tr_lo.astype(jnp.int32)
        tc0 = tc_lo.astype(jnp.int32)
        ntr = jnp.maximum(tr_hi.astype(jnp.int32) - tr0 + 1, 0)
        ntc = jnp.maximum(tc_hi.astype(jnp.int32) - tc0 + 1, 0)

        def tile(i, _):
            t_r = tr0 + i // jnp.maximum(ntc, 1)
            t_c = tc0 + i % jnp.maximum(ntc, 1)
            row_min = o0 + t_r.astype(jnp.float32) * R + 0.5
            row_max = row_min + (R - 1)
            col_min = o1 + t_c.astype(jnp.float32) * C + 0.5
            col_max = col_min + (C - 1)

            # Fetch this tile's target block while the chunk loop rasters.
            dma = pltpu.make_async_copy(
                target_ref.at[:, pl.ds(t_r * R, R), pl.ds(t_c * C, C)],
                tgt,
                dsem,
            )
            dma.start()

            rows = t_r * R + jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
            cols = t_c * C + jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
            py = rows.astype(jnp.float32) + (o0 + 0.5)
            px = cols.astype(jnp.float32) + (o1 + 0.5)
            pxf = px.reshape(1, P)
            pyf = py.reshape(1, P)
            kacc[:] = jnp.zeros((R, C), jnp.int32)

            def chunk(c, _):
                @pl.when(
                    (chunk_bbox_ref[0, c, 1] >= row_min)
                    & (chunk_bbox_ref[0, c, 0] <= row_max)
                    & (chunk_bbox_ref[0, c, 3] >= col_min)
                    & (chunk_bbox_ref[0, c, 2] <= col_max)
                )
                def _():
                    A = coeffs_ref[0, pl.ds(c * ERR_CHUNK, ERR_CHUNK), :]
                    e0 = A[:, 0:1] * pxf + A[:, 1:2] * pyf + A[:, 2:3]
                    e1 = A[:, 3:4] * pxf + A[:, 4:5] * pyf + A[:, 5:6]
                    e2 = A[:, 6:7] * pxf + A[:, 7:8] * pyf + A[:, 8:9]
                    m = jnp.minimum(jnp.minimum(e0, e1), e2)
                    q = A[:, 9:10] * pxf + A[:, 10:11] * pyf + A[:, 11:12]
                    qlo = qrange_ref[0, pl.ds(c * ERR_CHUNK, ERR_CHUNK), 0][:, None]
                    qhi = qrange_ref[0, pl.ds(c * ERR_CHUNK, ERR_CHUNK), 1][:, None]
                    q = jnp.clip(q, qlo, qhi)
                    qv = jnp.where(m >= 0.0, q, 0.0)
                    lidv = lids_ref[pl.ds(c * ERR_CHUNK, ERR_CHUNK), 0][:, None]
                    key = (jax.lax.bitcast_convert_type(qv, jnp.int32) & ~7) | lidv
                    kacc[:] = jnp.maximum(
                        kacc[:], jnp.max(key, axis=0).reshape(R, C)
                    )

                return 0

            jax.lax.fori_loop(0, n_chunks, chunk, 0)
            dma.wait()

            kmax = kacc[:]
            validpix = (rows < h) & (cols < w)
            hit = (kmax >= 8) & validpix
            hitf = hit.astype(jnp.float32)
            qmax = jax.lax.bitcast_convert_type(kmax & ~7, jnp.float32)
            depth = jnp.where(hit, 1.0 / jnp.maximum(qmax, 1e-12), 0.0)
            lid = kmax & 7

            corr = []
            rms = [(hit & (lid == li)).astype(jnp.float32) for li in range(1, 6)]
            if occl:
                to = tgt[11]
                cpx = jnp.where(
                    to < 0.0,
                    1.0,
                    jnp.where(
                        to > 0.0,
                        jnp.minimum(jnp.maximum(to - depth, 0.0), tau) / tau,
                        0.0,
                    ),
                )
            for li, rmf in zip(range(1, 6), rms):
                tm = tgt[li - 1]
                if occl:
                    corr.append(jnp.sum(rmf * ((1.0 - tm) * cpx - tm)))
                else:
                    corr.append(jnp.sum(rmf) - 2.0 * jnp.sum(rmf * tm))
            for li, rmf in zip(range(1, 6), rms):
                a = tgt[4 + li]
                ad = jnp.abs(a - depth)
                corr.append(
                    jnp.sum(rmf * (jnp.minimum(ad, tau) - jnp.minimum(a, tau)))
                )
            for li, rmf in zip(range(1, 6), rms):
                a = tgt[4 + li]
                ad = jnp.abs(a - depth)
                corr.append(
                    jnp.sum(
                        rmf
                        * (
                            (ad != 0.0).astype(jnp.float32)
                            - (a != 0.0).astype(jnp.float32)
                        )
                    )
                )
            t = tgt[10]
            d = jnp.abs(t - depth)
            dt_, tt_ = jnp.minimum(d, tau), jnp.minimum(t, tau)
            if occl:
                g2 = jnp.where(
                    to < 0.0,
                    jnp.minimum(depth, tau),
                    jnp.where(
                        to > 0.0,
                        jnp.minimum(jnp.maximum(to - depth, 0.0), tau),
                        0.0,
                    ),
                )
                corr.append(jnp.sum(hitf * jnp.where(t > 0.0, dt_ - tt_, g2)))
            else:
                corr.append(jnp.sum(hitf * (dt_ - tt_)))
            corr.append(
                jnp.sum(
                    hitf
                    * (
                        (d != 0.0).astype(jnp.float32)
                        - (t != 0.0).astype(jnp.float32)
                    )
                )
            )
            corr.append(jnp.sum(hitf * (dt_ * dt_ - tt_ * tt_)))

            vec = jnp.stack(corr).reshape(1, 1, NUM_PARTS)
            vec = jnp.pad(
                vec, ((0, 0), (0, 7), (0, _PARTS_LANES - NUM_PARTS))
            )
            pacc[:] = pacc[:] + vec
            return 0

        jax.lax.fori_loop(0, ntr * ntc, tile, 0)
        parts_ref[:] = pacc[:]

    pl.run_scoped(
        run,
        pltpu.VMEM((ERR_TILE_R, 128), jnp.int32),
        pltpu.VMEM((12 if occl else 11, ERR_TILE_R, 128), jnp.float32),
        pltpu.SemaphoreType.DMA,
        pltpu.VMEM((1, 8, _PARTS_LANES), jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def rasterize_error_pallas(
    coeffs: jnp.ndarray,  # [B, N, 4, 3]
    qrange: jnp.ndarray,  # [B, N, 2]
    vrange: jnp.ndarray,  # [B, N, 4]
    link_ids: jnp.ndarray,  # [N] int32
    tmask: jnp.ndarray,  # [6, H, W] target link masks (bool or f32)
    tmasked: jnp.ndarray,  # [6, H, W] f32 target masked depth
    tdepth: jnp.ndarray,  # [H, W] f32 target body depth
    h: int,
    w: int,
    row0=0,
    col0=0,
    tau=None,
    tocc=None,  # [H, W] f32 occ plane (TargetBundle.occ) or None
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused render-and-reduce: -> error partials [B, NUM_PARTS].

    Combine with :func:`ropes3d_tpu.ops.error.link_error_from_parts` for the
    exact reference error.  Compared to rasterize + link_error this saves
    the full [B, H, W] HBM round trip and all the separate reduction
    kernels, and issues exactly ONE grid program per candidate — the eval
    inside descent loops collapses to a single cheap launch.

    ``tau`` truncates depth residuals at ``min(|diff|, tau)`` (robust mode
    for neural-segmented targets, see ops.error.link_error); ``None`` is
    bit-exact reference parity (internally +inf — every ``min`` is then an
    identity).  ``tocc`` (requires finite tau) enables the occlusion-aware
    robust mode: render-only charges are graded by free-space violation
    against the occ plane (TargetBundle.occ semantics) — identical math to
    ops.error.link_error's occlusion-aware branch.

    Backend selection by resolution: up to padded width 512 the target
    maps are VMEM-resident (one upfront block load, zero per-tile DMA);
    beyond that the streaming variant keeps them in HBM and DMAs each
    visited silhouette tile — same culling, O(tile) VMEM, any
    resolution."""
    occl = tocc is not None and tau is not None
    tau = jnp.float32(jnp.inf if tau is None else tau)
    coeffs, qrange, vrange, link_ids = _pad_tris(
        coeffs, qrange, vrange, link_ids, chunk=ERR_CHUNK
    )
    B, Np = coeffs.shape[0], coeffs.shape[1]
    n_chunks = Np // ERR_CHUNK

    cb = vrange.reshape(B, n_chunks, ERR_CHUNK, 4)
    chunk_bbox = jnp.stack(
        [cb[..., 0].min(2), cb[..., 1].max(2), cb[..., 2].min(2), cb[..., 3].max(2)],
        axis=-1,
    )

    # Per-candidate silhouette bbox for whole-tile culling (empty rows are
    # +inf/-inf sentinels from triangle_setup and never win the min/max).
    gbbox = jnp.stack(
        [
            vrange[..., 0].min(1), vrange[..., 1].max(1),
            vrange[..., 2].min(1), vrange[..., 3].max(1),
        ],
        axis=-1,
    )[:, None, :]  # [B, 1, 4] (middle axis: SMEM trailing-dims block rule)

    hp = -(-h // ERR_TILE_R) * ERR_TILE_R
    wp = -(-w // 128) * 128
    resident = wp <= 512  # whole-map VMEM residency budget; else stream
    tmask = jnp.pad(
        tmask.astype(jnp.float32), ((0, 0), (0, hp - h), (0, wp - w))
    )
    tmasked = jnp.pad(
        tmasked.astype(jnp.float32), ((0, 0), (0, hp - h), (0, wp - w))
    )
    tdepth = jnp.pad(tdepth.astype(jnp.float32), ((0, hp - h), (0, wp - w)))
    if occl:
        # Pad value 0 = "no evidence" — padded pixels are never hit anyway.
        tocc = jnp.pad(tocc.astype(jnp.float32), ((0, hp - h), (0, wp - w)))

    # Whole-frame target-only partials: what every error term reduces to on
    # an empty render.  The kernel starts its accumulator here and adds
    # corrections only where the candidate's silhouette lands — candidate-
    # independent, computed once per eval call.
    tdep_t = jnp.minimum(tdepth, tau)
    base = jnp.stack(
        [jnp.sum(tmask[li]) for li in range(1, 6)]
        + [
            jnp.sum(jnp.minimum(jnp.abs(tmasked[li]), tau))
            for li in range(1, 6)
        ]
        + [
            jnp.sum((tmasked[li] != 0.0).astype(jnp.float32))
            for li in range(1, 6)
        ]
        + [
            jnp.sum(tdep_t),
            jnp.sum((tdepth != 0.0).astype(jnp.float32)),
            jnp.sum(tdep_t * tdep_t),
        ],
    )  # [NUM_PARTS]

    origin = jnp.asarray(
        [jnp.asarray(row0, jnp.float32), jnp.asarray(col0, jnp.float32), tau]
    )
    common_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (1, 1, 4), lambda b: (b, 0, 0), memory_space=pltpu.SMEM
        ),
        pl.BlockSpec(
            (1, n_chunks, 4), lambda b: (b, 0, 0),
            memory_space=pltpu.SMEM,
        ),
        pl.BlockSpec(
            (1, Np, 12), lambda b: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, Np, 2), lambda b: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    common_args = (
        origin, gbbox, chunk_bbox, coeffs.reshape(B, Np, 12), qrange,
        link_ids[:, None].astype(jnp.int32),
    )
    if resident:
        kernel = functools.partial(
            _raster_error_kernel, n_chunks=n_chunks, h=h, w=w, hp=hp, wp=wp,
            occl=occl,
        )
        tgt_specs = [
            pl.BlockSpec(memory_space=pltpu.VMEM)
            for _ in range(4 if occl else 3)
        ]
        tgt_args = (tmask, tmasked, tdepth) + ((tocc,) if occl else ())
    else:
        kernel = functools.partial(
            _raster_error_kernel_hbm, n_chunks=n_chunks, h=h, w=w, hp=hp,
            wp=wp, occl=occl,
        )
        # Stacked target planes stay in HBM; the kernel DMAs per-tile
        # blocks (indices 1..5 of masks/masked are the scored links).
        target_hbm = jnp.concatenate(
            [tmask[1:6], tmasked[1:6], tdepth[None]]
            + ([tocc[None]] if occl else []),
            axis=0,
        )
        tgt_specs = [pl.BlockSpec(memory_space=pl.ANY)]
        tgt_args = (target_hbm,)
    parts = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=common_specs + tgt_specs,
        out_specs=pl.BlockSpec(
            (1, 8, _PARTS_LANES), lambda b: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, 8, _PARTS_LANES), jnp.float32),
        interpret=interpret,
    )(*common_args, *tgt_args)
    # Candidate-independent frame totals are added OUTSIDE the kernel: a
    # plain XLA add vmaps trivially when the target (and thus ``base``) is
    # batched — a [k, NUM_PARTS] SMEM operand would not lower (Squeezed
    # leading block, hypothesis/frame-batched stepwise paths).
    return parts[:, 0, :NUM_PARTS] + base[None]


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def rasterize_pallas(
    coeffs: jnp.ndarray,  # [N, 4, 3]
    qrange: jnp.ndarray,  # [N, 2]
    vrange: jnp.ndarray,  # [N, 4] screen bbox (vmin, vmax, umin, umax)
    link_ids: jnp.ndarray,  # [N] int32
    h: int,
    w: int,
    row0=0,
    col0=0,
    interpret: bool = False,
):
    """Single-candidate fused rasterize: -> (depth [H, W], link_id [H, W])."""
    N = coeffs.shape[0]
    pad = (-N) % CHUNK
    if pad:
        coeffs = jnp.concatenate(
            [coeffs, jnp.tile(jnp.array([0.0, 0.0, -1.0]), (pad, 4, 1))], 0
        )
        qrange = jnp.concatenate([qrange, jnp.zeros((pad, 2))], 0)
        vrange = jnp.concatenate(
            [
                vrange,
                jnp.tile(
                    jnp.array([jnp.inf, -jnp.inf, jnp.inf, -jnp.inf]), (pad, 1)
                ),
            ],
            0,
        )
        link_ids = jnp.concatenate([link_ids, jnp.zeros((pad,), link_ids.dtype)])
    n_chunks = coeffs.shape[0] // CHUNK

    cb = vrange.reshape(n_chunks, CHUNK, 4)
    chunk_bbox = jnp.stack(
        [cb[..., 0].min(1), cb[..., 1].max(1), cb[..., 2].min(1), cb[..., 3].max(1)],
        axis=-1,
    )  # [n_chunks, 4]

    n_tr = -(-h // TILE_R)
    n_tc = -(-w // TILE_C)

    kernel = functools.partial(_raster_kernel, n_chunks=n_chunks, h=h, w=w)
    origin = jnp.asarray(
        [jnp.asarray(row0, jnp.float32), jnp.asarray(col0, jnp.float32)]
    )
    keys = pl.pallas_call(
        kernel,
        grid=(1, n_tr, n_tc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_R, TILE_C), lambda b, tr, tc: (0, tr, tc),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((1, n_tr * TILE_R, n_tc * TILE_C), jnp.int32),
        interpret=interpret,
    )(origin, chunk_bbox, coeffs, qrange, link_ids[:, None].astype(jnp.int32))

    kmax = keys[0, :h, :w]
    hit = kmax >= 0
    qmax = jax.lax.bitcast_convert_type(kmax & ~7, jnp.float32)
    depth = jnp.where(hit, 1.0 / jnp.maximum(qmax, 1e-12), 0.0)
    lid = jnp.where(hit, kmax & 7, -1)
    return depth, lid
