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

CHUNK = 32  # triangles per inner step (empirically best on v5e: larger
# chunks coarsen bbox culling and lose more than the loop rounds save)
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


def _pad_tris(coeffs, qrange, vrange, link_ids):
    """Pad the triangle axis (last-but-batch) to a CHUNK multiple."""
    N = coeffs.shape[-3]
    pad = (-N) % CHUNK
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
    origin_ref,  # SMEM [2] f32
    gbbox_ref,  # SMEM [1, 1, 4] f32 — per-candidate silhouette bbox
    chunk_bbox_ref,  # SMEM [1, n_chunks, 4] f32 (per-candidate block)
    tonly_ref,  # SMEM [n_tiles, NUM_PARTS] f32 — empty-render tile partials
    coeffs_ref,  # VMEM [1, N, 4, 3] f32 (per-candidate block)
    qrange_ref,  # VMEM [1, N, 2] f32
    lids_ref,  # VMEM [N, 1] i32 (shared)
    tmask_ref,  # VMEM [6, Hp, Wp] f32 — full target link masks (shared)
    tmasked_ref,  # VMEM [6, Hp, Wp] f32 — full target masked depth
    tdepth_ref,  # VMEM [Hp, Wp] f32 — full target body depth
    parts_ref,  # VMEM out [1, 8, _PARTS_LANES] f32
    *,
    n_chunks: int,
    h: int,
    w: int,
    hp: int,
    wp: int,
):
    """Fused raster + error reduction, ONE grid program per candidate.

    The row-tile loop lives *inside* the kernel (fori over ``hp/ERR_TILE_R``
    stripes of the full padded width), so per-candidate cost is one grid
    step instead of ~24 — grid-program switch overhead dominated the
    small-batch evals that descent loops issue.  Every term of the
    reference error (predict.py:475-509) is a linear pixel reduction, so
    stripe-local sums accumulate exactly.  The [H, W] depth/link-id maps
    never leave VMEM.

    Tiles outside the candidate's silhouette bbox (``gbbox_ref``) skip all
    raster/reduction work and add the precomputed empty-render target
    partials (``tonly_ref``) instead — exact, because every error term on
    an empty tile reduces to a target-only sum.  The robot covers a small
    fraction of the frame, so this cuts the per-candidate tile work ~3x
    (the inner loop of every descent stage)."""
    R = ERR_TILE_R
    C = 128  # lane width — reshapes must keep 128 lanes (Mosaic layout rule)
    n_rt = hp // R
    n_ct = wp // C
    P = R * C

    def run(kacc, pacc):
        pacc[:] = jnp.zeros((1, 8, _PARTS_LANES), jnp.float32)

        def tile(t, _):
            t_r = t // n_ct
            t_c = t % n_ct
            row_min = origin_ref[0] + t_r.astype(jnp.float32) * R + 0.5
            row_max = row_min + (R - 1)
            col_min = origin_ref[1] + t_c.astype(jnp.float32) * C + 0.5
            col_max = col_min + (C - 1)
            covered_tile = (
                (gbbox_ref[0, 0, 1] >= row_min)
                & (gbbox_ref[0, 0, 0] <= row_max)
                & (gbbox_ref[0, 0, 3] >= col_min)
                & (gbbox_ref[0, 0, 2] <= col_max)
            )

            @pl.when(jnp.logical_not(covered_tile))
            def _skip():
                vals = jnp.stack(
                    [tonly_ref[t, i] for i in range(NUM_PARTS)]
                ).reshape(1, 1, NUM_PARTS)
                pacc[:] = pacc[:] + jnp.pad(
                    vals, ((0, 0), (0, 7), (0, _PARTS_LANES - NUM_PARTS))
                )

            @pl.when(covered_tile)
            def _render_tile():
                _tile_body(t_r, t_c, row_min, row_max, col_min, col_max)

            return 0

        def _tile_body(t_r, t_c, row_min, row_max, col_min, col_max):
            rows = t_r * R + jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
            cols = t_c * C + jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
            py = rows.astype(jnp.float32) + (origin_ref[0] + 0.5)
            px = cols.astype(jnp.float32) + (origin_ref[1] + 0.5)
            X = jnp.stack(
                [px.reshape(P), py.reshape(P), jnp.ones((P,), jnp.float32)],
                axis=0,
            )
            kacc[:] = jnp.full((R, C), -1, jnp.int32)

            def chunk(c, _):
                @pl.when(
                    (chunk_bbox_ref[0, c, 1] >= row_min)
                    & (chunk_bbox_ref[0, c, 0] <= row_max)
                    & (chunk_bbox_ref[0, c, 3] >= col_min)
                    & (chunk_bbox_ref[0, c, 2] <= col_max)
                )
                def _():
                    A = coeffs_ref[0, pl.ds(c * CHUNK, CHUNK)].reshape(
                        CHUNK * 4, 3
                    )
                    E = jnp.dot(
                        A, X,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    E4 = E.reshape(CHUNK, 4, P)
                    covered = (
                        (E4[:, 0] >= 0.0) & (E4[:, 1] >= 0.0) & (E4[:, 2] >= 0.0)
                    )
                    qlo = qrange_ref[0, pl.ds(c * CHUNK, CHUNK), 0][:, None]
                    qhi = qrange_ref[0, pl.ds(c * CHUNK, CHUNK), 1][:, None]
                    q = jnp.clip(E4[:, 3], qlo, qhi)
                    qv = jnp.where(covered & (q > 0), q, 0.0)
                    lidv = lids_ref[pl.ds(c * CHUNK, CHUNK), 0][:, None]
                    key = (jax.lax.bitcast_convert_type(qv, jnp.int32) & ~7) | lidv
                    key = jnp.where(qv > 0, key, -1)
                    kacc[:] = jnp.maximum(
                        kacc[:], jnp.max(key, axis=0).reshape(R, C)
                    )

                return 0

            jax.lax.fori_loop(0, n_chunks, chunk, 0)

            kmax = kacc[:]
            validpix = (rows < h) & (cols < w)
            hit = (kmax >= 0) & validpix
            qmax = jax.lax.bitcast_convert_type(kmax & ~7, jnp.float32)
            depth = jnp.where(hit, 1.0 / jnp.maximum(qmax, 1e-12), 0.0)
            lid = jnp.where(hit, kmax & 7, -1)
            vp = validpix.astype(jnp.float32)
            rs_ = pl.ds(t_r * R, R)
            cs_ = pl.ds(t_c * C, C)

            partials = []
            # Per-link terms for links 1..5 (base never scored, error.py).
            for li in range(1, 6):
                rm = lid == li
                tm = tmask_ref[li, rs_, cs_] > 0.0
                partials.append(jnp.sum(jnp.where(rm != tm, vp, 0.0)))
            for li in range(1, 6):
                rm = lid == li
                adiff = jnp.abs(tmasked_ref[li, rs_, cs_] - depth * rm)
                nz = (adiff != 0.0) & validpix
                partials.append(jnp.sum(jnp.where(nz, adiff, 0.0)))
            for li in range(1, 6):
                rm = lid == li
                adiff = jnp.abs(tmasked_ref[li, rs_, cs_] - depth * rm)
                partials.append(
                    jnp.sum(((adiff != 0.0) & validpix).astype(jnp.float32))
                )
            # Global diff terms (zeros contribute nothing to the sums).
            diff = jnp.abs(tdepth_ref[rs_, cs_] - depth) * vp
            partials.append(jnp.sum(diff))
            partials.append(jnp.sum((diff != 0.0).astype(jnp.float32)))
            partials.append(jnp.sum(diff * diff))

            vec = jnp.stack(partials).reshape(1, 1, NUM_PARTS)
            vec = jnp.pad(
                vec, ((0, 0), (0, 7), (0, _PARTS_LANES - NUM_PARTS))
            )
            pacc[:] = pacc[:] + vec

        jax.lax.fori_loop(0, n_rt * n_ct, tile, 0)
        parts_ref[:] = pacc[:]

    pl.run_scoped(
        run,
        pltpu.VMEM((R, C), jnp.int32),
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
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused render-and-reduce: -> error partials [B, NUM_PARTS].

    Combine with :func:`ropes3d_tpu.ops.error.link_error_from_parts` for the
    exact reference error.  Compared to rasterize + link_error this saves
    the full [B, H, W] HBM round trip and all the separate reduction
    kernels, and issues exactly ONE grid program per candidate — the eval
    inside descent loops collapses to a single cheap launch.

    Sized for working resolutions (padded width <= 512); callers fall back
    to rasterize + link_error beyond that."""
    coeffs, qrange, vrange, link_ids = _pad_tris(coeffs, qrange, vrange, link_ids)
    B, Np = coeffs.shape[0], coeffs.shape[1]
    n_chunks = Np // CHUNK

    cb = vrange.reshape(B, n_chunks, CHUNK, 4)
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
    assert wp <= 512, "fused-error kernel is for working resolutions"
    tmask = jnp.pad(
        tmask.astype(jnp.float32), ((0, 0), (0, hp - h), (0, wp - w))
    )
    tmasked = jnp.pad(
        tmasked.astype(jnp.float32), ((0, 0), (0, hp - h), (0, wp - w))
    )
    tdepth = jnp.pad(tdepth.astype(jnp.float32), ((0, hp - h), (0, wp - w)))

    # Empty-render target-only partials per tile: what every error term
    # reduces to on a tile the candidate's silhouette misses.  Candidate-
    # independent — computed once per eval call, tiny [n_tiles, NUM_PARTS].
    n_rt, n_ct = hp // ERR_TILE_R, wp // 128

    def tile_sums(x):  # [hp, wp] -> [n_tiles]
        return x.reshape(n_rt, ERR_TILE_R, n_ct, 128).sum((1, 3)).reshape(-1)

    tonly = jnp.stack(
        [tile_sums(tmask[li]) for li in range(1, 6)]
        + [tile_sums(jnp.abs(tmasked[li])) for li in range(1, 6)]
        + [
            tile_sums((tmasked[li] != 0.0).astype(jnp.float32))
            for li in range(1, 6)
        ]
        + [
            tile_sums(tdepth),
            tile_sums((tdepth != 0.0).astype(jnp.float32)),
            tile_sums(tdepth * tdepth),
        ],
        axis=-1,
    )  # [n_tiles, NUM_PARTS]

    kernel = functools.partial(
        _raster_error_kernel, n_chunks=n_chunks, h=h, w=w, hp=hp, wp=wp
    )
    origin = jnp.asarray(
        [jnp.asarray(row0, jnp.float32), jnp.asarray(col0, jnp.float32)]
    )
    parts = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 1, 4), lambda b: (b, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, n_chunks, 4), lambda b: (b, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, Np, 4, 3), lambda b: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, Np, 2), lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, _PARTS_LANES), lambda b: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, 8, _PARTS_LANES), jnp.float32),
        interpret=interpret,
    )(
        origin, gbbox, chunk_bbox, tonly, coeffs, qrange,
        link_ids[:, None].astype(jnp.int32), tmask, tmasked, tdepth,
    )
    return parts[:, 0, :NUM_PARTS]


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
