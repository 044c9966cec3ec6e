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

CHUNK = 64  # triangles per inner step (empirically best on v5e)
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
