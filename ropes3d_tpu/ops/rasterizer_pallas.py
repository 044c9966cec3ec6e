"""Fused Pallas TPU rasterizer.

Same math as the XLA backend (``rasterizer.py``) but fused into one kernel:
per (candidate, pixel-tile) grid cell, the triangle-coefficient matrix stays
in VMEM, edge/inverse-depth planes are evaluated as ``[4C, 3] @ [3, P_tile]``
MXU dots, and the packed (inverse-depth | link-id) key max-reduction happens
in registers — the [N, P] intermediate never exists.

Chunk-level culling: triangles are processed in chunks of ``CHUNK``; a chunk
whose screen-row extent (from ``triangle_setup``'s vrange) misses the pixel
tile's row band is skipped with ``pl.when``.  Mesh-local triangle ordering
makes chunks spatially coherent, so most chunks skip most tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 64  # triangles per inner step (empirically best on v5e)
TILE = 512  # pixels per grid cell (empirically best on v5e)


def _raster_kernel(
    origin_ref,  # SMEM [2] f32 — (row0, col0) crop origin
    chunk_rows_ref,  # SMEM [n_chunks, 2] f32 — chunk screen-row ranges
    coeffs_ref,  # VMEM [N, 4, 3] f32
    qrange_ref,  # VMEM [N, 2] f32
    lids_ref,  # VMEM [N, 1] i32
    key_ref,  # VMEM out [1, TILE] i32
    *,
    n_chunks: int,
    w: int,
    p_valid: int,
):
    t = pl.program_id(1)
    flat = t * TILE + jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
    px = (flat % w).astype(jnp.float32) + (origin_ref[1] + 0.5)
    py = (flat // w).astype(jnp.float32) + (origin_ref[0] + 0.5)
    X = jnp.concatenate([px, py, jnp.ones((1, TILE), jnp.float32)], axis=0)  # [3, TILE]

    tile_row_min = py[0, 0]
    tile_row_max = py[0, TILE - 1]

    def body(c, acc):
        @pl.when(
            (chunk_rows_ref[c, 1] >= tile_row_min)
            & (chunk_rows_ref[c, 0] <= tile_row_max)
        )
        def _():
            A = coeffs_ref[pl.ds(c * CHUNK, CHUNK)].reshape(CHUNK * 4, 3)
            E = jnp.dot(
                A, X,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [4C, TILE]
            E4 = E.reshape(CHUNK, 4, TILE)
            covered = (
                (E4[:, 0] >= 0.0) & (E4[:, 1] >= 0.0) & (E4[:, 2] >= 0.0)
            )  # [C, TILE]
            qlo = qrange_ref[pl.ds(c * CHUNK, CHUNK), 0][:, None]
            qhi = qrange_ref[pl.ds(c * CHUNK, CHUNK), 1][:, None]
            q = jnp.clip(E4[:, 3], qlo, qhi)
            qv = jnp.where(covered & (q > 0), q, 0.0)
            lid = lids_ref[pl.ds(c * CHUNK, CHUNK), 0][:, None]
            key = (jax.lax.bitcast_convert_type(qv, jnp.int32) & ~7) | lid
            key = jnp.where(qv > 0, key, -1)
            acc[:] = jnp.maximum(acc[:], jnp.max(key, axis=0, keepdims=True))

        return acc

    def run(acc):
        acc[:] = jnp.full((1, TILE), -1, jnp.int32)
        jax.lax.fori_loop(0, n_chunks, body, acc)
        # Mask pixels beyond the real image (padding of the last tile).
        key_ref[:] = jnp.where(flat < p_valid, acc[:], -1)

    pl.run_scoped(run, pltpu.VMEM((1, TILE), jnp.int32))


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def rasterize_pallas(
    coeffs: jnp.ndarray,  # [N, 4, 3]
    qrange: jnp.ndarray,  # [N, 2]
    vrange: jnp.ndarray,  # [N, 2] screen-row extents
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
            [vrange, jnp.tile(jnp.array([jnp.inf, -jnp.inf]), (pad, 1))], 0
        )
        link_ids = jnp.concatenate([link_ids, jnp.zeros((pad,), link_ids.dtype)])
    n_chunks = coeffs.shape[0] // CHUNK

    chunk_rows = jnp.stack(
        [
            vrange[:, 0].reshape(n_chunks, CHUNK).min(1),
            vrange[:, 1].reshape(n_chunks, CHUNK).max(1),
        ],
        axis=-1,
    )  # [n_chunks, 2]

    P = h * w
    n_tiles = -(-P // TILE)

    kernel = functools.partial(
        _raster_kernel,
        n_chunks=n_chunks,
        w=w,
        p_valid=P,
    )
    origin = jnp.asarray(
        [jnp.asarray(row0, jnp.float32), jnp.asarray(col0, jnp.float32)]
    )
    keys = pl.pallas_call(
        kernel,
        grid=(1, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE), lambda b, t: (0, t), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, n_tiles * TILE), jnp.int32),
        interpret=interpret,
    )(origin, chunk_rows, coeffs, qrange, link_ids[:, None].astype(jnp.int32))

    kmax = keys[0, :P]
    hit = kmax >= 0
    qmax = jax.lax.bitcast_convert_type(kmax & ~7, jnp.float32)
    depth = jnp.where(hit, 1.0 / jnp.maximum(qmax, 1e-12), 0.0)
    lid = jnp.where(hit, kmax & 7, -1)
    return depth.reshape(h, w), lid.reshape(h, w)
