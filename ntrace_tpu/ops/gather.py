"""Paged one-hot MXU row-gather -- a documented NEGATIVE result.

Hypothesis: XLA TPU row gathers (~8 ns/row, PERF_NOTES.md) could be beaten
by rebuilding gather from sort + scan + int8 one-hot matmuls on the MXU.
Measured on the real v5e (scalar-out chained protocol): bit-exact but
~111 ms per 1M rows vs XLA's ~8 ms -- 14x SLOWER, dominated by per-tile
grid-step overhead at the (1024,512)x(512,64) shapes a 16-column record
table forces. KEPT (tested, working) as the measured baseline for future
revisits with fused multi-tile kernels; do NOT wire it into engines as-is.

The mechanism:

  1. sort (idx, slot) pairs by row id            (lax.sort: ~0.05 ms / 1M)
  2. group sorted items into tiles that each touch ONE page of the table
     (pure elementwise + cumsum planning, scatters for placement)
  3. a Pallas kernel per tile: one-hot(within-page idx) @ page-block on the
     MXU. The table is pre-split into 4 int8 byte planes laid out
     (N, 4*C) = [b0 | b1 | b2 | b3], so the int8 matmul reconstructs f32
     BIT-EXACTLY (one-hot x byte == byte; i32 accumulation exact)
  4. scatter rows back to request order (fast on TPU)

The result equals table[idx] bit-for-bit. This is the reference's
"texture fetch" equivalent (CudaTracerKernels fetch macros) redesigned for
a machine whose fast paths are sort, scan, scatter, and matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def split_table_bytes(table: jnp.ndarray) -> jnp.ndarray:
    """(N, C) f32 -> (N, 4C) i8 byte planes [b0 | b1 | b2 | b3] (le order)."""
    bits = jax.lax.bitcast_convert_type(table, jnp.int32)
    planes = [((bits >> (8 * k)) & 0xFF).astype(jnp.int8) for k in range(4)]
    return jnp.concatenate(planes, axis=1)


def _gather_kernel(tile_page_ref, wi_ref, table_ref, out_ref, *, tile, page, c4):
    """One tile: rows = one-hot(wi) @ page_block, int8 MXU, exact bytes."""
    wi = wi_ref[:].reshape(tile, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile, page), 1)
    oh = (cols == wi).astype(jnp.int8)
    out_ref[:] = jax.lax.dot_general(
        oh, table_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _reassemble(out_i32, c):
    """(P, 4C) i32 byte columns -> (P, C) f32 bit-exact."""
    b0 = out_i32[:, 0 * c:1 * c] & 0xFF
    b1 = out_i32[:, 1 * c:2 * c] & 0xFF
    b2 = out_i32[:, 2 * c:3 * c] & 0xFF
    b3 = out_i32[:, 3 * c:4 * c] & 0xFF
    bits = b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("n_rows", "c", "page", "tile", "interpret")
)
def paged_gather_bytes(table_bytes, idx, *, n_rows, c, page=512, tile=1024,
                       interpret=False):
    """table_bytes (Np, 4C) i8 (pre-split, padded to page multiple),
    idx (Q,) i32 in [0, n_rows) -> (Q, C) f32 == original table[idx].

    Q must be a multiple of `tile` (pad with any valid index and drop).
    """
    q = idx.shape[0]
    assert q % tile == 0, "pad idx to a tile multiple"
    n_pages = table_bytes.shape[0] // page
    c4 = 4 * c

    pg = idx >> int(np.log2(page))
    wi = idx & (page - 1)
    slot = jnp.arange(q, dtype=jnp.int32)

    # Group by page (stable, so within-page order follows request order).
    pg_s, wi_s, slot_s = jax.lax.sort((pg, wi, slot), num_keys=1)

    # Tile placement: item j starts a new tile iff it begins a page run or
    # its within-run rank hits a tile boundary.
    j = jnp.arange(q, dtype=jnp.int32)
    boundary = jnp.concatenate([
        jnp.ones((1,), jnp.bool_), pg_s[1:] != pg_s[:-1]
    ])
    run_start = jax.lax.cummax(jnp.where(boundary, j, 0))
    rank = j - run_start
    new_tile = boundary | (rank % tile == 0)
    tile_id = jnp.cumsum(new_tile.astype(jnp.int32)) - 1
    dest = tile_id * tile + (rank % tile)

    # Static capacity: every page can waste at most one partial tile.
    n_tiles = q // tile + n_pages
    cap = n_tiles * tile

    wi_pad = jnp.zeros((cap,), jnp.int32).at[dest].set(wi_s)
    slot_pad = jnp.full((cap,), -1, jnp.int32).at[dest].set(slot_s)
    tile_page = jnp.zeros((n_tiles,), jnp.int32).at[tile_id].set(pg_s)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            # 1D s32 operands must use 1024-element blocks (Mosaic tiling).
            pl.BlockSpec((tile,), lambda i, tp: (i,)),
            pl.BlockSpec((page, c4), lambda i, tp: (tp[i], 0)),
        ],
        out_specs=pl.BlockSpec((tile, c4), lambda i, tp: (i, 0)),
    )
    out_i32 = pl.pallas_call(
        functools.partial(_gather_kernel, tile=tile, page=page, c4=c4),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cap, c4), jnp.int32),
        interpret=interpret,
    )(tile_page, wi_pad, table_bytes)

    rows = _reassemble(out_i32, c)
    # Scatter back to request order; dead slots (-1) dropped via OOB.
    safe_slot = jnp.where(slot_pad < 0, q, slot_pad)
    return jnp.zeros((q, c), jnp.float32).at[safe_slot].set(rows, mode="drop")


class GatherTable:
    """Pre-split table wrapper: build once, gather many times."""

    def __init__(self, table: np.ndarray, page: int = 512, tile: int = 1024):
        table = jnp.asarray(table, jnp.float32)
        self.n_rows, self.c = int(table.shape[0]), int(table.shape[1])
        self.page = page
        self.tile = tile
        n_pages = -(-self.n_rows // page)
        padded = jnp.zeros((n_pages * page, self.c), jnp.float32)
        padded = padded.at[: self.n_rows].set(table)
        self.bytes = split_table_bytes(padded)

    def __call__(self, idx: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
        q = idx.shape[0]
        qp = -(-q // self.tile) * self.tile
        if qp != q:
            idx = jnp.concatenate([
                idx, jnp.zeros((qp - q,), jnp.int32)
            ])
        out = paged_gather_bytes(
            self.bytes, idx, n_rows=self.n_rows, c=self.c,
            page=self.page, tile=self.tile, interpret=interpret,
        )
        return out[:q]
