"""Tile binning: instance duplication + depth sort + tile ranges (JAX/XLA).

The TPU-native replacement for the CUB pipeline in the reference
(rasterizer_impl.cu:290-334: inclusive scan -> duplicateWithKeys -> radix
sort on (tileID | depth-bits) -> identifyTileRanges).  Instead of a
data-dependent instance count we use a *static instance budget* B:

  * offsets = exclusive cumsum of per-primitive tile coverage,
  * instance i -> owning primitive via searchsorted (a vectorized inverse
    of the per-thread rect loop in duplicateWithKeys),
  * one stable multi-key lax.sort on (tile_id, depth_bits) — bitcasting the
    positive f32 depth to int32 preserves order exactly as the CUDA radix
    sort over the raw bit pattern does (rasterizer_impl.cu:110-112),
  * per-tile [start, end) ranges via searchsorted over the sorted tile ids,
  * a final *K-aligned scatter*: every tile's range is relocated to start
    at a multiple of K (the Pallas chunk width), so the tile kernels DMA
    lane-aligned (16, K) blocks and chunk windows never cross tiles.  The
    alignment slack is at most num_tiles*(K-1) slots, marked with
    tile_id == num_tiles and primitive id 0 and masked everywhere.

Everything is O(B log B) with static shapes; overflow beyond the budget is
clamped (instances past B drop, reported via `num_rendered` so callers can
re-run with a larger bucket).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from reduced3dgs_tpu.ops.preprocess import PreprocessOut, tile_grid

ALIGN = 128  # must equal tile_render.K


class BinningOut(NamedTuple):
    gauss_id: jnp.ndarray  # (B_pad,) int32 primitive index per aligned slot
    tile_id: jnp.ndarray  # (B_pad,) int32 tile per slot (num_tiles = padding)
    tile_ranges: jnp.ndarray  # (num_tiles, 2) int32 [start, end), K-aligned starts
    num_rendered: jnp.ndarray  # () int32 true instance count (may exceed budget)
    total_padded: jnp.ndarray  # () int32 end of the written aligned region


def padded_size(budget: int, width: int, height: int, tile_rows=None) -> int:
    gx, gy = tile_grid(width, height)
    rows = gy if tile_rows is None else tile_rows[1]
    budget = -(-budget // ALIGN) * ALIGN  # keep B_pad a multiple of K
    return budget + gx * rows * ALIGN


def depth_key(depths):
    """f32 depth -> monotone int32 key (positive depths only, which the
    frustum cull guarantees: z > 0.2)."""
    return jax.lax.bitcast_convert_type(depths, jnp.int32)


def bin_gaussians(prep: PreprocessOut, width: int, height: int, budget: int,
                  tile_rows=None) -> BinningOut:
    """Build the sorted, K-aligned per-tile instance lists.

    Args:
      prep: preprocess outputs (rects already clipped to the tile grid).
      budget: static instance capacity B (pre-alignment).
      tile_rows: optional (r0, num_rows) window of tile rows — instances
        are binned only for tiles in rows [r0, r0+num_rows) and tile ids
        are LOCAL to the window (multi-chip image-strip sharding).  r0 may
        be traced; num_rows must be static.
    """
    budget = -(-budget // ALIGN) * ALIGN  # chunked kernels need K | B_pad
    grid_x, grid_y = tile_grid(width, height)
    if tile_rows is None:
        r0, num_rows = 0, grid_y
    else:
        r0, num_rows = tile_rows
    r1 = r0 + num_rows
    num_tiles = grid_x * num_rows
    p = prep.tiles_touched.shape[0]

    if tile_rows is None:
        rect_min, rect_max = prep.rect_min, prep.rect_max
        counts = prep.tiles_touched.astype(jnp.int32)  # (P,)
    else:
        ry_min = jnp.clip(prep.rect_min[:, 1], r0, r1)
        ry_max = jnp.clip(prep.rect_max[:, 1], r0, r1)
        rect_min = jnp.stack([prep.rect_min[:, 0], ry_min], axis=-1)
        rect_max = jnp.stack([prep.rect_max[:, 0], ry_max], axis=-1)
        counts = (rect_max[:, 0] - rect_min[:, 0]) * (ry_max - ry_min)
        counts = jnp.maximum(counts, 0).astype(jnp.int32)
    offsets = jnp.cumsum(counts)  # inclusive
    num_rendered = offsets[-1] if p > 0 else jnp.int32(0)
    starts = offsets - counts  # exclusive

    # instance slot -> owning primitive: smallest g with offsets[g] > i
    slot = jnp.arange(budget, dtype=jnp.int32)
    gauss = jnp.searchsorted(offsets, slot, side="right").astype(jnp.int32)
    in_range = slot < jnp.minimum(num_rendered, budget)
    gauss_c = jnp.clip(gauss, 0, p - 1)

    # rank within the primitive's rect -> tile coordinates, row-major over
    # the rect exactly like the nested loop in duplicateWithKeys
    # (rasterizer_impl.cu:97-116).
    rank = slot - starts[gauss_c]
    rmin = rect_min[gauss_c]  # (B,2)
    rect_w = jnp.maximum(rect_max[gauss_c, 0] - rmin[:, 0], 1)
    ty = rmin[:, 1] + rank // rect_w
    tx = rmin[:, 0] + rank % rect_w
    tile = (ty - r0) * grid_x + tx  # local tile id within the window

    # padding instances sort to the end (tile == num_tiles)
    tile = jnp.where(in_range, tile, num_tiles).astype(jnp.int32)
    dkey = jnp.where(in_range, depth_key(prep.depths[gauss_c]), jnp.int32(2**31 - 1))

    tile_s, _, gauss_s = jax.lax.sort(
        (tile, dkey, gauss_c), num_keys=2, is_stable=True
    )

    tile_idx = jnp.arange(num_tiles, dtype=jnp.int32)
    range_start = jnp.searchsorted(tile_s, tile_idx, side="left").astype(jnp.int32)
    range_end = jnp.searchsorted(tile_s, tile_idx, side="right").astype(jnp.int32)
    tcounts = range_end - range_start

    # --- K-aligned relocation ---------------------------------------------
    padded = ((tcounts + ALIGN - 1) // ALIGN) * ALIGN
    new_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1]]
    )
    total_padded = new_start[-1] + padded[-1] if num_tiles > 0 else jnp.int32(0)
    b_pad = padded_size(budget, width, height, tile_rows)

    src_ok = tile_s < num_tiles
    t_safe = jnp.clip(tile_s, 0, num_tiles - 1)
    pos = jnp.arange(budget, dtype=jnp.int32) - range_start[t_safe]
    new_idx = jnp.where(src_ok, new_start[t_safe] + pos, b_pad)

    gauss_a = jnp.zeros((b_pad,), jnp.int32).at[new_idx].set(gauss_s, mode="drop")
    tile_a = jnp.full((b_pad,), num_tiles, jnp.int32).at[new_idx].set(
        tile_s, mode="drop"
    )
    tile_ranges = jnp.stack([new_start, new_start + tcounts], axis=-1)

    return BinningOut(
        gauss_id=gauss_a,
        tile_id=tile_a,
        tile_ranges=tile_ranges,
        num_rendered=num_rendered,
        total_padded=total_padded,
    )
