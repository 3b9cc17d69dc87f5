"""Tile binning: instance duplication + depth sort + tile ranges (JAX/XLA).

The TPU-native replacement for the CUB pipeline in the reference
(rasterizer_impl.cu:290-334: inclusive scan -> duplicateWithKeys -> radix
sort on (tileID | depth-bits) -> identifyTileRanges).  Instead of a
data-dependent instance count we use a *static instance budget* B.

TPU data-movement discipline (measured on v5e): `lax.sort` and
vectorized `searchsorted` run at ~0.15 ms per million elements, while
gathers/scatters cost ~5-10 ms per million *descriptors* regardless of
width.  The pipeline is therefore built almost entirely from sorts,
searchsorted and vector math:

  * offsets = cumsum of per-primitive tile coverage; instance ->
    primitive via searchsorted (vectorized inverse of the per-thread
    rect loop in duplicateWithKeys),
  * ONE row gather moves per-primitive data (rect, start, depth key) to
    instances — contiguous 32-byte rows, the only gather in binning,
  * sort #1 on (tile, depth-bits) over B — bitcasting the positive f32
    depth to int32 preserves order exactly like the CUDA radix sort over
    raw bits (rasterizer_impl.cu:110-112) — then per-tile ranges via
    searchsorted,
  * the *K-aligned relocation* (every tile's range starts at a multiple
    of K so Pallas chunk DMAs are lane-aligned and never cross tiles) is
    realized by sort #2 over B_pad: synthetic padding instances carry
    (tile, MAX_KEY) keys, so the stable sort drops every real instance
    into its aligned slot and the padding into each tile's alignment
    slack — no scatter, no second gather; the aligned per-slot primitive
    id comes out as the sort payload.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from reduced3dgs_tpu.ops.preprocess import PreprocessOut, tile_grid

ALIGN = 128  # must equal tile_render.K (kernel chunk width)
# numpy, not jnp: a module-level device scalar would initialize the JAX
# backend at import time, before platform.setup() can pin jax_platforms.
_MAXI = np.int32(2**31 - 1)


class BinningOut(NamedTuple):
    gauss_aligned: jnp.ndarray  # (B_pad,) int32 primitive id per aligned slot
    pad_mask: jnp.ndarray  # (B_pad,) bool True where slot is padding
    tile_id: jnp.ndarray  # (B_pad,) int32 tile per aligned slot (num_tiles=pad)
    tile_ranges: jnp.ndarray  # (num_tiles, 2) int32 [start, end), K-aligned
    num_rendered: jnp.ndarray  # () int32 true instance count (may exceed B)
    total_padded: jnp.ndarray  # () int32 end of the written aligned region
    seg_bounds: jnp.ndarray  # (P+1,) int32 per-primitive segment bounds,
    # clipped to the written instance count: expand order is grouped by
    # primitive in id order, so sorting per-instance values by primitive
    # id (pad -> sentinel P) turns the per-Gaussian reduction into
    # cumsum + boundary differences at these bounds

    def gauss_id(self):
        """(B_pad,) primitive id per aligned slot (padding -> id 0)."""
        return jnp.where(self.pad_mask, 0, self.gauss_aligned)


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

    # instance slot -> owning primitive ("expand").  searchsorted would be
    # a binary search = ~11 rounds of B-sized gathers (~90 ms/M on v5e);
    # instead scatter one marker per non-empty primitive at its start slot
    # (P descriptors, P << B) and forward-fill with a running max (gauss
    # ids increase with start position).
    slot = jnp.arange(budget, dtype=jnp.int32)
    starts_all = offsets - counts
    mark_pos = jnp.where(counts > 0, starts_all, budget)
    markers = jnp.zeros((budget,), jnp.int32).at[mark_pos].max(
        jnp.arange(p, dtype=jnp.int32), mode="drop")
    gauss_c = jax.lax.associative_scan(jnp.maximum, markers)
    in_range = slot < jnp.minimum(num_rendered, budget)

    # the ONE gather of binning: per-primitive rows -> instances.  The
    # rect fields are bit-packed into one int32 (10 bits each supports a
    # 16K x 16K image's 1024-wide tile grid): every extracted column of
    # the gathered row matrix costs a ~1.4 ms (B,)-relayout on v5e, so
    # 3 columns instead of 5 is a direct win (profile_trace.py).
    rect_w1 = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1) - 1  # w-1
    rectpack = ((rect_min[:, 0] << 20) | (rect_min[:, 1] << 10) | rect_w1)
    per_prim = jnp.stack(
        [offsets - counts, rectpack, depth_key(prep.depths)],
        axis=1)  # (P, 3)
    rows = per_prim[gauss_c]  # (B, 3) contiguous row gather

    # rank within the primitive's rect -> tile coordinates, row-major over
    # the rect exactly like the nested loop in duplicateWithKeys
    # (rasterizer_impl.cu:97-116).
    rank = slot - rows[:, 0]
    rp = rows[:, 1]
    rw = (rp & 1023) + 1
    ty = ((rp >> 10) & 1023) + rank // rw
    tx = (rp >> 20) + rank % rw
    tile = (ty - r0) * grid_x + tx  # local tile id within the window

    tile = jnp.where(in_range, tile, num_tiles).astype(jnp.int32)
    dkey = jnp.where(in_range, rows[:, 2], _MAXI)

    # sort #1: instance order within the budget
    tile_s, dkey_s, gauss_s = jax.lax.sort(
        (tile, dkey, gauss_c), num_keys=2, is_stable=True
    )

    # one searchsorted over T+1 boundaries: for integer tiles,
    # side-left at t+1 == side-right at t, so start/end come from one
    # call (each query costs ~20 serial descriptor gathers on TPU —
    # halving the query count halves the dominant binning search cost).
    bounds = jnp.searchsorted(
        tile_s, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    range_start = bounds[:-1]
    range_end = bounds[1:]
    tcounts = range_end - range_start

    # --- K-aligned relocation via sort #2 ------------------------------
    padded = ((tcounts + ALIGN - 1) // ALIGN) * ALIGN
    new_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1]]
    )
    total_padded = (new_start[-1] + padded[-1] if num_tiles > 0
                    else jnp.int32(0))
    b_pad = padded_size(budget, width, height, tile_rows)
    n_extra = b_pad - budget

    # synthetic padding instances: pad slot k belongs to the tile whose
    # cumulative padding need covers k; their (tile, MAX_KEY) keys sort
    # into each tile's alignment slack.  searchsorted here would be
    # n_extra queries x ~10 serial gathers (~60 ms/M measured on v5e);
    # instead reuse the marker-scatter + running-max expand: each tile
    # with nonzero padding scatters its id at its first pad slot (tile
    # ids increase with slot, so collisions cannot occur), a sentinel
    # num_tiles marks the end of all real padding, and a max-scan fills
    # the gaps — T+1 descriptors + one scan instead of n_extra searches.
    pad_counts = padded - tcounts
    pad_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(pad_counts)])  # (T+1,)
    pmark_pos = jnp.where(
        jnp.concatenate([pad_counts > 0,
                         jnp.ones((1,), bool)]),  # sentinel always marks
        pad_start, n_extra)
    pmarkers = jnp.zeros((n_extra,), jnp.int32).at[pmark_pos].max(
        jnp.arange(num_tiles + 1, dtype=jnp.int32), mode="drop")
    pad_tile = jax.lax.associative_scan(jnp.maximum, pmarkers)

    # ONE fused key: 2*tile + is_pad.  The real part is already
    # depth-sorted within each tile and the synthetic part is already in
    # tile order, so a stable sort on (tile, is_pad) alone reproduces the
    # (tile, depth, pad-last) order — no need to carry the depth key or a
    # separate pad column (2 sort columns instead of 5; the B_pad-sized
    # sorts are the largest single cost of the frame, PROFILE.md).
    # Truncated instances (tile == num_tiles sentinel) are flagged pad
    # so pad_mask identifies every invalid slot downstream.
    fused = jnp.concatenate([
        tile_s * 2 + (tile_s >= num_tiles),
        pad_tile * 2 + 1,
    ])
    all_gauss = jnp.concatenate(
        [gauss_s, jnp.zeros((n_extra,), jnp.int32)])

    fused_a, gauss_a = jax.lax.sort(
        (fused, all_gauss), num_keys=1, is_stable=True,
    )
    tile_a = fused_a >> 1
    pad_a = fused_a & 1

    # per-primitive expand-order segment bounds, clipped to the written
    # region: primitive p's instances occupy [bounds[p], bounds[p+1])
    nv = jnp.minimum(num_rendered, budget)
    seg_bounds = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.minimum(offsets, nv)])

    return BinningOut(
        gauss_aligned=gauss_a,
        pad_mask=pad_a == 1,
        tile_id=tile_a,
        tile_ranges=jnp.stack([new_start, new_start + tcounts], axis=-1),
        num_rendered=num_rendered,
        total_padded=total_padded,
        seg_bounds=seg_bounds,
    )
