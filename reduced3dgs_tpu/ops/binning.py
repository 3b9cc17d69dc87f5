"""Tile binning: instance duplication + depth sort + tile ranges (JAX/XLA).

The TPU-native replacement for the CUB pipeline in the reference
(rasterizer_impl.cu:290-334: inclusive scan -> duplicateWithKeys -> radix
sort on (tileID | depth-bits) -> identifyTileRanges).  Instead of a
data-dependent instance count we use a *static instance budget* B.

TPU data-movement discipline (measured on v5e, PROFILE.md): `lax.sort`
costs ~0.5 ms per payload column per million rows, gathers/scatters cost
~5-10 ms per million *descriptors* regardless of width, and any array
with a minor dimension below 128 lanes wastes up to 42x of its HBM
bandwidth to layout padding.  The pipeline is therefore built from
P-sized ops, dense (B,) vectors, one MXU matmul and ONE B-sized sort:

  * primitives are renumbered in DEPTH ORDER first (one P-sized sort,
    P << B): within a tile, depth order then equals primitive-id order,
    so the per-instance depth key vanishes — the only B-sized sort runs
    on two integer columns (tile, gauss) with no ties (each (tile,
    primitive) pair is unique), replacing the reference's 64-bit
    (tile | depth-bits) radix key (rasterizer_impl.cu:110-112),
  * per-tile instance counts come from ONE (rows,P)x(P,gx) rect-
    indicator matmul on the MXU (0/1 operands are exact in bf16, the
    f32 accumulator is exact below 2^24) — no sorted array is needed to
    find tile ranges, killing the pre-alignment sort and the
    searchsorted range scan entirely,
  * instance slot -> owning primitive ("expand") is a marker scatter
    (P descriptors) + prefix scan per broadcast value — a monotone
    cummax for (gauss, start), a telescoping delta-cumsum for the
    packed rect word — all on dense (B,) int32 vectors; searchsorted
    here would be ~11 rounds of B-sized gathers (~90 ms/M measured),
  * the *K-aligned relocation* (every tile's range starts at a multiple
    of K so Pallas chunk DMAs are lane-aligned and never cross tiles)
    rides the same single sort: synthetic padding instances carry
    (tile, MAX) keys, so they fall into each tile's alignment slack.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from reduced3dgs_tpu.ops.preprocess import PreprocessOut, tile_grid

ALIGN = 128  # must equal tile_render.K (kernel chunk width)
CHUNK_GROUP = 8  # B_pad is a multiple of ALIGN*CHUNK_GROUP (relayout grid)
# Static alignment-slack pool.  Each tile's range rounds up to a
# multiple of ALIGN, so the worst case is (ALIGN-1) per tile — but the
# EXPECTED need is ~ALIGN/2 (uniform remainders), and reserving the
# worst case made every B-sized op (gather, both sorts, cumsums) carry
# ~9% dead rows at 1080p.  _slack_pool reserves mean + ~16 sigma of the
# uniform-remainder model (converging to 80/tile at large tile counts,
# the full worst case at small ones); a scene that still needs more
# (pathologically many near-empty tiles) trips the same budget-regrow
# contract as num_rendered overflow — see bin_gaussians' overflow
# clamp and renderer.py.
# numpy, not jnp: a module-level device scalar would initialize the JAX
# backend at import time, before platform.setup() can pin jax_platforms.
_MAXI = np.int32(2**31 - 1)


class BinningOut(NamedTuple):
    gauss_aligned: jnp.ndarray  # (B_pad,) int32 DEPTH-RANK id per slot
    tile_id: jnp.ndarray  # (B_pad,) int32 tile per aligned slot (num_tiles=pad)
    tile_ranges: jnp.ndarray  # (2, num_tiles) int32 [start; end), K-aligned
    num_rendered: jnp.ndarray  # () int32 true instance count (may exceed B)
    total_padded: jnp.ndarray  # () int32 end of the written aligned region
    seg_bounds: jnp.ndarray  # (P+1,) int32 per-primitive segment bounds in
    # DEPTH-RANK order, clipped to the written instance count: expand
    # order is grouped by primitive in rank order, so sorting
    # per-instance values by rank (pad -> sentinel P) turns the
    # per-Gaussian reduction into cumsum + boundary differences
    prim_order: jnp.ndarray  # (P,) int32 original primitive id per rank
    prim_inv: jnp.ndarray  # (P,) int32 depth rank per original id

    @property
    def pad_mask(self):
        """(B_pad,) bool, True where the slot is padding.

        A property, not a stored field: padding slots carry the _MAXI
        sentinel id, so the mask is one fused compare at each consumer.
        Materialising it as a pred array made it a custom-vjp residual,
        and bit-packed pred buffers repack through a scalar path on TPU
        (~20 ns/bool sliced-prefetch cost measured at 1080p).
        """
        return self.gauss_aligned == _MAXI

    def gauss_id(self):
        """(B_pad,) depth-rank primitive id per slot (padding -> id 0)."""
        return jnp.where(self.pad_mask, 0, self.gauss_aligned)


def _slack_pool(num_tiles: int) -> int:
    import math

    stat = (num_tiles * 80 + int(148 * math.sqrt(num_tiles)) + 256)
    return min(num_tiles * ALIGN, stat)


def padded_size(budget: int, width: int, height: int, tile_rows=None) -> int:
    gx, gy = tile_grid(width, height)
    rows = gy if tile_rows is None else tile_rows[1]
    budget = -(-budget // ALIGN) * ALIGN  # keep B_pad a multiple of K
    size = budget + _slack_pool(gx * rows)
    group = ALIGN * CHUNK_GROUP  # feature-relayout kernel grid unit
    return -(-size // group) * group


def _use_packed_key(num_tiles: int, p: int) -> bool:
    """True when (tile, gauss) packs injectively into one u32 key."""
    return (num_tiles + 1) * (p + 1) <= 1 << 32


def depth_key(depths):
    """f32 depth -> monotone int32 key (positive depths only, which the
    frustum cull guarantees: z > 0.2)."""
    return jax.lax.bitcast_convert_type(depths, jnp.int32)


def _scatter_deltas(mark_pos, values, budget):
    """Scatter telescoping deltas v[p] - v[prev marked p] at mark_pos.

    mark_pos: (P,) scatter slot per primitive (budget = dropped).
    values:   list of (P,) int32.  Returns one (budget,) int32 delta
    buffer per value; `jnp.cumsum` of it reproduces, at every slot,
    the value of the last marked slot <= it (partial sums are exactly
    v[last marked primitive], so no intermediate overflow can occur).
    Scatters are descriptor-bound (~8 ns/descriptor), so callers keep
    the column count minimal.
    """
    marked = mark_pos < budget
    # Deltas between CONSECUTIVE MARKED values via one P-sized
    # compaction sort: marked rows sort to the front in rank order
    # (unique iota keys), so the previous-marked value is just the
    # previous sorted row.  NOT an associative_scan with an ffill
    # combiner — associative_scan unrolls a log-depth slice/concat
    # network whose XLA graph explodes past ~2^22 rows (the remote
    # compile hangs; bisected round 4); and NOT cummax+gather — P-row
    # gathers cost ~8 ns/descriptor where a P-sort payload column costs
    # ~0.1 ms.  Unmarked rows tie on the sentinel key and produce
    # garbage deltas, but they carry mark_pos == budget and are dropped
    # by the scatter.
    p = marked.shape[0]
    iota = jnp.arange(p, dtype=jnp.int32)
    sort_key = jnp.where(marked, iota, p)
    srt = jax.lax.sort((sort_key, mark_pos) + tuple(values),
                       num_keys=1, is_stable=False)
    pos_s = srt[1]
    outs = []
    for v_s in srt[2:]:
        prev = jnp.concatenate([jnp.zeros((1,), v_s.dtype), v_s[:-1]])
        outs.append(jnp.zeros((budget,), jnp.int32).at[pos_s].add(
            v_s - prev, mode="drop"))
    return outs


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

    # --- depth renumbering: primitive p -> rank in depth order ---------
    # Ties (bit-equal depths) break by original id (stable sort), which
    # reproduces the reference's stable radix order exactly.  The rect
    # word and instance count ride the P-sized sort as payload — two
    # extra P columns cost ~0.1 ms where post-sort P-row gathers cost
    # ~1 ms each (gathers are descriptor-bound).
    if tile_rows is None:
        ry0 = prep.rect_min[:, 1]
        ry1 = prep.rect_max[:, 1]
    else:
        ry0 = jnp.clip(prep.rect_min[:, 1], r0, r1)
        ry1 = jnp.clip(prep.rect_max[:, 1], r0, r1)
    rx0 = prep.rect_min[:, 0]
    rx1 = prep.rect_max[:, 0]
    # gate on the validity-masked tiles_touched: raw rects are NOT
    # masked for culled primitives (dead slots, behind-camera, det==0
    # keep a stale >=1-tile rect), which would emit phantom instances
    # that inflate num_rendered and, under truncation, displace real
    # instances by their stale depth keys
    counts0 = jnp.where(
        prep.tiles_touched > 0,
        jnp.maximum((rx1 - rx0) * (ry1 - ry0), 0), 0).astype(jnp.int32)
    # rect fields bit-packed into one int32 (10 bits each supports a
    # 16K x 16K image's 1024-wide tile grid)
    rpack0 = ((rx0 << 20) | (ry0 << 10)
              | (jnp.maximum(rx1 - rx0, 1) - 1))  # | (w-1)
    _, order, rectpack, counts = jax.lax.sort(
        (depth_key(prep.depths), jnp.arange(p, dtype=jnp.int32),
         rpack0, counts0),
        num_keys=1, is_stable=True)
    # inverse permutation by sorting (order, iota): a P-descriptor
    # scatter costs ~8 ns/descriptor (3.7 ms at 2^19) where the s32
    # sort costs ~0.35 ms
    _, prim_inv = jax.lax.sort(
        (order, jnp.arange(p, dtype=jnp.int32)), num_keys=1,
        is_stable=False)

    rw_p = (rectpack & 1023) + 1
    x0 = rectpack >> 20
    y0 = (rectpack >> 10) & 1023
    x1 = jnp.where(counts > 0, x0 + rw_p, x0)
    y1 = y0 + jnp.where(counts > 0, counts // rw_p, 0)
    offsets = jnp.cumsum(counts)  # inclusive, in rank order
    num_rendered = offsets[-1] if p > 0 else jnp.int32(0)
    nv = jnp.minimum(num_rendered, budget)

    # --- per-tile counts: ONE rect-indicator matmul on the MXU ---------
    # count2d[ty, tx] = #included primitives whose rect covers the tile.
    # 0/1 indicators are exact in bf16; the f32 accumulator is exact for
    # integer sums < 2^24.  Replaces the pre-alignment sort + per-tile
    # searchsorted of the naive pipeline (identifyTileRanges,
    # rasterizer_impl.cu:120-141).
    ix = jnp.arange(grid_x, dtype=jnp.int32)[None, :]
    iy = jnp.arange(num_rows, dtype=jnp.int32)[None, :] + r0
    full = offsets <= nv  # every instance of the primitive fits
    xin = ((ix >= x0[:, None]) & (ix < x1[:, None])).astype(jnp.bfloat16)
    yin = ((iy >= y0[:, None]) & (iy < y1[:, None])
           & full[:, None]).astype(jnp.bfloat16)
    count2d = jax.lax.dot_general(
        yin, xin, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (num_rows, grid_x)

    # at most ONE boundary primitive is split by the budget: its first
    # q instances (row-major over the rect, like duplicateWithKeys
    # rasterizer_impl.cu:97-116) are included -> full rows + one partial
    if p > 0:
        p_star = jnp.sum(full.astype(jnp.int32))
        ps = jnp.minimum(p_star, p - 1)
        xs0, xs1, ys0 = x0[ps], x1[ps], y0[ps]
        start_ps = offsets[ps] - counts[ps]
        q = nv - start_ps
        has_partial = (p_star < p) & (q > 0) & (counts[ps] > 0)
        w = jnp.maximum(xs1 - xs0, 1)
        fr = q // w
        rem = q - fr * w
        yfull = ((iy[0] >= ys0) & (iy[0] < ys0 + fr)).astype(jnp.float32)
        xfull = ((ix[0] >= xs0) & (ix[0] < xs1)).astype(jnp.float32)
        yrow = (iy[0] == ys0 + fr).astype(jnp.float32)
        xrem = ((ix[0] >= xs0) & (ix[0] < xs0 + rem)).astype(jnp.float32)
        corr = yfull[:, None] * xfull[None, :] + yrow[:, None] * xrem[None, :]
        count2d = count2d + jnp.where(has_partial, 1.0, 0.0) * corr
    tcounts = count2d.reshape(num_tiles).astype(jnp.int32)

    # --- expand: instance slot -> owning primitive ---------------------
    # scatter one marker per non-empty primitive at its start slot
    # (P descriptors, P << B) and prefix-fill.  TWO scattered columns
    # only (scatters are descriptor-bound): the 1-based rank is
    # strictly increasing across marks, so its delta buffer is nonzero
    # exactly at the marks and the segment start (the third broadcast
    # value) falls out as a running max of marked slot indices.
    slot = jnp.arange(budget, dtype=jnp.int32)
    starts_all = offsets - counts
    mark_pos = jnp.where(counts > 0, starts_all, budget)

    dg, dr = _scatter_deltas(
        mark_pos, [jnp.arange(1, p + 1, dtype=jnp.int32), rectpack],
        budget)
    gauss_c = jnp.cumsum(dg) - 1  # 1-based back to 0-based rank
    rect_c = jnp.cumsum(dr)
    # cummax, NOT associative_scan(maximum): associative_scan unrolls a
    # log-depth slice/concat network whose XLA graph explodes past ~2^22
    # rows — the remote compile hangs indefinitely at the 1080p budget
    # (bisected round 4); cummax lowers to the same well-behaved
    # reduce-window path as cumsum.
    start_c = jax.lax.cummax(jnp.where(dg != 0, slot, 0), axis=0)

    # rank within the primitive's rect -> tile coordinates, row-major
    # over the rect exactly like the nested loop in duplicateWithKeys
    rank = slot - start_c
    rw = (rect_c & 1023) + 1
    ty = ((rect_c >> 10) & 1023) + rank // rw
    tx = (rect_c >> 20) + rank % rw
    tile = (ty - r0) * grid_x + tx  # local tile id within the window

    # truncated slots (budget overflow) carry the (num_tiles, sentinel)
    # key so they sort past every real instance and into the pad region
    in_range = slot < nv
    tile = jnp.where(in_range, tile, num_tiles).astype(jnp.int32)

    # --- K-aligned relocation rides the ONE sort -----------------------
    padded = ((tcounts + ALIGN - 1) // ALIGN) * ALIGN
    new_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1]]
    )
    total_padded = (new_start[-1] + padded[-1] if num_tiles > 0
                    else jnp.int32(0))
    b_pad = padded_size(budget, width, height, tile_rows)
    n_extra = b_pad - budget

    # synthetic padding instances: pad slot k belongs to the tile whose
    # cumulative padding need covers k; their (tile, MAX) keys sort
    # into each tile's alignment slack.  Reuse the marker-scatter +
    # running-max expand: each tile with nonzero padding scatters its id
    # at its first pad slot (tile ids increase with slot, so collisions
    # cannot occur), a sentinel num_tiles marks the end of all real
    # padding, and a max-scan fills the gaps.
    pad_counts = padded - tcounts
    pad_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(pad_counts)])  # (T+1,)
    pmark_pos = jnp.where(
        jnp.concatenate([pad_counts > 0,
                         jnp.ones((1,), bool)]),  # sentinel always marks
        pad_start, n_extra)
    pmarkers = jnp.zeros((n_extra,), jnp.int32).at[pmark_pos].max(
        jnp.arange(num_tiles + 1, dtype=jnp.int32), mode="drop")
    pad_tile = jax.lax.cummax(pmarkers, axis=0)  # see start_c note

    # ONE unstable sort over B_pad on (tile, gauss).  gauss is
    # simultaneously the depth order (rank renumbering), the pad flag
    # (sentinel sorts pads into the alignment slack) and the payload
    # the kernels consume — no ties exist because each (tile,
    # primitive) pair occurs at most once.  When (T+1)*(P+1) fits in
    # 32 bits (every practical single-chip config) the two columns
    # pack into ONE u32 key — sort cost scales with total column
    # count, so this nearly halves the binning sort.
    if _use_packed_key(num_tiles, p):
        pp1 = jnp.uint32(p + 1)
        key = (tile.astype(jnp.uint32) * pp1
               + jnp.where(in_range, gauss_c, p).astype(jnp.uint32))
        key_pad = pad_tile.astype(jnp.uint32) * pp1 + jnp.uint32(p)
        key_a = jax.lax.sort(
            jnp.concatenate([key, key_pad]), is_stable=False)
        tile_a = (key_a // pp1).astype(jnp.int32)
        gauss_u = key_a - tile_a.astype(jnp.uint32) * pp1
        gauss_a = jnp.where(gauss_u == p, _MAXI,
                            gauss_u.astype(jnp.int32))
    else:
        gauss = jnp.where(in_range, gauss_c, _MAXI)
        tile_all = jnp.concatenate([tile, pad_tile])
        gauss_all = jnp.concatenate(
            [gauss, jnp.full((n_extra,), _MAXI, jnp.int32)])
        tile_a, gauss_a = jax.lax.sort(
            (tile_all, gauss_all), num_keys=2, is_stable=False)

    # per-primitive expand-order segment bounds, clipped to the written
    # region: rank r's instances occupy [bounds[r], bounds[r+1])
    seg_bounds = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.minimum(offsets, nv)])

    # Slack-overflow safety: if the per-tile K-rounding needs more than
    # the static slack (total_padded > b_pad), the relocation above was
    # lossy.  The RANGES are clamped so no kernel can ever DMA past the
    # (16, b_pad) feature array (b_pad and all starts are K-multiples,
    # so clamped ranges stay K-aligned); renderer.py folds the condition
    # into the num_rendered overflow report and the host regrows the
    # budget (which grows b_pad) and redoes the step.
    starts = jnp.minimum(new_start, b_pad)
    ends = jnp.minimum(new_start + tcounts, b_pad)
    return BinningOut(
        gauss_aligned=gauss_a,
        tile_id=tile_a,
        tile_ranges=jnp.stack([starts, ends], axis=0),
        num_rendered=num_rendered,
        total_padded=total_padded,
        seg_bounds=seg_bounds,
        prim_order=order,
        prim_inv=prim_inv,
    )
