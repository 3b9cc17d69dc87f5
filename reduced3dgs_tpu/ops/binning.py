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
  * instance slot -> owning primitive ("expand") is ONE streaming
    Pallas pass (_expand_kernel): windowed limb-delta matmuls against
    the sorted mark positions reproduce "value at last mark <= slot"
    for (rank, rect word, segment start) exactly, with no B-sized
    scatter or prefix op (the scatter+cumsum formulation it replaced
    cost ~11 ms at the 1080p budget; searchsorted would be ~11 rounds
    of B-sized gathers at ~90 ms/M measured),
  * the *K-aligned relocation* (every tile's range starts at a multiple
    of K so Pallas chunk DMAs are lane-aligned and never cross tiles)
    rides the same single sort: synthetic padding instances carry
    (tile, MAX) keys, so they fall into each tile's alignment slack.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
    feat_rank: jnp.ndarray | None = None  # (P, 9) f32 render features
    # [x2d, y2d, cxx, cxy, cyy, op, r, g, b] in DEPTH-RANK order: the 9
    # columns ride the depth sort as payload (~0.1 ms per P-column)
    # instead of a post-sort (P, 9) row gather (~2.4 ms measured,
    # descriptor-bound).  stop_gradient'd: the rasterizer custom VJP
    # computes these gradients analytically, so the autodiff path
    # through the sort must stay dead (no zero-cotangent transpose).

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


# ---------------------------------------------------------------------------
# streaming expand kernel
#
# The expand (instance slot -> owning primitive's rank / rect / segment
# start) was two P-descriptor marker scatters into B-sized buffers plus
# three B-sized prefix passes (cumsum x2 + cummax) — ~11 ms at the 1080p
# budget, all descriptor/bandwidth-bound XLA ops.  Every expanded value
# is "value at the last mark <= slot", i.e. a prefix sum of telescoping
# per-mark deltas, so ONE streaming Pallas pass computes all of them:
# marks (sorted, compacted) are consumed in _EXP_W-wide windows, each
# chunk of 1024 slots takes the window's step matrix LE[s, m] =
# (pos_m <= s) and one (16, W) @ (1024, W)^T MXU pass of the delta
# limbs.  EXACTNESS: every quantity is decomposed into base-256 limbs —
# limb deltas are in (-256, 256), exactly representable in bf16, their
# partial sums stay < 2^16, and the reconstructed limb telescopes back
# to the true digit, so one DEFAULT-precision bf16 pass is bit-exact.
# ---------------------------------------------------------------------------

_CS = 1024  # slot chunk (lanes per grid step)
_EXP_W = 128  # marks per window
_EXP_ROWS = 16  # limb rows per window buffer (10 live: 3+4+3)

_FORCE_INTERPRET = os.environ.get("R3DGS_PALLAS_INTERPRET", "") == "1"


def _interpret() -> bool:
    return _FORCE_INTERPRET or jax.default_backend() != "tpu"


def _expand_kernel(nwin8, ngrp, plast_ref, pos_hbm, limb_hbm, out_hbm,
                   pbuf, lbuf, obuf, carry, wstate, psem, lsem, osem):
    """One grid step = one 1024-slot chunk.

    wstate (SMEM): [w_cur, pos_group_cur, limb_waited_max, opend0,
    opend1].  pbuf: (2, 8, W) int32 mark-position window groups (like
    the pick kernel's zb groups); lbuf: (2, 16, W) f32 per-window delta
    limbs; carry: (16, 1) f32 running limb value at the last consumed
    mark; obuf: (2, 8, _CS) int32 double-buffered output blocks (rows
    0..2 = gauss/rect/start; TPU requires >= 8 sublanes per DMA block).
    Pad windows carry pos = last-chunk sentinel and zero deltas, so
    every window completes by the final chunk and all DMAs are waited.
    """
    c = pl.program_id(0)
    chunk_end = (c + 1) * _CS
    slots = c * _CS + jax.lax.broadcasted_iota(jnp.int32, (_CS, 1), 0)
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    def pdma(g, slot):
        return pltpu.make_async_copy(
            pos_hbm.at[g], pbuf.at[slot], psem.at[slot])

    def ldma(w, slot):
        return pltpu.make_async_copy(
            limb_hbm.at[w], lbuf.at[slot], lsem.at[slot])

    def odma(cc, slot):
        off = pl.multiple_of(cc * _CS, _CS)
        return pltpu.make_async_copy(
            obuf.at[slot], out_hbm.at[:, pl.ds(off, _CS)], osem.at[slot])

    @pl.when(c == 0)
    def _():
        wstate[0] = 0
        wstate[1] = 0
        wstate[2] = -1
        wstate[3] = 0
        wstate[4] = 0
        carry[...] = jnp.zeros((_EXP_ROWS, 1), jnp.float32)
        pdma(0, 0).start()

        @pl.when(ngrp > 1)
        def _():
            pdma(1, 1).start()

        pdma(0, 0).wait()
        ldma(0, 0).start()

        @pl.when(nwin8 > 1)
        def _():
            ldma(1, 1).start()

    def ensure_window(w):
        g = w // 8

        @pl.when(g != wstate[1])
        def _():
            pdma(g, jax.lax.rem(g, 2)).wait()

            @pl.when(g + 1 < ngrp)
            def _():
                pdma(g + 1, jax.lax.rem(g + 1, 2)).start()

            wstate[1] = g

        @pl.when(w > wstate[2])
        def _():
            ldma(w, jax.lax.rem(w, 2)).wait()
            wstate[2] = w

    carry0 = carry[...]  # limb value at chunk entry (broadcasts below)

    def cond(st):
        w, out, cont = st
        return cont & (w < nwin8)

    def body(st):
        w, out, _ = st
        ensure_window(w)
        g2 = jax.lax.rem(w // 8, 2)
        wl = jax.lax.rem(w, 8)
        pos = jnp.sum(jnp.where(sub == wl, pbuf[g2], 0), axis=0,
                      keepdims=True)  # (1, W)
        d = lbuf[jax.lax.rem(w, 2)]  # (16, W) f32 limb deltas
        le = (pos <= slots).astype(jnp.float32)  # (1024, W)
        out = out + jax.lax.dot_general(
            d, le, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)  # (16, 1024), exact
        complete = plast_ref[jnp.minimum(w, nwin8 - 1)] < chunk_end

        @pl.when(complete)
        def _():
            carry[...] += jnp.sum(d, axis=1, keepdims=True)

            @pl.when(w + 2 < nwin8)
            def _():
                ldma(w + 2, jax.lax.rem(w, 2)).start()

        return (jnp.where(complete, w + 1, w), out, complete)

    w, out, _ = jax.lax.while_loop(
        cond, body,
        (wstate[0], jnp.zeros((_EXP_ROWS, _CS), jnp.float32),
         jnp.bool_(True)))
    wstate[0] = w
    out = out + carry0

    def recomb(r0, n):
        # integer recombination: each reconstructed limb is an exact
        # small f32 integer, but their weighted SUM can exceed 2^24 —
        # recombine with int32 shifts, not f32 adds
        v = out[r0:r0 + 1, :].astype(jnp.int32)
        for i in range(1, n):
            v = v + (out[r0 + i:r0 + i + 1, :].astype(jnp.int32)
                     << (8 * i))
        return v

    oslot = jax.lax.rem(c, 2)

    @pl.when(wstate[3 + oslot] == 1)
    def _():
        odma(c, oslot).wait()

    obuf[oslot, 0:1, :] = recomb(0, 3) - 1  # 1-based rank -> 0-based
    obuf[oslot, 1:2, :] = recomb(3, 4)
    obuf[oslot, 2:3, :] = recomb(7, 3)
    obuf[oslot, 3:8, :] = jnp.zeros((5, _CS), jnp.int32)
    odma(c, oslot).start()
    wstate[3 + oslot] = 1

    @pl.when(c == pl.num_programs(0) - 1)
    def _():
        for sl in (0, 1):
            @pl.when(wstate[3 + sl] == 1)
            def _():
                odma(c, sl).wait()


@functools.cache
def _build_expand(bq_pad, nwin8, interpret):
    ngrp = nwin8 // 8
    nchunks = bq_pad // _CS
    return pl.pallas_call(
        functools.partial(_expand_kernel, nwin8, ngrp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # per-window last mark position
            grid=(nchunks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # pos (ngrp, 8, W)
                pl.BlockSpec(memory_space=pl.ANY),  # limbs (nwin8,16,W)
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, 8, _EXP_W), jnp.int32),
                pltpu.VMEM((2, _EXP_ROWS, _EXP_W), jnp.float32),
                pltpu.VMEM((2, 8, _CS), jnp.int32),
                pltpu.VMEM((_EXP_ROWS, 1), jnp.float32),
                pltpu.SMEM((5,), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((8, bq_pad), jnp.int32),
        interpret=interpret,
    )


def _limbs(v, n):
    return [((v >> (8 * i)) & 255).astype(jnp.float32) for i in range(n)]


def _expand_stream(mark_pos, rank1, rectpack, budget):
    """Expand via the streaming kernel: returns (gauss_c, rect_c,
    start_c) over `budget` slots — semantically identical to scattering
    (rank1, rectpack, slot) markers at mark_pos and prefix-filling
    (cumsum/cummax), without any B-sized scatter or prefix pass.
    """
    p = mark_pos.shape[0]
    marked0 = mark_pos < budget
    iota = jnp.arange(p, dtype=jnp.int32)
    sort_key = jnp.where(marked0, iota, p)
    # marked rows compact to the front in rank order (P-sized sort;
    # scatters are ~8 ns/descriptor where a sort column is ~0.1 ms)
    _, pos_s, rk_s, rc_s, m_s = jax.lax.sort(
        (sort_key, mark_pos, rank1, rectpack, marked0.astype(jnp.int32)),
        num_keys=1, is_stable=False)
    marked_s = m_s == 1
    bq_pad = -(-budget // _CS) * _CS

    nwin = -(-p // _EXP_W)
    nwin8 = -(-nwin // 8) * 8
    ppad = nwin8 * _EXP_W
    sentinel = jnp.int32(bq_pad - 1)  # completes in the final chunk

    def padp(x, v):
        return jnp.pad(x, (0, ppad - p), constant_values=v)

    pos_le = padp(jnp.where(marked_s, pos_s, sentinel), bq_pad - 1)
    # telescoping per-limb deltas vs the previous MARKED row (marked
    # rows are compacted, so the previous row is the previous mark);
    # unmarked/pad rows contribute zero
    cols = (_limbs(rk_s, 3) + _limbs(rc_s, 4)
            + _limbs(jnp.where(marked_s, pos_s, 0), 3))
    dl = []
    for v in cols:
        prev = jnp.concatenate([jnp.zeros((1,), v.dtype), v[:-1]])
        dl.append(padp(jnp.where(marked_s, v - prev, 0.0), 0.0))
    dl += [jnp.zeros((ppad,), jnp.float32)] * (_EXP_ROWS - len(dl))

    pos3 = pos_le.reshape(nwin8 // 8, 8, _EXP_W)
    limbs = jnp.stack([d.reshape(nwin8, _EXP_W) for d in dl], axis=1)
    plast = pos_le[_EXP_W - 1::_EXP_W]

    out = _build_expand(bq_pad, nwin8, _interpret())(plast, pos3, limbs)
    return out[0, :budget], out[1, :budget], out[2, :budget]


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
    # the 9 render-feature columns [x2d, y2d, cxx, cxy, cyy, op, r, g,
    # b] ride the same sort (stop_gradient: the rasterizer custom VJP
    # owns their gradients; see BinningOut.feat_rank) — a P-sort payload
    # column costs ~0.1 ms where the post-sort (P, 9) row gather this
    # replaces measured 2.4 ms at 2^19 (descriptor-bound)
    sg = jax.lax.stop_gradient
    feat_cols = tuple(
        sg(c) for c in (
            prep.means2d[:, 0], prep.means2d[:, 1], prep.conic[:, 0],
            prep.conic[:, 1], prep.conic[:, 2], prep.opacity,
            prep.color[:, 0], prep.color[:, 1], prep.color[:, 2]))
    srt = jax.lax.sort(
        (depth_key(prep.depths), jnp.arange(p, dtype=jnp.int32),
         rpack0, counts0) + feat_cols,
        num_keys=1, is_stable=True)
    _, order, rectpack, counts = srt[:4]
    feat_rank = jnp.stack(srt[4:], axis=1)  # (P, 9) depth-rank order
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
    # one streaming Pallas pass (_expand_stream): every expanded value
    # is "value at the last mark <= slot", computed as windowed
    # limb-delta matmuls against the sorted mark positions.  Replaces
    # two P-descriptor marker scatters + cumsum x2 + cummax over the
    # budget (~11 ms at the 1080p budget; the kernel streams it).
    slot = jnp.arange(budget, dtype=jnp.int32)
    starts_all = offsets - counts
    mark_pos = jnp.where(counts > 0, starts_all, budget)

    gauss_c, rect_c, start_c = _expand_stream(
        mark_pos, jnp.arange(1, p + 1, dtype=jnp.int32), rectpack,
        budget)

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
        feat_rank=feat_rank,
    )
