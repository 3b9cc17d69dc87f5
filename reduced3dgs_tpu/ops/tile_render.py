"""Pallas TPU tile rasterizer (forward + backward + transmittance).

The production replacement for the reference's per-tile CUDA kernels
(forward renderCUDA forward.cu:461-582, backward renderCUDA
backward.cu:437-595) with identical compositing semantics:

  alpha = min(0.99, opacity * exp(power)),  skip if power > 0 or alpha < 1/255
  stop the pixel before a blend that would push T below 1e-4
  C += c * alpha * T;  T *= 1 - alpha

Design (TPU-first, not a CUDA translation):

  * One grid step per 16x16 tile; the tile's 256 pixels live on the VPU
    sublane axis and a chunk of K=128 depth-sorted instances on the lane
    axis, so each (pixel, instance) pair is one vector lane — the analogue
    of the CUDA block's 256 threads x shared-memory batch, but with the
    sequential per-instance loop replaced by *parallel-scan compositing*:
    the front-to-back transmittance recurrence T_i = prod_{j<i}(1-a_j) is a
    cumulative product, computed with a log-depth Hillis-Steele scan over
    lanes.  Color accumulation is a (256,K)@(K,3) MXU matmul.
  * Instance features are pre-gathered (sorted by (tile, depth)) into a
    feature-major (16, B) array in HBM; each chunk is one async DMA of a
    (16, K) block into VMEM (double-buffered).
  * Early exit: a carried per-pixel `done` flag; the chunk while-loop stops
    when every live pixel is done (the analogue of the CUDA
    __syncthreads_count early-out).
  * The backward re-walks the same chunks *front-to-back* (not back-to-front
    like CUDA): with suffix sums expressed as (total - inclusive prefix),
    per-instance gradients fall out of the same scan structure, and the
    per-instance -> per-Gaussian reduction is a deterministic segment-sum
    (replacing CUDA float atomics).  Each instance belongs to exactly one
    tile, so instance-gradient writes are conflict-free by construction.
  * The binning layout starts every tile's range at a K-aligned offset
    (ops/binning.py), so chunk DMAs are lane-aligned and a chunk window
    never crosses tiles; alignment-slack slots carry written zeros and
    the unwritten tail past `total_padded` is masked outside the kernel.

Orientation: `power <= 0` always holds mathematically for a PSD conic; the
check only filters garbage lanes, kept for bit-parity with the reference.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from reduced3dgs_tpu.ops.binning import BinningOut
from reduced3dgs_tpu.ops.preprocess import TILE_X, TILE_Y, PreprocessOut, tile_grid

K = 128  # instance chunk (lanes)
NPIX = TILE_X * TILE_Y  # 256 pixels per tile (sublanes)
FEAT_ROWS = 16  # packed feature rows, padded for (sublane, lane) tiling
ALPHA_CLAMP = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1.0e-4

_FORCE_INTERPRET = os.environ.get("R3DGS_PALLAS_INTERPRET", "") == "1"


def _interpret() -> bool:
    return _FORCE_INTERPRET or jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# lane-axis scans (Hillis-Steele with static shifts; no pltpu.roll needed)
# ---------------------------------------------------------------------------

def _shift_lanes(x, d, fill):
    """shifted[:, i] = x[:, i-d] for i >= d else fill (static d)."""
    s, k = x.shape
    pad = jnp.full((s, d), fill, x.dtype)
    return jnp.concatenate([pad, x[:, : k - d]], axis=1)


def _cumprod_excl_lanes(x):
    """Exclusive cumulative product along lanes: out[:, i] = prod_{j<i} x[:, j]."""
    s = x
    d = 1
    while d < x.shape[1]:
        s = s * _shift_lanes(s, d, 1.0)
        d *= 2
    return _shift_lanes(s, 1, 1.0)


def _cumsum_incl_lanes(x):
    """Inclusive cumulative sum along lanes."""
    s = x
    d = 1
    while d < x.shape[1]:
        s = s + _shift_lanes(s, d, 0.0)
        d *= 2
    return s


# ---------------------------------------------------------------------------
# shared per-chunk compositing math
# ---------------------------------------------------------------------------

def _chunk_state(f, pxf, pyf, idx_global, end, t_in, done_in, pix_ok):
    """Recompute the blend state for one (256, K) chunk.

    Returns dict with alpha `a`, per-instance exclusive transmittance
    `t_exc`, inclusive `t_inc`, the contribution mask, and rgb rows.
    """
    x = f[0:1, :]
    y = f[1:2, :]
    cxx = f[2:3, :]
    cxy = f[3:4, :]
    cyy = f[4:5, :]
    op = f[5:6, :]

    dx = x - pxf  # (256, K)
    dy = y - pyf
    power = -0.5 * (cxx * dx * dx + cyy * dy * dy) - cxy * dx * dy
    g = jnp.exp(power)
    alpha_raw = op * g
    alpha = jnp.minimum(ALPHA_CLAMP, alpha_raw)

    lane = jax.lax.broadcasted_iota(jnp.int32, (NPIX, K), 1)
    in_range = (idx_global + lane) < end
    valid = in_range & (power <= 0.0) & (alpha >= ALPHA_MIN) & pix_ok

    a = jnp.where(valid, alpha, 0.0)
    t_exc = t_in * _cumprod_excl_lanes(1.0 - a)  # T before instance i
    t_inc = t_exc * (1.0 - a)  # T after instance i
    # `done_in` is a (256,1) float32 0/1 mask: Mosaic cannot carry i1
    # vectors through scf.while, so booleans live as floats in the carries.
    not_done = done_in < 0.5
    live = valid & not_done
    contrib = live & (t_inc >= T_EPS)
    cut = live & (t_inc < T_EPS)
    done_out = jnp.maximum(
        done_in, jnp.max(cut.astype(jnp.float32), axis=1, keepdims=True)
    )
    a_eff = jnp.where(contrib, a, 0.0)
    # T after this chunk = T after the last contributing instance; taking the
    # masked min over the scan (T is monotone) avoids reduce_prod, which the
    # Mosaic lowering lacks, and stays bit-consistent with the blend weights.
    t_out = jnp.min(jnp.where(contrib, t_inc, t_in), axis=1, keepdims=True)
    return dict(
        a=a, g=g, dx=dx, dy=dy, alpha_raw=alpha_raw,
        t_exc=t_exc, contrib=contrib, a_eff=a_eff,
        done=done_out, t_out=t_out,
        rgb=f[6:9, :],
    )


def _pixel_coords(t, grid_x, width, height):
    """Per-tile pixel center coords (256,1) + validity mask."""
    tx = t % grid_x
    ty = t // grid_x
    p = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 1), 0)
    px = tx * TILE_X + p % TILE_X
    py = ty * TILE_Y + p // TILE_X
    pix_ok = (px < width) & (py < height)
    return px.astype(jnp.float32), py.astype(jnp.float32), pix_ok


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(grid_x, width, height, max_chunks,
                base_ref, ranges_ref, feat_hbm, color_ref, t_ref, nc_ref,
                buf, sem):
    t = pl.program_id(0)
    start = pl.multiple_of(ranges_ref[t, 0], K)  # binning guarantees K-aligned
    end = ranges_ref[t, 1]
    # base_ref[0] = first global tile of this strip (multi-chip tile
    # sharding); pixel coordinates are global.
    pxf, pyf, pix_ok = _pixel_coords(base_ref[0] + t, grid_x, width, height)

    n_chunks = jnp.minimum(pl.cdiv(end - start, K), max_chunks)

    def dma(i, slot):
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(start + i * K, K)],
            buf.at[slot],
            sem.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        dma(0, 0).start()

    def cond(c):
        i, _, _, _, done = c
        alive = jnp.min(jnp.where(pix_ok, done, 1.0)) < 0.5
        return (i < n_chunks) & alive

    def body(c):
        i, t_carry, acc, nc, done = c
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_chunks)
        def _():
            dma(i + 1, 1 - slot).start()

        dma(i, slot).wait()
        f = buf[slot]
        st = _chunk_state(f, pxf, pyf, start + i * K, end, t_carry, done, pix_ok)
        w = st["a_eff"] * st["t_exc"]  # (256, K) blend weights
        acc = acc + jax.lax.dot_general(
            w, st["rgb"], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (256, 3)
        nc = nc + jnp.sum(st["contrib"].astype(jnp.float32), axis=1,
                          keepdims=True)
        return i + 1, st["t_out"], acc, nc, st["done"]

    init = (
        jnp.int32(0),
        jnp.ones((NPIX, 1), jnp.float32),
        jnp.zeros((NPIX, 3), jnp.float32),
        jnp.zeros((NPIX, 1), jnp.float32),
        jnp.zeros((NPIX, 1), jnp.float32),
    )
    i_stop, t_fin, acc, nc, _ = jax.lax.while_loop(cond, body, init)
    nc = nc.astype(jnp.int32)

    # Early exit can leave the prefetched chunk DMA in flight; drain it so
    # the semaphore is clean for the next grid step.
    @pl.when(i_stop < n_chunks)
    def _():
        dma(i_stop, jax.lax.rem(i_stop, 2)).wait()
    color_ref[0] = acc
    t_ref[0] = t_fin
    nc_ref[0] = nc


def _zero_fill_tail(vbuf, out_hbm, sem, start, i_from, i_to):
    """Write zero chunks for slots [start+i_from*K, start+i_to*K)."""

    @pl.when(i_from < i_to)
    def _():
        vbuf[...] = jnp.zeros((FEAT_ROWS, K), jnp.float32)

        def zbody(i, _):
            dma = pltpu.make_async_copy(
                vbuf, out_hbm.at[:, pl.ds(start + i * K, K)], sem
            )
            dma.start()
            dma.wait()
            return 0

        jax.lax.fori_loop(i_from, i_to, zbody, 0)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(grid_x, width, height, max_chunks,
                base_ref, ranges_ref, feat_hbm, gcol_ref, gt_ref, col_ref,
                tfin_ref, dfeat_hbm, buf, dbuf, sem, dsem):
    t = pl.program_id(0)
    start = pl.multiple_of(ranges_ref[t, 0], K)  # binning guarantees K-aligned
    end = ranges_ref[t, 1]
    pxf, pyf, pix_ok = _pixel_coords(base_ref[0] + t, grid_x, width, height)

    n_chunks = jnp.minimum(pl.cdiv(end - start, K), max_chunks)
    g = gcol_ref[0]  # (256, 3) dL/dC
    g_t = gt_ref[0]  # (256, 1) dL/dT_final
    t_fin = tfin_ref[0]  # (256, 1)
    s_total = col_ref[0]  # (256, 3) total composited color (no bg)

    def dma_in(i, slot):
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(start + i * K, K)], buf.at[slot], sem.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _():
        dma_in(0, 0).start()

    def cond(c):
        i, _, _, _, done = c
        alive = jnp.min(jnp.where(pix_ok, done, 1.0)) < 0.5
        return (i < n_chunks) & alive

    def body(c):
        i, t_carry, prefix, done, _ = c
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_chunks)
        def _():
            dma_in(i + 1, 1 - slot).start()

        dma_in(i, slot).wait()
        f = buf[slot]
        st = _chunk_state(f, pxf, pyf, start + i * K, end, t_carry, done, pix_ok)
        a, t_exc, contrib = st["a"], st["t_exc"], st["contrib"]
        w = st["a_eff"] * t_exc  # (256, K)

        # dL/dcolor_i = sum_p w[p,i] * g[p,:]  -> (3, K)
        dcol = jax.lax.dot_general(
            g, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

        # suffix sums S_i[p,c] = sum_{j>i} w c_j = S_total - inclusive prefix
        one_m = jnp.where(contrib, 1.0 - a, 1.0)
        # per-channel: wc[p,i] = w * rgb_c[i]; prefix_incl over lanes
        dalpha = jnp.zeros((NPIX, K), jnp.float32)
        prefix_cols = []
        for ch in range(3):
            c_ch = st["rgb"][ch : ch + 1, :]  # (1, K)
            wc = w * c_ch
            pref_incl = prefix[:, ch : ch + 1] + _cumsum_incl_lanes(wc)
            s_i = s_total[:, ch : ch + 1] - pref_incl  # (256, K)
            g_ch = g[:, ch : ch + 1]
            dalpha = dalpha + g_ch * (c_ch * t_exc - s_i / one_m)
            prefix_cols.append(pref_incl[:, K - 1 : K])
        new_prefix = jnp.concatenate(prefix_cols, axis=1)  # (256, 3)
        # final-transmittance cotangent: dT_fin/dalpha_i = -T_fin/(1-a_i)
        dalpha = dalpha - g_t * t_fin / one_m
        dalpha = jnp.where(contrib, dalpha, 0.0)

        # NOTE: like the reference (backward.cu:577,596), the 0.99 alpha
        # clamp is NOT gated in the gradient — dL_dG = op * dL_dalpha and
        # dL_dop = G * dL_dalpha flow even for clamped splats.
        dop = st["g"] * dalpha
        dg = f[5:6, :] * dalpha
        dpower = st["g"] * dg
        dx, dy = st["dx"], st["dy"]
        cxx, cxy, cyy = f[2:3, :], f[3:4, :], f[4:5, :]

        def colsum(v):  # (256, K) -> (1, K)
            return jnp.sum(v, axis=0, keepdims=True)

        dmx = colsum(dpower * -(cxx * dx + cxy * dy))
        dmy = colsum(dpower * -(cyy * dy + cxy * dx))
        dcxx = colsum(dpower * (-0.5 * dx * dx))
        dcxy = colsum(dpower * (-dx * dy))
        dcyy = colsum(dpower * (-0.5 * dy * dy))
        dop_s = colsum(dop)

        dbuf[0:1, :] = dmx
        dbuf[1:2, :] = dmy
        dbuf[2:3, :] = dcxx
        dbuf[3:4, :] = dcxy
        dbuf[4:5, :] = dcyy
        dbuf[5:6, :] = dop_s
        dbuf[6:9, :] = dcol
        dbuf[9:16, :] = jnp.zeros((7, K), jnp.float32)
        out_dma = pltpu.make_async_copy(
            dbuf, dfeat_hbm.at[:, pl.ds(start + i * K, K)], dsem
        )
        out_dma.start()
        out_dma.wait()
        return i + 1, st["t_out"], new_prefix, st["done"], jnp.int32(0)

    init = (
        jnp.int32(0),
        jnp.ones((NPIX, 1), jnp.float32),
        jnp.zeros((NPIX, 3), jnp.float32),
        jnp.zeros((NPIX, 1), jnp.float32),
        jnp.int32(0),
    )
    i_stop, *_ = jax.lax.while_loop(cond, body, init)

    @pl.when(i_stop < n_chunks)
    def _():
        dma_in(i_stop, jax.lax.rem(i_stop, 2)).wait()

    # Early exit leaves later slots of this tile's range unwritten; their
    # gradients are exactly zero (no contribution is possible once every
    # pixel is done), so zero-fill them with DMA-only iterations.
    _zero_fill_tail(dbuf, dfeat_hbm, dsem, start, i_stop, n_chunks)


# ---------------------------------------------------------------------------
# transmittance kernel (inference-only; feeds SH culling)
# ---------------------------------------------------------------------------

def _trans_kernel(grid_x, width, height, max_chunks,
                  base_ref, ranges_ref, feat_hbm, acc_hbm, buf, abuf, sem,
                  asem):
    t = pl.program_id(0)
    start = pl.multiple_of(ranges_ref[t, 0], K)  # binning guarantees K-aligned
    end = ranges_ref[t, 1]
    pxf, pyf, pix_ok = _pixel_coords(base_ref[0] + t, grid_x, width, height)
    n_chunks = jnp.minimum(pl.cdiv(end - start, K), max_chunks)

    def dma_in(i, slot):
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(start + i * K, K)], buf.at[slot], sem.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _():
        dma_in(0, 0).start()

    def cond(c):
        i, _, done = c
        alive = jnp.min(jnp.where(pix_ok, done, 1.0)) < 0.5
        return (i < n_chunks) & alive

    def body(c):
        i, t_carry, done = c
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_chunks)
        def _():
            dma_in(i + 1, 1 - slot).start()

        dma_in(i, slot).wait()
        st = _chunk_state(buf[slot], pxf, pyf, start + i * K, end, t_carry,
                          done, pix_ok)
        # per-Gaussian mean-transmittance stats (forward.cu:560-565):
        # sum of blend-time T over contributing pixels + touched count
        trans = jnp.sum(jnp.where(st["contrib"], st["t_exc"], 0.0), axis=0,
                        keepdims=True)
        touch = jnp.sum(st["contrib"], axis=0, keepdims=True).astype(jnp.float32)
        abuf[0:1, :] = trans
        abuf[1:2, :] = touch
        abuf[2:16, :] = jnp.zeros((14, K), jnp.float32)
        out_dma = pltpu.make_async_copy(
            abuf, acc_hbm.at[:, pl.ds(start + i * K, K)], asem
        )
        out_dma.start()
        out_dma.wait()
        return i + 1, st["t_out"], st["done"]

    init = (jnp.int32(0), jnp.ones((NPIX, 1), jnp.float32),
            jnp.zeros((NPIX, 1), jnp.float32))
    i_stop, *_ = jax.lax.while_loop(cond, body, init)

    @pl.when(i_stop < n_chunks)
    def _():
        dma_in(i_stop, jax.lax.rem(i_stop, 2)).wait()

    _zero_fill_tail(abuf, acc_hbm, asem, start, i_stop, n_chunks)


# ---------------------------------------------------------------------------
# pallas_call builders (cached per static shape)
# ---------------------------------------------------------------------------

@functools.cache
def _build_fwd(num_tiles, grid_x, width, height, b_pad, max_chunks, interpret):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, NPIX, 3), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NPIX, 1), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NPIX, 1), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, FEAT_ROWS, K), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_fwd_kernel, grid_x, width, height, max_chunks)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, NPIX, 3), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, NPIX, 1), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, NPIX, 1), jnp.int32),
        ],
        interpret=interpret,
    )


@functools.cache
def _build_bwd(num_tiles, grid_x, width, height, b_pad, max_chunks, interpret):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # feat
            pl.BlockSpec((1, NPIX, 3), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),  # grad color
            pl.BlockSpec((1, NPIX, 1), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),  # grad T
            pl.BlockSpec((1, NPIX, 3), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),  # fwd color
            pl.BlockSpec((1, NPIX, 1), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),  # fwd T
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, FEAT_ROWS, K), jnp.float32),
            pltpu.VMEM((FEAT_ROWS, K), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(_bwd_kernel, grid_x, width, height, max_chunks)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((FEAT_ROWS, b_pad), jnp.float32)],
        interpret=interpret,
    )


@functools.cache
def _build_trans(num_tiles, grid_x, width, height, b_pad, max_chunks, interpret):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, FEAT_ROWS, K), jnp.float32),
            pltpu.VMEM((FEAT_ROWS, K), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(_trans_kernel, grid_x, width, height, max_chunks)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((FEAT_ROWS, b_pad), jnp.float32)],
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# packing / assembly helpers
# ---------------------------------------------------------------------------

def _pack_features(means2d, conic, opacity, color, gauss_id):
    """Gather aligned instances into a feature-major (16, B_pad) array.

    `gauss_id` comes from the K-aligned binning layout, so every tile's
    chunk DMA window [start, start + ceil(count/K)*K) stays in bounds.
    """
    rows = [
        means2d[gauss_id, 0], means2d[gauss_id, 1],
        conic[gauss_id, 0], conic[gauss_id, 1], conic[gauss_id, 2],
        opacity[gauss_id],
        color[gauss_id, 0], color[gauss_id, 1], color[gauss_id, 2],
    ]
    feat = jnp.stack(rows, axis=0)  # (9, B_pad)
    feat = jnp.pad(feat, ((0, FEAT_ROWS - 9), (0, 0)))
    return feat, gauss_id.shape[0]


def _tiles_to_image(tiles, grid_x, grid_y, width, height):
    """(T, 256, C?) tile-major -> (H, W, C?) image, cropped."""
    c = tiles.shape[2:] or ()
    img = tiles.reshape((grid_y, grid_x, TILE_Y, TILE_X) + c)
    img = jnp.moveaxis(img, 2, 1).reshape((grid_y * TILE_Y, grid_x * TILE_X) + c)
    return img[:height, :width]


def _image_to_tiles(img, grid_x, grid_y, width, height):
    c = img.shape[2:] or ()
    pad_y = grid_y * TILE_Y - height
    pad_x = grid_x * TILE_X - width
    img = jnp.pad(img, ((0, pad_y), (0, pad_x)) + ((0, 0),) * len(c))
    img = img.reshape((grid_y, TILE_Y, grid_x, TILE_X) + c)
    img = jnp.moveaxis(img, 1, 2).reshape((grid_y * grid_x, NPIX) + c)
    return img


# ---------------------------------------------------------------------------
# custom-VJP core: per-Gaussian arrays in, tile images out
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _rasterize_core(means2d, conic, opacity, color, gauss_id, ranges,
                    total_padded, base, width, height, num_rows):
    out, _ = _rasterize_fwd(means2d, conic, opacity, color, gauss_id, ranges,
                            total_padded, base, width, height, num_rows)
    return out


def _rasterize_fwd(means2d, conic, opacity, color, gauss_id, ranges,
                   total_padded, base, width, height, num_rows):
    grid_x, _ = tile_grid(width, height)
    num_tiles = num_rows * grid_x
    feat, b_pad = _pack_features(means2d, conic, opacity, color, gauss_id)
    max_chunks = pl.cdiv(gauss_id.shape[0], K)
    fwd = _build_fwd(num_tiles, grid_x, width, height, b_pad, max_chunks,
                     _interpret())
    col_t, t_t, nc_t = fwd(base, ranges, feat)
    out = (col_t, t_t, nc_t)
    res = (feat, gauss_id, ranges, total_padded, base, col_t, t_t,
           means2d.shape[0])
    return out, res


def _rasterize_bwd(width, height, num_rows, res, cot):
    feat, gauss_id, ranges, total_padded, base, col_t, t_t, num_p = res
    g_col, g_t, _ = cot
    grid_x, _ = tile_grid(width, height)
    num_tiles = num_rows * grid_x
    b_pad = feat.shape[1]
    b = gauss_id.shape[0]
    max_chunks = pl.cdiv(b, K)
    bwd = _build_bwd(num_tiles, grid_x, width, height, b_pad, max_chunks,
                     _interpret())
    (dfeat,) = bwd(base, ranges, feat, g_col, g_t, col_t, t_t)

    # slots past the aligned region were never written (garbage); inside
    # it, padding slots hold written zeros.
    slot = jnp.arange(b, dtype=jnp.int32)
    live = slot < total_padded
    dfeat = jnp.where(live[None, :], dfeat, 0.0)

    def seg(row):
        return jax.ops.segment_sum(row, gauss_id, num_segments=num_p)

    d_means2d = jnp.stack([seg(dfeat[0]), seg(dfeat[1])], axis=-1)
    d_conic = jnp.stack([seg(dfeat[2]), seg(dfeat[3]), seg(dfeat[4])], axis=-1)
    d_opacity = seg(dfeat[5])
    d_color = jnp.stack([seg(dfeat[6]), seg(dfeat[7]), seg(dfeat[8])], axis=-1)
    zero_i = np.zeros(gauss_id.shape, jax.dtypes.float0)
    zero_r = np.zeros(ranges.shape, jax.dtypes.float0)
    zero_n = np.zeros((), jax.dtypes.float0)
    zero_b = np.zeros(base.shape, jax.dtypes.float0)
    return (d_means2d, d_conic, d_opacity, d_color, zero_i, zero_r, zero_n,
            zero_b)


_rasterize_core.defvjp(_rasterize_fwd, _rasterize_bwd)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def tile_render(prep: PreprocessOut, binning: BinningOut, background,
                width: int, height: int, want_transmittance: bool = False,
                tile_rows=None):
    """Pallas-rendered image with reference-parity semantics.

    tile_rows=(r0, num_rows) renders only that horizontal strip of tile
    rows (multi-chip image sharding).  r0 may be a traced value (it comes
    from jax.lax.axis_index under shard_map); num_rows must be static.
    The strip image has exactly num_rows*16 pixel rows starting at
    r0*16; rows past the true image height composite to pure background
    (the kernels mask them) and are cropped by the caller.

    Returns (color (h,W,3), final_T (h,W), trans_sum (P,)|None,
    touched (P,)|None).
    """
    grid_x, grid_y = tile_grid(width, height)
    if tile_rows is None:
        r0, num_rows = 0, grid_y
        crop_h = height
    else:
        r0, num_rows = tile_rows
        crop_h = num_rows * TILE_Y
    ranges = binning.tile_ranges
    base = (jnp.asarray(r0, jnp.int32) * grid_x).reshape(1)
    col_t, t_t, _nc_t = _rasterize_core(
        prep.means2d, prep.conic, prep.opacity, prep.color,
        binning.gauss_id, ranges, binning.total_padded, base, width, height,
        num_rows,
    )
    color = _tiles_to_image(col_t, grid_x, num_rows, width, crop_h)
    t_fin = _tiles_to_image(t_t, grid_x, num_rows, width, crop_h)[:, :, 0]
    bg = jnp.asarray(background, jnp.float32)
    color = color + t_fin[:, :, None] * bg[None, None, :]

    g_trans = g_touch = None
    if want_transmittance:
        feat, b_pad = _pack_features(
            prep.means2d, prep.conic, prep.opacity, prep.color, binning.gauss_id
        )
        b = binning.gauss_id.shape[0]
        max_chunks = pl.cdiv(b, K)
        trans = _build_trans(num_rows * grid_x, grid_x, width, height, b_pad,
                             max_chunks, _interpret())
        (acc,) = trans(base, ranges, feat)
        slot = jnp.arange(b, dtype=jnp.int32)
        live = slot < binning.total_padded
        acc = jnp.where(live[None, :], acc, 0.0)
        num_p = prep.means2d.shape[0]
        g_trans = jax.ops.segment_sum(acc[0], binning.gauss_id,
                                      num_segments=num_p)
        g_touch = jax.ops.segment_sum(acc[1], binning.gauss_id,
                                      num_segments=num_p).astype(jnp.int32)
    return color, t_fin, g_trans, g_touch
