"""Pallas TPU tile rasterizer (forward + backward + transmittance).

The production replacement for the reference's per-tile CUDA kernels
(forward renderCUDA forward.cu:461-582, backward renderCUDA
backward.cu:437-595) with identical compositing semantics:

  alpha = min(0.99, opacity * exp(power)),  skip if power > 0 or alpha < 1/255
  stop the pixel before a blend that would push T below 1e-4
  C += c * alpha * T;  T *= 1 - alpha

Design (TPU-first, not a CUDA translation):

  * ONE grid step per kernel launch; an in-kernel fori_loop walks the
    tiles (Mosaic compile time explodes superlinearly past ~256 grid
    steps, and a TPU core runs grid steps sequentially anyway, so the
    loop is equivalent work with O(1) compile cost).
  * Within a tile, the 256 pixels live on the VPU sublane axis and a
    chunk of K=128 depth-sorted instances on the lane axis, so each
    (pixel, instance) pair is one vector lane — the analogue of the CUDA
    block's 256 threads x shared-memory batch, but with the sequential
    per-instance loop replaced by *parallel-scan compositing*: the
    front-to-back transmittance recurrence T_i = prod_{j<i}(1-a_j) is a
    log-depth Hillis-Steele scan over lanes; colour accumulation is a
    (256,K)@(K,3) MXU matmul.
  * All HBM buffers that the kernel slices are 2D with the large axis
    minor (Mosaic pads an array's minor dimension to 128, so a minor
    extent of 3/8/16 cannot be DMA-sliced): instance features/gradients
    are feature-major (16, B) arrays sliced in lane-aligned (16, K)
    chunks; per-pixel tile data (colors, transmittance, cotangents) are
    packed (8, T*256) arrays sliced as (8, 256) blocks, with one small
    transpose per tile to move between pixel-major compute vectors and
    the feature-major rows.
  * The binning layout starts every tile's range at a K-aligned offset
    (ops/binning.py), so a chunk window never crosses tiles.
  * Early exit: a carried per-pixel `done` mask (float32 — Mosaic cannot
    carry i1 vectors through scf.while); the chunk loop stops when every
    live pixel is done, draining the in-flight prefetch DMA.
  * The backward re-walks the same chunks *front-to-back* (not
    back-to-front like CUDA): with suffix sums expressed as
    (total - inclusive prefix), per-instance gradients fall out of the
    same scan structure, and the per-instance -> per-Gaussian reduction
    is a deterministic segment-sum (replacing CUDA float atomics).  Each
    instance belongs to exactly one tile, so gradient writes are
    conflict-free by construction; alignment-slack slots carry written
    zeros and the unwritten tail past `total_padded` is masked outside.
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
NPIX = TILE_X * TILE_Y  # 256 pixels per tile (sublanes in compute)
FEAT_ROWS = 16  # packed feature rows per instance
PIX_ROWS = 8  # packed per-pixel rows: [r, g, b, T, nc, 0, 0, 0]
ALPHA_CLAMP = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1.0e-4

_FORCE_INTERPRET = os.environ.get("R3DGS_PALLAS_INTERPRET", "") == "1"


def _interpret() -> bool:
    return _FORCE_INTERPRET or jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# lane-axis scans as MXU matmuls
#
# Lane shifts are expensive in the Mosaic lowering (cross-vreg permutes),
# so prefix sums along the K instance lanes are computed as one
# (256,K)@(K,K) triangular matmul on the MXU (~0.1us) instead of a
# log-depth shift network; the transmittance cumprod goes through
# log1p/exp around the matmul (f32 roundtrip error ~1e-7, far below the
# rasterizer's parity tolerances).
# ---------------------------------------------------------------------------

def _tri_incl():
    """(K, K) upper-triangular ones: (x @ T)[:, i] = sum_{j<=i} x[:, j]."""
    row = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    return (row <= col).astype(jnp.float32)


def _cumsum_incl_lanes(x):
    """Inclusive cumulative sum along lanes via the MXU.

    Precision.HIGHEST: the MXU natively multiplies bf16; default
    precision would run one bf16 pass (~1e-3 relative error) which leaks
    straight into the transmittance chain.  HIGHEST uses the f32
    multi-pass — these matmuls are tiny (256x128x128) so the extra
    passes are noise next to the DMA time.
    """
    return jax.lax.dot_general(
        x, _tri_incl(), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


# ---------------------------------------------------------------------------
# shared per-chunk compositing math — (256 pixels, K instances)
# ---------------------------------------------------------------------------

def _chunk_state(f, pxf, pyf, pix_ok, idx_global, end, t_in, done_in):
    """Recompute the blend state for one (256, K) chunk.

    f: (16, K) feature-major chunk; t_in/done_in: (256, 1) carries.
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
    lg = jnp.log1p(-a)
    cums = _cumsum_incl_lanes(lg)  # log prod_{j<=i} (1-a_j)
    t_inc = t_in * jnp.exp(cums)  # T after instance i
    t_exc = t_in * jnp.exp(cums - lg)  # T before instance i
    # `done_in` is a (256,1) float32 0/1 mask: Mosaic cannot carry i1
    # vectors through scf.while, so booleans live as floats in carries.
    not_done = done_in < 0.5
    live = valid & not_done
    contrib = live & (t_inc >= T_EPS)
    cut = live & (t_inc < T_EPS)
    done_out = jnp.maximum(
        done_in, jnp.max(cut.astype(jnp.float32), axis=1, keepdims=True)
    )
    a_eff = jnp.where(contrib, a, 0.0)
    # T after this chunk = T after the last contributing instance; the
    # masked min over the (monotone) scan avoids reduce_prod, which the
    # Mosaic lowering lacks, and stays bit-consistent with the weights.
    t_out = jnp.min(jnp.where(contrib, t_inc, t_in), axis=1, keepdims=True)
    return dict(
        a=a, g=g, dx=dx, dy=dy, alpha_raw=alpha_raw,
        t_exc=t_exc, contrib=contrib, a_eff=a_eff,
        done=done_out, t_out=t_out,
        rgb=f[6:9, :],  # (3, K)
    )


def _pixel_coords(t, grid_x, width, height):
    """Per-(global)tile pixel center coords (256,1) + validity mask."""
    tx = t % grid_x
    ty = t // grid_x
    p = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 1), 0)
    px = tx * TILE_X + p % TILE_X
    py = ty * TILE_Y + p // TILE_X
    pix_ok = (px < width) & (py < height)
    return px.astype(jnp.float32), py.astype(jnp.float32), pix_ok


def _zero_fill_tail(vbuf, out_hbm, sem, pend, start, i_from, i_to):
    """Write zero chunks for slots [start+i_from*K, start+i_to*K).

    vbuf/sem are slot 0 of the double-buffered output path; a pending
    slot-0 DMA is drained before the buffer is overwritten.  The zero
    DMAs all read the same (unchanging) buffer, so they are issued
    back-to-back and only the last one is awaited.
    """

    @pl.when(i_from < i_to)
    def _():
        @pl.when(pend[0] == 1)
        def _():
            pltpu.make_async_copy(
                vbuf, out_hbm.at[:, pl.ds(start, K)], sem).wait()

        pend[0] = 0
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
# forward kernel: single grid step, fori_loop over tiles
# ---------------------------------------------------------------------------

def _fwd_kernel(grid_x, width, height, max_chunks, num_tiles,
                base_ref, ranges_ref, feat_hbm, out_init_hbm, out_hbm,
                buf, obuf, pend, sem, osem):
    """Streaming forward: one double-buffered DMA pipeline over the GLOBAL
    chunk sequence.

    The K-aligned binning layout makes tile ranges contiguous in slot
    space, so chunk j always lives at slot offset j*K and the prefetch
    address never depends on tile boundaries.  Tile state (transmittance,
    color accumulators, pixel coords) is carried through the chunk loop
    and finalized/reset at tile boundaries; empty tiles occupy no chunks
    and their output comes from the input_output_aliased pre-filled
    buffer (color 0, T 1).  A per-pixel early exit finalizes a tile as
    soon as every pixel is saturated and jumps the stream past its
    remaining chunks (draining the one stale prefetch).
    """
    del out_init_hbm  # aliased to out_hbm
    base = base_ref[0]
    total_chunks = base_ref[1]
    pend[0] = 0
    pend[1] = 0

    def next_nonempty(t):
        # first tile index >= t with a nonempty range (clamped reads)
        def cond(tt):
            ts = jnp.minimum(tt, num_tiles - 1)
            return (tt < num_tiles) & (ranges_ref[1, ts] <= ranges_ref[0, ts])

        return jax.lax.while_loop(cond, lambda tt: tt + 1, t)

    def coords(t):
        ts = jnp.minimum(t, num_tiles - 1)
        pxf, pyf, pix_ok = _pixel_coords(base + ts, grid_x, width, height)
        return pxf, pyf, pix_ok.astype(jnp.float32)

    def dma(j, slot):
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(j * K, K)], buf.at[slot], sem.at[slot])

    t0 = next_nonempty(0)
    pxf0, pyf0, pok0 = coords(t0)

    def cond(c):
        return c[0] < total_chunks

    def body(c):
        (j, t, cold, t_carry, acc, nc, done, pxf, pyf, pokf) = c
        slot = jax.lax.rem(j, 2)

        @pl.when(cold == 1)
        def _():
            dma(j, slot).start()

        @pl.when(j + 1 < total_chunks)
        def _():
            dma(j + 1, 1 - slot).start()

        dma(j, slot).wait()

        start_t = ranges_ref[0, t]
        end_t = ranges_ref[1, t]
        st = _chunk_state(buf[slot], pxf, pyf, pokf > 0.5, j * K, end_t,
                          t_carry, done)
        w = st["a_eff"] * st["t_exc"]  # (256, K)
        acc = acc + jax.lax.dot_general(
            w, st["rgb"], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        nc = nc + jnp.sum(st["contrib"].astype(jnp.float32), axis=1,
                          keepdims=True)
        t_carry = st["t_out"]
        done = st["done"]

        last_idx = start_t // K + pl.cdiv(end_t - start_t, K) - 1
        is_last = j == last_idx
        all_done = jnp.min(jnp.where(pokf > 0.5, done, 1.0)) > 0.5
        do_fin = is_last | all_done
        jump = all_done & jnp.logical_not(is_last)

        @pl.when(jump & (j + 1 < total_chunks))
        def _():
            dma(j + 1, 1 - slot).wait()  # drain the stale prefetch

        @pl.when(do_fin)
        def _():
            oslot = jax.lax.rem(t, 2)

            def out_dma(sl):
                return pltpu.make_async_copy(
                    obuf.at[sl], out_hbm.at[:, pl.ds(t * NPIX, NPIX)],
                    osem.at[sl])

            @pl.when(pend[oslot] == 1)
            def _():
                out_dma(oslot).wait()  # waits sem/bytes of the prior DMA

            pix = jnp.concatenate(
                [acc, t_carry, nc,
                 jnp.zeros((NPIX, PIX_ROWS - 5), jnp.float32)], axis=1)
            obuf[oslot] = pix.T  # (8, 256)
            out_dma(oslot).start()
            pend[oslot] = 1

        j_next = jnp.where(do_fin, last_idx + 1, j + 1)
        cold_next = jnp.where(
            do_fin & (j_next != j + 1), jnp.int32(1), jnp.int32(0))
        t_next = jax.lax.cond(do_fin, lambda: next_nonempty(t + 1),
                              lambda: t)
        npx, npy, npo = coords(t_next)
        fin_f = do_fin.astype(jnp.float32)
        keep = 1.0 - fin_f
        return (
            j_next, t_next, cold_next,
            t_carry * keep + fin_f,  # reset T to 1
            acc * keep,
            nc * keep,
            done * keep,
            jnp.where(do_fin, npx, pxf),
            jnp.where(do_fin, npy, pyf),
            jnp.where(do_fin, npo, pokf),
        )

    init = (
        jnp.int32(0), t0, jnp.int32(1),
        jnp.ones((NPIX, 1), jnp.float32),
        jnp.zeros((NPIX, 3), jnp.float32),
        jnp.zeros((NPIX, 1), jnp.float32),
        jnp.zeros((NPIX, 1), jnp.float32),
        pxf0, pyf0, pok0,
    )
    jax.lax.while_loop(cond, body, init)

    def drain(sl):
        @pl.when(pend[sl] == 1)
        def _():
            pltpu.make_async_copy(
                obuf.at[sl], out_hbm.at[:, pl.ds(0, NPIX)], osem.at[sl]
            ).wait()

    drain(0)
    drain(1)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(grid_x, width, height, max_chunks, num_tiles,
                base_ref, ranges_ref, feat_hbm, gpix_hbm, spix_hbm,
                dfeat_hbm, buf, dbuf, gbuf, sbuf, pend, sem, dsem, isem):
    base = base_ref[0]
    pend[0] = 0
    pend[1] = 0

    def tile_body(t, _):
        start = pl.multiple_of(ranges_ref[0, t], K)
        end = ranges_ref[1, t]
        pxf, pyf, pix_ok = _pixel_coords(base + t, grid_x, width, height)
        n_chunks = jnp.minimum(pl.cdiv(end - start, K), max_chunks)

        # per-tile pixel inputs: cotangents + saved forward output
        i1 = pltpu.make_async_copy(
            gpix_hbm.at[:, pl.ds(t * NPIX, NPIX)], gbuf, isem.at[0])
        i2 = pltpu.make_async_copy(
            spix_hbm.at[:, pl.ds(t * NPIX, NPIX)], sbuf, isem.at[1])
        i1.start()
        i2.start()

        def dma_in(i, slot):
            return pltpu.make_async_copy(
                feat_hbm.at[:, pl.ds(start + i * K, K)],
                buf.at[slot], sem.at[slot],
            )

        @pl.when(n_chunks > 0)
        def _():
            dma_in(0, 0).start()

        i1.wait()
        i2.wait()
        gpix = gbuf[...].T  # (256, 8) pixel-major
        spix = sbuf[...].T
        g = gpix[:, 0:3]  # (256, 3) dL/dC
        g_t = gpix[:, 3:4]  # (256, 1) dL/dT_final
        s_total = spix[:, 0:3]  # (256, 3) composited color (no bg)
        t_fin = spix[:, 3:4]  # (256, 1)

        def cond(c):
            i, _, _, done = c
            alive = jnp.min(jnp.where(pix_ok, done, 1.0)) < 0.5
            return (i < n_chunks) & alive

        def body(c):
            i, t_carry, prefix, done = c
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_chunks)
            def _():
                dma_in(i + 1, 1 - slot).start()

            dma_in(i, slot).wait()
            f = buf[slot]
            st = _chunk_state(f, pxf, pyf, pix_ok, start + i * K, end,
                              t_carry, done)
            a, t_exc, contrib = st["a"], st["t_exc"], st["contrib"]
            w = st["a_eff"] * t_exc  # (256, K)

            # dL/dcolor_i = sum_p w[p,i] * g[p,:]  -> (3, K)
            dcol = jax.lax.dot_general(
                g, w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

            # suffix sums S_i = S_total - inclusive prefix, per channel
            one_m = jnp.where(contrib, 1.0 - a, 1.0)
            dalpha = jnp.zeros((NPIX, K), jnp.float32)
            prefix_cols = []
            for ch in range(3):
                c_ch = st["rgb"][ch: ch + 1, :]  # (1, K)
                wc = w * c_ch
                pref_incl = prefix[:, ch: ch + 1] + _cumsum_incl_lanes(wc)
                s_i = s_total[:, ch: ch + 1] - pref_incl  # (256, K)
                g_ch = g[:, ch: ch + 1]
                dalpha = dalpha + g_ch * (c_ch * t_exc - s_i / one_m)
                prefix_cols.append(pref_incl[:, K - 1: K])
            new_prefix = jnp.concatenate(prefix_cols, axis=1)  # (256, 3)
            # final-transmittance cotangent: dT_fin/dalpha_i = -T_fin/(1-a)
            dalpha = dalpha - g_t * t_fin / one_m
            dalpha = jnp.where(contrib, dalpha, 0.0)

            # NOTE: like the reference (backward.cu:577,596), the 0.99
            # alpha clamp is NOT gated in the gradient.
            dop = st["g"] * dalpha
            dg = f[5:6, :] * dalpha
            dpower = st["g"] * dg
            dx, dy = st["dx"], st["dy"]
            cxx, cxy, cyy = f[2:3, :], f[3:4, :], f[4:5, :]

            def colsum(v):  # (256, K) -> (1, K)
                return jnp.sum(v, axis=0, keepdims=True)

            # double-buffered output: drain the previous DMA on this
            # slot (same byte count, whatever tile issued it) before
            # overwriting, start the new one, never block on it here.
            ds = jax.lax.rem(i, 2)

            def out_dma(sl):
                return pltpu.make_async_copy(
                    dbuf.at[sl], dfeat_hbm.at[:, pl.ds(start + i * K, K)],
                    dsem.at[sl])

            @pl.when(pend[ds] == 1)
            def _():
                out_dma(ds).wait()

            dbuf[ds, 0:1, :] = colsum(dpower * -(cxx * dx + cxy * dy))
            dbuf[ds, 1:2, :] = colsum(dpower * -(cyy * dy + cxy * dx))
            dbuf[ds, 2:3, :] = colsum(dpower * (-0.5 * dx * dx))
            dbuf[ds, 3:4, :] = colsum(dpower * (-dx * dy))
            dbuf[ds, 4:5, :] = colsum(dpower * (-0.5 * dy * dy))
            dbuf[ds, 5:6, :] = colsum(dop)
            dbuf[ds, 6:9, :] = dcol
            dbuf[ds, 9:FEAT_ROWS, :] = jnp.zeros(
                (FEAT_ROWS - 9, K), jnp.float32)
            out_dma(ds).start()
            pend[ds] = 1
            return i + 1, st["t_out"], new_prefix, st["done"]

        init = (
            jnp.int32(0),
            jnp.ones((NPIX, 1), jnp.float32),
            jnp.zeros((NPIX, 3), jnp.float32),
            jnp.zeros((NPIX, 1), jnp.float32),
        )
        i_stop, *_ = jax.lax.while_loop(cond, body, init)

        @pl.when(i_stop < n_chunks)
        def _():
            dma_in(i_stop, jax.lax.rem(i_stop, 2)).wait()

        # Early exit leaves later slots of this tile's range unwritten;
        # their gradients are exactly zero (no contribution is possible
        # once every pixel is done) — zero-fill with DMA-only iterations.
        _zero_fill_tail(dbuf.at[0], dfeat_hbm, dsem.at[0], pend, start,
                        i_stop, n_chunks)
        return 0

    jax.lax.fori_loop(0, num_tiles, tile_body, 0)

    def drain(sl):
        @pl.when(pend[sl] == 1)
        def _():
            pltpu.make_async_copy(
                dbuf.at[sl], dfeat_hbm.at[:, pl.ds(0, K)], dsem.at[sl]
            ).wait()

    drain(0)
    drain(1)


# ---------------------------------------------------------------------------
# transmittance kernel (inference-only; feeds SH culling)
# ---------------------------------------------------------------------------

def _trans_kernel(grid_x, width, height, max_chunks, num_tiles,
                  base_ref, ranges_ref, feat_hbm, acc_hbm,
                  buf, abuf, pend, sem, asem):
    base = base_ref[0]
    pend[0] = 0
    pend[1] = 0

    def tile_body(t, _):
        start = pl.multiple_of(ranges_ref[0, t], K)
        end = ranges_ref[1, t]
        pxf, pyf, pix_ok = _pixel_coords(base + t, grid_x, width, height)
        n_chunks = jnp.minimum(pl.cdiv(end - start, K), max_chunks)

        def dma_in(i, slot):
            return pltpu.make_async_copy(
                feat_hbm.at[:, pl.ds(start + i * K, K)],
                buf.at[slot], sem.at[slot],
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
            st = _chunk_state(buf[slot], pxf, pyf, pix_ok, start + i * K,
                              end, t_carry, done)
            ds = jax.lax.rem(i, 2)

            def out_dma(sl):
                return pltpu.make_async_copy(
                    abuf.at[sl], acc_hbm.at[:, pl.ds(start + i * K, K)],
                    asem.at[sl])

            @pl.when(pend[ds] == 1)
            def _():
                out_dma(ds).wait()

            # per-Gaussian mean-transmittance stats (forward.cu:560-565)
            abuf[ds, 0:1, :] = jnp.sum(
                jnp.where(st["contrib"], st["t_exc"], 0.0), axis=0,
                keepdims=True)
            abuf[ds, 1:2, :] = jnp.sum(
                st["contrib"].astype(jnp.float32), axis=0, keepdims=True)
            abuf[ds, 2:FEAT_ROWS, :] = jnp.zeros(
                (FEAT_ROWS - 2, K), jnp.float32)
            out_dma(ds).start()
            pend[ds] = 1
            return i + 1, st["t_out"], st["done"]

        init = (jnp.int32(0), jnp.ones((NPIX, 1), jnp.float32),
                jnp.zeros((NPIX, 1), jnp.float32))
        i_stop, *_ = jax.lax.while_loop(cond, body, init)

        @pl.when(i_stop < n_chunks)
        def _():
            dma_in(i_stop, jax.lax.rem(i_stop, 2)).wait()

        _zero_fill_tail(abuf.at[0], acc_hbm, asem.at[0], pend, start,
                        i_stop, n_chunks)
        return 0

    jax.lax.fori_loop(0, num_tiles, tile_body, 0)

    def drain(sl):
        @pl.when(pend[sl] == 1)
        def _():
            pltpu.make_async_copy(
                abuf.at[sl], acc_hbm.at[:, pl.ds(0, K)], asem.at[sl]
            ).wait()

    drain(0)
    drain(1)


# ---------------------------------------------------------------------------
# pallas_call builders (cached per static shape)
# ---------------------------------------------------------------------------

def _grid_spec(num_inputs, num_outputs, scratch_shapes):
    # base (+total_chunks) and the (2, num_tiles) int32 tile ranges are
    # scalar-prefetch operands: they live in SMEM, where Mosaic supports
    # fully dynamic scalar indexing (a VMEM vector.load of ranges[1, t]
    # cannot be proven lane-aligned and fails to compile on hardware).
    # At 1080p the ranges are 2*8160*4 = 65 KB of SMEM.
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # base (+ total_chunks), tile ranges
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * num_inputs,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * num_outputs,
        scratch_shapes=scratch_shapes,
    )


@functools.cache
def _build_fwd(num_tiles, grid_x, width, height, b_pad, max_chunks,
               interpret):
    kernel = functools.partial(_fwd_kernel, grid_x, width, height,
                               max_chunks, num_tiles)
    return pl.pallas_call(
        kernel,
        grid_spec=_grid_spec(2, 1, [
            pltpu.VMEM((2, FEAT_ROWS, K), jnp.float32),
            pltpu.VMEM((2, PIX_ROWS, NPIX), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]),
        out_shape=[
            jax.ShapeDtypeStruct((PIX_ROWS, num_tiles * NPIX), jnp.float32),
        ],
        # aliases the pre-filled out_init input (index counts the scalar
        # prefetch operands first: base=0, ranges=1, feat=2, out_init=3)
        input_output_aliases={3: 0},
        interpret=interpret,
    )


@functools.cache
def _build_bwd(num_tiles, grid_x, width, height, b_pad, max_chunks,
               interpret):
    kernel = functools.partial(_bwd_kernel, grid_x, width, height,
                               max_chunks, num_tiles)
    return pl.pallas_call(
        kernel,
        grid_spec=_grid_spec(3, 1, [
            pltpu.VMEM((2, FEAT_ROWS, K), jnp.float32),
            pltpu.VMEM((2, FEAT_ROWS, K), jnp.float32),
            pltpu.VMEM((PIX_ROWS, NPIX), jnp.float32),
            pltpu.VMEM((PIX_ROWS, NPIX), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]),
        out_shape=[jax.ShapeDtypeStruct((FEAT_ROWS, b_pad), jnp.float32)],
        interpret=interpret,
    )


@functools.cache
def _build_trans(num_tiles, grid_x, width, height, b_pad, max_chunks,
                 interpret):
    kernel = functools.partial(_trans_kernel, grid_x, width, height,
                               max_chunks, num_tiles)
    return pl.pallas_call(
        kernel,
        grid_spec=_grid_spec(1, 1, [
            pltpu.VMEM((2, FEAT_ROWS, K), jnp.float32),
            pltpu.VMEM((2, FEAT_ROWS, K), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]),
        out_shape=[jax.ShapeDtypeStruct((FEAT_ROWS, b_pad), jnp.float32)],
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# packing / assembly helpers
# ---------------------------------------------------------------------------

def _pack_features(means2d, conic, opacity, color, binning: BinningOut):
    """Gather aligned instances into a feature-major (16, B_pad) array.

    ONE contiguous row gather (gather cost on TPU is per descriptor, not
    per byte, so nine element-wise gathers would be ~20x slower).  The
    aligned primitive-id layout comes from binning's alignment sort.
    Padding slots pull primitive 0's row but sit outside every tile's
    [start, end) range, so the kernels' in-range mask discards them.
    """
    per_gaussian = jnp.concatenate(
        [means2d, conic, opacity[:, None], color,
         jnp.zeros((means2d.shape[0], FEAT_ROWS - 9), means2d.dtype)],
        axis=1,
    )  # (P, 16)
    feat = per_gaussian[binning.gauss_id()]  # (B_pad, 16) row gather
    return feat.T, binning.pad_mask.shape[0]


def _packed_to_images(packed, grid_x, grid_y, width, height):
    """(PIX_ROWS, T*256) -> color (H,W,3), t_fin (H,W), nc (H,W)."""
    img = packed.reshape(PIX_ROWS, grid_y, grid_x, TILE_Y, TILE_X)
    img = img.transpose(1, 3, 2, 4, 0).reshape(
        grid_y * TILE_Y, grid_x * TILE_X, PIX_ROWS)
    img = img[:height, :width]
    return img[:, :, 0:3], img[:, :, 3], img[:, :, 4]


# ---------------------------------------------------------------------------
# custom-VJP core: per-Gaussian arrays in, packed tile rows out
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _rasterize_core(means2d, conic, opacity, color, binning, base,
                    width, height, num_rows):
    out, _ = _core_fwd(means2d, conic, opacity, color, binning, base,
                       width, height, num_rows)
    return out


def _core_fwd(means2d, conic, opacity, color, binning, base, width, height,
              num_rows):
    grid_x, _ = tile_grid(width, height)
    num_tiles = num_rows * grid_x
    feat, b_pad = _pack_features(means2d, conic, opacity, color, binning)
    max_chunks = pl.cdiv(b_pad, K)
    fwd = _build_fwd(num_tiles, grid_x, width, height, b_pad, max_chunks,
                     _interpret())
    # empty-tile answer: color 0, T 1.  Built with a runtime dependency so
    # XLA cannot constant-fold it into a giant literal (at 1080p this is a
    # 67 MB array; folding it stalls the remote AOT compile).
    is_t_row = (jax.lax.broadcasted_iota(
        jnp.int32, (PIX_ROWS, num_tiles * NPIX), 0) == 3)
    one = (binning.num_rendered * 0 + 1).astype(jnp.float32)
    out_init = jnp.where(is_t_row, one, 0.0)
    base2 = jnp.concatenate([base, (binning.total_padded // K).reshape(1)])
    ranges2 = binning.tile_ranges.T  # (2, num_tiles) for VMEM tiling
    (packed,) = fwd(base2, ranges2, feat, out_init)
    res = (feat, binning, base, packed, means2d.shape[0])
    return packed, res


def _core_bwd(width, height, num_rows, res, g_packed):
    feat, binning, base, packed, num_p = res
    grid_x, _ = tile_grid(width, height)
    num_tiles = num_rows * grid_x
    b_pad = binning.pad_mask.shape[0]
    max_chunks = pl.cdiv(b_pad, K)
    bwd = _build_bwd(num_tiles, grid_x, width, height, b_pad, max_chunks,
                     _interpret())
    (dfeat,) = bwd(base, binning.tile_ranges.T, feat, g_packed, packed)

    # ONE row segment-sum per Gaussian.  Alignment-slack slots carry
    # written zeros; the unwritten tail past total_padded is dropped via
    # the sentinel segment id.
    slot = jnp.arange(b_pad, dtype=jnp.int32)
    seg_id = jnp.where(
        binning.pad_mask | (slot >= binning.total_padded),
        num_p, binning.gauss_aligned)
    dsum = jax.ops.segment_sum(dfeat.T, seg_id,
                               num_segments=num_p + 1)[:num_p]  # (P, 16)

    d_means2d = dsum[:, 0:2]
    d_conic = dsum[:, 2:5]
    d_opacity = dsum[:, 5]
    d_color = dsum[:, 6:9]
    zero_bin = jax.tree.map(
        lambda x: np.zeros(x.shape, jax.dtypes.float0), binning)
    zero_base = np.zeros(base.shape, jax.dtypes.float0)
    return (d_means2d, d_conic, d_opacity, d_color, zero_bin, zero_base)


_rasterize_core.defvjp(_core_fwd, _core_bwd)


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
    base = (jnp.asarray(r0, jnp.int32) * grid_x).reshape(1)
    packed = _rasterize_core(
        prep.means2d, prep.conic, prep.opacity, prep.color,
        binning, base, width, height, num_rows,
    )
    color, t_fin, _nc = _packed_to_images(packed, grid_x, num_rows, width,
                                          crop_h)
    bg = jnp.asarray(background, jnp.float32)
    color = color + t_fin[:, :, None] * bg[None, None, :]

    g_trans = g_touch = None
    if want_transmittance:
        feat, b_pad = _pack_features(
            prep.means2d, prep.conic, prep.opacity, prep.color, binning)
        max_chunks = pl.cdiv(b_pad, K)
        trans = _build_trans(num_rows * grid_x, grid_x, width, height,
                             b_pad, max_chunks, _interpret())
        base2 = jnp.concatenate(
            [base, (binning.total_padded // K).reshape(1)])
        (acc,) = trans(base2, binning.tile_ranges.T, feat)
        num_p = prep.means2d.shape[0]
        slot = jnp.arange(b_pad, dtype=jnp.int32)
        seg_id = jnp.where(
            binning.pad_mask | (slot >= binning.total_padded),
            num_p, binning.gauss_aligned)
        asum = jax.ops.segment_sum(acc.T[:, 0:2], seg_id,
                                   num_segments=num_p + 1)[:num_p]
        g_trans = asum[:, 0]
        g_touch = asum[:, 1].astype(jnp.int32)
    return color, t_fin, g_trans, g_touch
