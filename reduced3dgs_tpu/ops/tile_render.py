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
    triangular matmul (log-space prefix sum) on the MXU; the Gaussian
    exponent is a quadratic-basis matmul; colour accumulation is a
    (256,K)@(K,3) MXU matmul — the VPU keeps only the transcendentals
    and masking.
  * Instance features and gradients are FEATURE-MAJOR (16, B_pad)
    arrays (9 live rows + sublane-alignment pad) — the natural output
    layout of the big feature gather and the natural input layout of
    the per-Gaussian reduction — and each chunk is the (16, K) lane
    window at [j*K, (j+1)*K), moved by ONE in-kernel DMA of 16 strided
    512 B segments that the double buffer hides behind ~400 ns of
    per-chunk compute.  Per-pixel tile data
    (colors, transmittance, cotangents) stay chunk-major (T, 8, 256)
    blocks.  The minor dim stays 128-wide for Mosaic; one small
    transpose per tile moves between pixel-major compute vectors and
    the packed rows.
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

from reduced3dgs_tpu.ops.binning import ALIGN, BinningOut
from reduced3dgs_tpu.ops.preprocess import TILE_X, TILE_Y, PreprocessOut, tile_grid

# Instance chunk width (lanes per loop iteration) = binning alignment.
# Measured on v5e: the kernels are compute-throughput-bound on the total
# number of walked instance slots, so the chunk is kept at one vreg row
# (128) — wider chunks amortize loop overhead but grow the per-tile
# alignment slack (num_tiles * K slots), a measured net loss (K=512 was
# 17% slower at 512p).  Scans decompose into 128-wide blocks either way.
K = ALIGN  # = 128
K0 = 128  # scan block (one MXU tile side)
NPIX = TILE_X * TILE_Y  # 256 pixels per tile (sublanes in compute)
# Packed feature rows per instance through the kernels.  Mosaic requires
# DMA slice shapes sublane-aligned (multiples of 8): a (2, 9, K) double
# buffer puts slot 1 at row 9 — unaligned — and "Mosaic failed to
# compile TPU kernel: Slice shape along dimension 0 must be aligned to
# tiling (8), but is 9".  So the kernels keep 16 rows; the GATHER TABLE
# carries only the 9 live values [x, y, cxx, cxy, cyy, op, r, g, b]
# (TABLE_ROWS) — at 1080p the (P, 16) f32 table (33 MB) sat past the
# VMEM-residency knee (measured 1.8 -> 7 ns/row), and one cheap B-sized
# pad after the gather restores the aligned kernel layout.
FEAT_ROWS = 16
TABLE_ROWS = 9
PIX_ROWS = 8  # packed per-pixel rows: [r, g, b, T, 0, 0, 0, 0]
ALPHA_CLAMP = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1.0e-4

_FORCE_INTERPRET = os.environ.get("R3DGS_PALLAS_INTERPRET", "") == "1"


def _interpret() -> bool:
    return _FORCE_INTERPRET or jax.default_backend() != "tpu"


# Rejection threshold for the (MXU-evaluated) exponent.  The reference
# kernel skips power > 0 (forward.cu:477) — analytically impossible for
# a PSD conic (the +0.3 low-pass guarantees PSD), so the test only
# guards garbage; evaluating power on the MXU leaves ~1e-4 absolute
# error near zero, and a hard 0 test would chaotically drop peak
# (pixel==center) lanes.  Accepting up to +POWER_EPS and clamping the
# exponent to <=0 keeps every analytically-valid lane and changes alpha
# by at most opacity*POWER_EPS.
POWER_EPS = 1.0e-3
_HALF_X = (TILE_X - 1) * 0.5
_HALF_Y = (TILE_Y - 1) * 0.5


# ---------------------------------------------------------------------------
# lane-axis scans as MXU matmuls
#
# Lane shifts are expensive in the Mosaic lowering (cross-vreg permutes),
# so prefix sums along the K instance lanes are computed as triangular
# matmuls on the MXU instead of a log-depth shift network; the
# transmittance cumprod goes through log1p/exp around the matmul (f32
# roundtrip error ~1e-7, far below the rasterizer's parity tolerances).
# ---------------------------------------------------------------------------

def _tri(excl):
    """(K0, K0) triangular ones: (x @ T)[:, i] = sum over j<=i (or j<i)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (K0, K0), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (K0, K0), 1)
    return ((row < col) if excl else (row <= col)).astype(jnp.float32)


# Mosaic exposes only DEFAULT (one bf16 pass, ~4e-3 input rounding) and
# HIGHEST (six passes).  One pass is too coarse for the transmittance
# chain; six is 3x more MXU time than needed.  We emulate the 2/3-pass
# middle ground by hand: x = hi + lo with hi the bf16 rounding of x —
# hi is *exactly* representable in bf16, so a DEFAULT matmul of hi
# against an exactly-representable operand is error-free, and the lo
# residual (|lo| <= 4e-3|x|) carries the correction in a second pass.


def _bf16_split(x):
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _mm1(a, b, dims):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _mm_xb(a, b, dims):
    """a @ b with `a` exactly bf16-representable: split b, 2 passes."""
    b_hi, b_lo = _bf16_split(b)
    return _mm1(a, b_hi, dims) + _mm1(a, b_lo, dims)




def _mm_x3(a, b, dims):
    """a @ b with both operands general f32: 3 passes (~2e-6 relative,
    the hand-rolled equivalent of the BF16_BF16_F32_X3 algorithm)."""
    a_hi, a_lo = _bf16_split(a)
    b_hi, b_lo = _bf16_split(b)
    return (_mm1(a_hi, b_hi, dims) + _mm1(a_hi, b_lo, dims)
            + _mm1(a_lo, b_hi, dims))


def _scan_lanes(x, excl=False):
    """(In/Ex)clusive cumulative sum along the K lanes via the MXU.

    Hierarchical: each 128-lane block is one triangular matmul (so MXU
    cost stays linear in K instead of K^2), chained by a per-block total
    carried in f32.  The triangular ones-matrix is exact in bf16, so the
    split-x 2-pass scheme gives f32-grade prefix sums (|x| <= |log T_EPS|
    ~ 9.2, so the residual pass bounds the error by ~4e-6 absolute)."""
    t = _tri(excl)
    d = ((1,), (0,))
    outs = []
    carry = None
    for s in range(K // K0):
        blk = x[:, s * K0:(s + 1) * K0]
        b_hi, b_lo = _bf16_split(blk)
        sc = _mm1(b_hi, t, d) + _mm1(b_lo, t, d)
        outs.append(sc if carry is None else sc + carry)
        if s + 1 < K // K0:
            tot = jnp.sum(blk, axis=1, keepdims=True)
            carry = tot if carry is None else carry + tot
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


# ---------------------------------------------------------------------------
# shared per-chunk compositing math — (256 pixels, K instances)
#
# The Gaussian exponent power(p, i) = -0.5 dx'Cdx is a quadratic in the
# pixel coords, so for a whole chunk it is ONE (256,8)@(8,K) MXU matmul
# power = basis @ coef: `basis` is a constant per-pixel quadratic basis
# in tile-centered coordinates (the centering bounds every product term
# by ~(3 + 16/sigma)^2, keeping the f32 expansion error ~1e-4 — raw
# pixel coords would lose ~half the mantissa to cancellation), and
# `coef` collects the per-instance conic/center terms with ~12 cheap
# (1,K) ops.  This replaces ~10 full (256,K) VPU ops per chunk.
# ---------------------------------------------------------------------------

def _make_basis():
    """Constant (256, 8) quadratic pixel basis, tile-centered:
    [px'^2, px'py', py'^2, px', py', 1, 0, 0]."""
    p = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 1), 0)
    pxc = (p % TILE_X).astype(jnp.float32) - _HALF_X
    pyc = (p // TILE_X).astype(jnp.float32) - _HALF_Y
    one = jnp.ones((NPIX, 1), jnp.float32)
    zero = jnp.zeros((NPIX, 2), jnp.float32)
    return jnp.concatenate(
        [pxc * pxc, pxc * pyc, pyc * pyc, pxc, pyc, one, zero], axis=1)


def _chunk_state(f, basis, cx, cy, idx_global, end, t_in, done_in):
    """Recompute the blend state for one (256, K) chunk.

    f: (16, K) feature-major chunk; basis: (256, 8) constant pixel
    basis; cx/cy: scalar tile-center pixel coords; t_in/done_in:
    (256, 1) carries.  Pixels outside the image are handled by seeding
    done_in=1 at tile start (they never contribute); `done_in` is a
    (256,1) float32 0/1 mask — Mosaic cannot carry i1 vectors through
    scf.while, so booleans live as floats in carries.
    """
    x = f[0:1, :] - cx  # tile-centered instance coords (1, K)
    y = f[1:2, :] - cy
    cxx = f[2:3, :]
    cxy = f[3:4, :]
    cyy = f[4:5, :]
    op = f[5:6, :]

    c3 = cxx * x + cxy * y
    c4 = cyy * y + cxy * x
    c5 = -0.5 * (cxx * x * x + cyy * y * y) - cxy * x * y
    coef = jnp.concatenate(
        [-0.5 * cxx, -cxy, -0.5 * cyy, c3, c4, c5,
         jnp.zeros((2, K), jnp.float32)], axis=0)  # (8, K)
    # 2-pass split in EVERY mode: a 1-pass bf16 exponent was measured
    # quality-neutral (A/B round 4) but NOT faster (155.7 vs 153.4 ms
    # at 1080p — the second pass hides behind the chunk DMA), so the
    # precision is free.
    power = _mm_xb(basis, coef, ((1,), (0,)))  # (256, K)
    # Mask-chain fusion (round-5 VPU trim): the range test folds into
    # the (1, K) opacity lanes and the power test folds into g, so the
    # old 3-term (256, K) `valid` mask never materializes — alpha is 0
    # exactly where any validity test fails, and `live` is one compare.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    opm = jnp.where((idx_global + lane) < end, op, 0.0)  # (1, K)
    g = jnp.where(power <= POWER_EPS,
                  jnp.exp(jnp.minimum(power, 0.0)), 0.0)
    alpha = jnp.minimum(ALPHA_CLAMP, opm * g)
    live = alpha >= ALPHA_MIN
    a = jnp.where(live, alpha, 0.0)
    lg = jnp.log1p(-a)
    exc = _scan_lanes(lg, excl=True)  # log prod_{j<i} (1-a_j)
    t_exc = t_in * jnp.exp(exc)  # T before instance i
    t_inc = t_exc * (1.0 - a)  # T after instance i
    not_done = done_in < 0.5
    contrib = live & not_done & (t_inc >= T_EPS)
    # t_inc is monotone along lanes (a >= 0), so "some pixel crossed
    # T_EPS in this chunk" is just the last column — no lane reduction.
    t_last = t_inc[:, K - 1: K]
    done_out = jnp.maximum(done_in,
                           (t_last < T_EPS).astype(jnp.float32))
    a_eff = jnp.where(contrib, a, 0.0)
    # T after this chunk = T after the last contributing instance; the
    # masked min over the (monotone) scan avoids reduce_prod, which the
    # Mosaic lowering lacks, and stays bit-consistent with the weights.
    t_out = jnp.min(jnp.where(contrib, t_inc, t_in), axis=1, keepdims=True)
    return dict(
        a=a, g=g, x=x, y=y,
        t_exc=t_exc, contrib=contrib, a_eff=a_eff,
        done=done_out, t_out=t_out,
        rgb=f[6:9, :],  # (3, K)
    )


def _tile_info(t, grid_x, width, height):
    """Scalar tile-center coords + (256,1) f32 pixel-validity mask."""
    tx = t % grid_x
    ty = t // grid_x
    cx = tx.astype(jnp.float32) * TILE_X + _HALF_X
    cy = ty.astype(jnp.float32) * TILE_Y + _HALF_Y
    p = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 1), 0)
    px = tx * TILE_X + p % TILE_X
    py = ty * TILE_Y + p // TILE_X
    pix_ok = (px < width) & (py < height)
    return cx, cy, pix_ok.astype(jnp.float32)


def _zero_fill_tail(vbuf, dst, sem, pend, c0, i_from, i_to):
    """Write zero chunks for chunk slots [c0+i_from, c0+i_to).

    dst(j) is the HBM destination window of chunk j.  vbuf/sem
    are slot 0 of the double-buffered output path; a pending slot-0 DMA
    is drained before the buffer is overwritten.  The zero DMAs all
    read the same (unchanging) buffer, so they are issued back-to-back
    and only the last one is awaited.
    """

    @pl.when(i_from < i_to)
    def _():
        @pl.when(pend[0] == 1)
        def _():
            pltpu.make_async_copy(vbuf, dst(c0), sem).wait()

        pend[0] = 0
        vbuf[...] = jnp.zeros(vbuf.shape, vbuf.dtype)

        def zbody(i, _):
            dma = pltpu.make_async_copy(vbuf, dst(c0 + i), sem)
            dma.start()
            dma.wait()
            return 0

        jax.lax.fori_loop(i_from, i_to, zbody, 0)


# ---------------------------------------------------------------------------
# forward kernel: single grid step, fori_loop over tiles
# ---------------------------------------------------------------------------

def _fwd_kernel(grid_x, width, height, max_chunks, num_tiles, fast,
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
    basis = _make_basis()

    def next_nonempty(t):
        # first tile index >= t with a nonempty range (clamped reads)
        def cond(tt):
            ts = jnp.minimum(tt, num_tiles - 1)
            return (tt < num_tiles) & (ranges_ref[1, ts] <= ranges_ref[0, ts])

        return jax.lax.while_loop(cond, lambda tt: tt + 1, t)

    def coords(t):
        ts = jnp.minimum(t, num_tiles - 1)
        return _tile_info(base + ts, grid_x, width, height)

    def dma(j, slot):
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(j * K, K)], buf.at[slot], sem.at[slot])

    t0 = next_nonempty(0)
    cx0, cy0, pok0 = coords(t0)

    def cond(c):
        return c[0] < total_chunks

    def body(c):
        (j, t, cold, t_carry, acc, done, cx, cy) = c
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
        st = _chunk_state(buf[slot], basis, cx, cy, j * K, end_t,
                          t_carry, done)
        w = st["a_eff"] * st["t_exc"]  # (256, K)
        # f32 mode: 3-pass split matmul (~2e-6 relative, parity-grade).
        # fast (bf16x2) mode: ONE bf16 pass — ~4e-3 relative on the
        # image, the same rounding class the mode already accepts on
        # its gradients (quality-neutral per the A/B in PROFILE.md).
        mm_acc = _mm1 if fast else _mm_x3
        acc = acc + mm_acc(w, st["rgb"], ((1,), (1,)))
        t_carry = st["t_out"]
        done = st["done"]

        last_idx = start_t // K + pl.cdiv(end_t - start_t, K) - 1
        is_last = j == last_idx
        all_done = jnp.min(done) > 0.5
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
                    obuf.at[sl], out_hbm.at[t], osem.at[sl])

            @pl.when(pend[oslot] == 1)
            def _():
                out_dma(oslot).wait()  # waits sem/bytes of the prior DMA

            pix = jnp.concatenate(
                [acc, t_carry,
                 jnp.zeros((NPIX, PIX_ROWS - 4), jnp.float32)], axis=1)
            obuf[oslot] = pix.T  # (8, 256)
            out_dma(oslot).start()
            pend[oslot] = 1

        j_next = jnp.where(do_fin, last_idx + 1, j + 1)
        cold_next = jnp.where(
            do_fin & (j_next != j + 1), jnp.int32(1), jnp.int32(0))
        t_next = jax.lax.cond(do_fin, lambda: next_nonempty(t + 1),
                              lambda: t)
        ncx, ncy, npo = coords(t_next)
        fin_f = do_fin.astype(jnp.float32)
        keep = 1.0 - fin_f
        return (
            j_next, t_next, cold_next,
            t_carry * keep + fin_f,  # reset T to 1
            acc * keep,
            # dead (cropped) pixels start done so they never contribute
            done * keep + fin_f * (1.0 - npo),
            jnp.where(do_fin, ncx, cx),
            jnp.where(do_fin, ncy, cy),
        )

    init = (
        jnp.int32(0), t0, jnp.int32(1),
        jnp.ones((NPIX, 1), jnp.float32),
        jnp.zeros((NPIX, 3), jnp.float32),
        1.0 - pok0,  # cropped pixels start done
        cx0, cy0,
    )
    jax.lax.while_loop(cond, body, init)

    def drain(sl):
        @pl.when(pend[sl] == 1)
        def _():
            pltpu.make_async_copy(
                obuf.at[sl], out_hbm.at[0], osem.at[sl]
            ).wait()

    drain(0)
    drain(1)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(grid_x, width, height, max_chunks, num_tiles, fast,
                base_ref, ranges_ref, feat_hbm, gpix_hbm, spix_hbm,
                dfeat_hbm, buf, dbuf, gbuf, sbuf, pend, sem, dsem, isem):
    """Backward tile walk.

    Gradient structure (replacing the 3 per-channel suffix scans and 6
    full-size reductions of the naive formulation):

      * the channel sum collapses into ONE scan by linearity:
        sum_ch g_ch * cumsum(w * c_ch) = cumsum(w * (g @ rgb)), so
        dalpha = gc*t_exc - (q - Pgc)/(1-a) with gc = g @ rgb (one small
        MXU matmul), q = g.s_total + g_t*T_fin (per-tile scalar), and a
        single lane scan of w*gc;
      * all geometric gradients come from moments M = basis^T @ dpower
        (ONE (8,256)@(256,K) matmul): with dx = x' - px', the reductions
        sum_p dpower*dx^2 etc. expand into combinations of the quadratic
        moments, evaluated with ~25 cheap (1,K) ops — this replaces the
        six (256,K) products + column reductions AND the dx/dy arrays.

    Gradients are written FEATURE-MAJOR ((16, B_pad), chunk j at lane
    window [j*K, (j+1)*K)): the per-Gaussian reduction consumes whole
    gradient rows, so this kills the per-feature slice+concat repack an
    earlier chunk-major output needed.  base_ref[1] carries
    total_padded//K so the unwritten tail past the last tile can be
    zero-filled in-kernel (uninitialized HBM would poison the
    reduction's triangular-matmul prefix sums).
    """
    base = base_ref[0]
    total_chunks = base_ref[1]
    pend[0] = 0
    pend[1] = 0
    basis = _make_basis()

    def dst(j):
        return dfeat_hbm.at[:, pl.ds(j * K, K)]

    def pix_dma(t, slot):
        g1 = pltpu.make_async_copy(
            gpix_hbm.at[t], gbuf.at[slot], isem.at[slot, 0])
        s1 = pltpu.make_async_copy(
            spix_hbm.at[t], sbuf.at[slot], isem.at[slot, 1])
        return g1, s1

    g0, s0 = pix_dma(0, 0)
    g0.start()
    s0.start()

    def tile_body(t, _):
        start = pl.multiple_of(ranges_ref[0, t], K)
        end = ranges_ref[1, t]
        cx, cy, pokf = _tile_info(base + t, grid_x, width, height)
        n_chunks = jnp.minimum(pl.cdiv(end - start, K), max_chunks)
        pslot = jax.lax.rem(t, 2)

        # prefetch the NEXT tile's pixel inputs while this tile computes
        @pl.when(t + 1 < num_tiles)
        def _():
            gn, sn = pix_dma(t + 1, 1 - pslot)
            gn.start()
            sn.start()

        def dma_in(i, slot):
            return pltpu.make_async_copy(
                feat_hbm.at[:, pl.ds(start + i * K, K)],
                buf.at[slot], sem.at[slot])

        @pl.when(n_chunks > 0)
        def _():
            dma_in(0, 0).start()

        gw, sw = pix_dma(t, pslot)
        gw.wait()
        sw.wait()
        gpix = gbuf[pslot].T  # (256, 8) pixel-major
        spix = sbuf[pslot].T
        gcol = gpix[:, 0:3]  # (256, 3) dL/dC
        g_t = gpix[:, 3:4]  # (256, 1) dL/dT_final
        s_total = spix[:, 0:3]  # (256, 3) composited color (no bg)
        t_fin = spix[:, 3:4]  # (256, 1)
        # per-tile pixel scalar: q = sum_ch g_ch s_total_ch + g_t T_fin
        q = jnp.sum(gcol * s_total, axis=1, keepdims=True) + g_t * t_fin

        def cond(c):
            i, _, _, done = c
            return (i < n_chunks) & (jnp.min(done) < 0.5)

        def body(c):
            i, t_carry, prefix, done = c
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_chunks)
            def _():
                dma_in(i + 1, 1 - slot).start()

            dma_in(i, slot).wait()
            f = buf[slot]
            st = _chunk_state(f, basis, cx, cy, start + i * K, end,
                              t_carry, done)
            a, t_exc, contrib = st["a"], st["t_exc"], st["contrib"]
            w = st["a_eff"] * t_exc  # (256, K)

            # dL/dcolor_i = sum_p w[p,i] * g[p,:]  -> (3, K)
            # single bf16 pass: 4e-3 relative on a pure-gradient output
            # is far inside the grad tolerance, at 1/3 the MXU passes
            dcol = _mm1(gcol, w, ((0,), (0,)))

            gc = _mm1(gcol, st["rgb"], ((1,), (0,)))  # (256, K), 1 pass
            incl = prefix + _scan_lanes(w * gc)
            # 1 - a >= 1 - ALPHA_CLAMP = 0.01 on every lane (a is
            # clamped), so the divisor needs no contrib gating — the
            # non-contrib quotient is finite garbage that the where
            # discards (saves one (256, K) select per chunk)
            dalpha = jnp.where(
                contrib, gc * t_exc - (q - incl) / (1.0 - a), 0.0)

            # NOTE: like the reference (backward.cu:577,596), neither
            # the 0.99 alpha clamp nor the power<=0 clamp is gated in
            # the gradient.
            op = f[5:6, :]
            dpower = op * (st["g"] * dalpha)  # = op*g*dalpha
            # moments of a pure-gradient quantity: in fast (bf16x2)
            # mode one bf16 pass suffices — the 4e-3 rounding class the
            # mode already accepts on its reduction payload (same
            # argument as dcol above); f32 mode keeps the 2-pass split.
            mm_mom = _mm1 if fast else _mm_xb
            mom = mm_mom(basis, dpower, ((0,), (0,)))  # (8, K) moments
            mxx, mxy, myy = mom[0:1, :], mom[1:2, :], mom[2:3, :]
            mx, my, m1 = mom[3:4, :], mom[4:5, :], mom[5:6, :]
            x, y = st["x"], st["y"]
            cxx, cxy, cyy = f[2:3, :], f[3:4, :], f[4:5, :]
            ex = x * m1 - mx  # = sum_p dpower * dx
            ey = y * m1 - my

            # double-buffered output: drain the previous DMA on this
            # slot (same byte count, whatever tile issued it) before
            # overwriting, start the new one, never block on it here.
            ds = jax.lax.rem(i, 2)

            def out_dma(sl):
                return pltpu.make_async_copy(
                    dbuf.at[sl], dst(start // K + i), dsem.at[sl])

            @pl.when(pend[ds] == 1)
            def _():
                out_dma(ds).wait()

            # NOTE (round-5 A/B): packing these rows bf16x2 IN-KERNEL
            # (5 int32 rows, half the output DMA) measured NEUTRAL at
            # 1080p and -3% at 720p/512p — the pack's bf16 converts sit
            # on the compute-bound kernel's critical path, while the
            # XLA-side pack it would replace overlaps with bandwidth.
            # Keep the f32 rows + XLA pack.
            dbuf[ds, 0:1, :] = -(cxx * ex + cxy * ey)
            dbuf[ds, 1:2, :] = -(cyy * ey + cxy * ex)
            dbuf[ds, 2:3, :] = -0.5 * (x * x * m1 - 2.0 * x * mx + mxx)
            dbuf[ds, 3:4, :] = -(x * y * m1 - x * my - y * mx + mxy)
            dbuf[ds, 4:5, :] = -0.5 * (y * y * m1 - 2.0 * y * my + myy)
            dbuf[ds, 5:6, :] = jnp.where(op > 0.0, m1 / jnp.where(
                op > 0.0, op, 1.0), 0.0)  # dop = colsum(g*dalpha)
            dbuf[ds, 6:9, :] = dcol
            if FEAT_ROWS > 9:
                dbuf[ds, 9:FEAT_ROWS, :] = jnp.zeros(
                    (FEAT_ROWS - 9, K), jnp.float32)
            out_dma(ds).start()
            pend[ds] = 1
            return i + 1, st["t_out"], incl[:, K - 1: K], st["done"]

        init = (
            jnp.int32(0),
            jnp.ones((NPIX, 1), jnp.float32),
            jnp.zeros((NPIX, 1), jnp.float32),
            1.0 - pokf,  # cropped pixels start done
        )
        i_stop, *_ = jax.lax.while_loop(cond, body, init)

        @pl.when(i_stop < n_chunks)
        def _():
            dma_in(i_stop, jax.lax.rem(i_stop, 2)).wait()

        # Early exit leaves later slots of this tile's range unwritten;
        # their gradients are exactly zero (no contribution is possible
        # once every pixel is done) — zero-fill with DMA-only iterations.
        _zero_fill_tail(dbuf.at[0], dst, dsem.at[0], pend,
                        start // K, i_stop, n_chunks)
        return 0

    jax.lax.fori_loop(0, num_tiles, tile_body, 0)
    # the chunk space past the last tile's padded range is never walked
    _zero_fill_tail(dbuf.at[0], dst, dsem.at[0], pend,
                    0, total_chunks, max_chunks)

    def drain(sl):
        @pl.when(pend[sl] == 1)
        def _():
            pltpu.make_async_copy(
                dbuf.at[sl], dst(0), dsem.at[sl]
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
    basis = _make_basis()

    def tile_body(t, _):
        start = pl.multiple_of(ranges_ref[0, t], K)
        end = ranges_ref[1, t]
        cx, cy, pokf = _tile_info(base + t, grid_x, width, height)
        n_chunks = jnp.minimum(pl.cdiv(end - start, K), max_chunks)

        def dma_in(i, slot):
            return pltpu.make_async_copy(
                feat_hbm.at[:, pl.ds(start + i * K, K)],
                buf.at[slot], sem.at[slot])

        @pl.when(n_chunks > 0)
        def _():
            dma_in(0, 0).start()

        def cond(c):
            i, _, done = c
            return (i < n_chunks) & (jnp.min(done) < 0.5)

        def body(c):
            i, t_carry, done = c
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_chunks)
            def _():
                dma_in(i + 1, 1 - slot).start()

            dma_in(i, slot).wait()
            st = _chunk_state(buf[slot], basis, cx, cy, start + i * K,
                              end, t_carry, done)
            ds = jax.lax.rem(i, 2)

            def out_dma(sl):
                return pltpu.make_async_copy(
                    abuf.at[sl], acc_hbm.at[start // K + i], asem.at[sl])

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
                1.0 - pokf)  # cropped pixels start done
        i_stop, *_ = jax.lax.while_loop(cond, body, init)

        @pl.when(i_stop < n_chunks)
        def _():
            dma_in(i_stop, jax.lax.rem(i_stop, 2)).wait()

        _zero_fill_tail(abuf.at[0], lambda j: acc_hbm.at[j], asem.at[0],
                        pend, start // K, i_stop, n_chunks)
        return 0

    jax.lax.fori_loop(0, num_tiles, tile_body, 0)

    def drain(sl):
        @pl.when(pend[sl] == 1)
        def _():
            pltpu.make_async_copy(
                abuf.at[sl], acc_hbm.at[0], asem.at[sl]
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
               interpret, fast=False):
    kernel = functools.partial(_fwd_kernel, grid_x, width, height,
                               max_chunks, num_tiles, fast)
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
            jax.ShapeDtypeStruct((num_tiles, PIX_ROWS, NPIX), jnp.float32),
        ],
        # aliases the pre-filled out_init input (index counts the scalar
        # prefetch operands first: base=0, ranges=1, feat=2, out_init=3)
        input_output_aliases={3: 0},
        interpret=interpret,
    )


@functools.cache
def _build_bwd(num_tiles, grid_x, width, height, b_pad, max_chunks,
               interpret, fast=False):
    kernel = functools.partial(_bwd_kernel, grid_x, width, height,
                               max_chunks, num_tiles, fast)
    return pl.pallas_call(
        kernel,
        grid_spec=_grid_spec(3, 1, [
            pltpu.VMEM((2, FEAT_ROWS, K), jnp.float32),
            pltpu.VMEM((2, FEAT_ROWS, K), jnp.float32),
            pltpu.VMEM((2, PIX_ROWS, NPIX), jnp.float32),
            pltpu.VMEM((2, PIX_ROWS, NPIX), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
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
        out_shape=[jax.ShapeDtypeStruct((b_pad // K, FEAT_ROWS, K),
                                        jnp.float32)],
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# packing / assembly helpers
# ---------------------------------------------------------------------------

# opacity fixed-point scale for the fast-mode packed table row: u16
# quantisation of the (0, 1) sigmoid output — 1.5e-5 absolute error,
# far below the alpha-threshold granularity (ALPHA_MIN = 1/255) and the
# bf16 accumulation class fast mode already accepts.
_OP_FIX = 65535.0


def _pack_features(means2d, conic, opacity, color, binning: BinningOut,
                   fast=False):
    """Gather aligned instances into a feature-major (16, B_pad) array.

    ONE contiguous row gather (gather cost on TPU is per descriptor, not
    per byte, so nine element-wise gathers would be ~20x slower).  The
    aligned primitive-id layout comes from binning's alignment sort.
    Padding slots pull primitive 0's row but sit outside every tile's
    [start, end) range, so the kernels' in-range mask discards them.

    Chunk j of the feature-major array is the (16, K) lane window at
    [j*K, (j+1)*K) — an in-KERNEL DMA of 16 strided 512 B segments,
    hidden behind ~400 ns of per-chunk compute by the double buffer.
    (XLA-land slicing of this form was measured at a few GB/s and
    motivated an intermediate chunk-major repack; issuing the strided
    window from the DMA engine instead makes the repack pass, its
    2 ms layout copy and the old identity-matmul transpose all
    unnecessary.)

    fast (grad_reduce == "bf16x2" mode): the gather table is packed to
    8 int32 rows — [x, y, cxx, cxy, cyy, r, g] bitcast f32 plus one row
    of (u16-fixpoint opacity << 16 | bf16 blue) — and unpacked to the
    same (16, B_pad) f32 layout after the gather, so the kernels are
    untouched.  Measured (v5e, 1080p bench geometry): the (B, 9) f32
    gather runs 27.2 ms, the (B, 8) i32 gather 21.8 ms — the narrower
    row crosses a table line-efficiency threshold worth ~5 ms/step.
    Storage error: opacity 1.5e-5 absolute (u16 fix), blue 2e-3
    relative (bf16) — the same rounding class as the mode's 1-pass
    bf16 colour accumulation (see _fwd_kernel mm_acc); the backward is
    self-consistent because it reads the SAME table values.  Parity
    (f32) mode keeps the exact 9-row f32 table.
    """
    if binning.feat_rank is not None:
        # the 9 columns rode the binning depth sort (binning.py): same
        # values as concat(...)[prim_order], no P-row gather
        per_gaussian = binning.feat_rank
    else:
        per_gaussian = jnp.concatenate(
            [means2d, conic, opacity[:, None], color],
            axis=1)[binning.prim_order]  # (P, 9), depth-rank order
    b_pad = binning.gauss_aligned.shape[0]
    # Measured gather economics (microbench, v5e): XLA's big-gather
    # emitter always uses a feature-major ({0,1}) table at this size —
    # layout constraints are satisfied with copies, not by changing the
    # gather — and runs at ~6 ns/row with the table VMEM-resident vs
    # ~22 ns/row from HBM.  Keeping the table small is what matters;
    # the row-major pin experiments were a wash.
    if fast:
        # (P, 8) i32 packed table: P-scale pack, B-scale unpack, both
        # one fused elementwise pass each — the 5 ms gather saving is
        # the net win.
        f32cols = jax.lax.bitcast_convert_type(
            per_gaussian[:, (0, 1, 2, 3, 4, 6, 7)], jnp.int32)  # (P, 7)
        opq = jnp.clip(jnp.round(per_gaussian[:, 5] * _OP_FIX),
                       0.0, _OP_FIX).astype(jnp.int32)
        bbits = jax.lax.bitcast_convert_type(
            per_gaussian[:, 8].astype(jnp.bfloat16),
            jnp.uint16).astype(jnp.int32)
        row7 = (opq << 16) | bbits
        table = jnp.concatenate([f32cols, row7[:, None]], axis=1)
        g8 = table[binning.gauss_id()].T  # (8, B_pad) i32
        # u32 view keeps the shift logical (opq >= 2^15 sets the i32
        # sign bit; an arithmetic >> would smear it over the blue field)
        r7 = jax.lax.bitcast_convert_type(g8[7:8], jnp.uint32)
        op_row = (r7 >> 16).astype(jnp.float32) * (1.0 / _OP_FIX)
        blue_row = jax.lax.bitcast_convert_type(
            (r7 & 0xFFFF).astype(jnp.uint16),
            jnp.bfloat16).astype(jnp.float32)
        f32rows = jax.lax.bitcast_convert_type(g8[0:7], jnp.float32)
        feat = jnp.concatenate([
            f32rows[0:5], op_row, f32rows[5:7], blue_row,
            jnp.zeros((FEAT_ROWS - TABLE_ROWS, b_pad), jnp.float32),
        ], axis=0)
        return feat, b_pad
    feat = per_gaussian[binning.gauss_id()]  # (B_pad, TABLE_ROWS) gather
    # .T is a free relabel when the gather emits feature-major (its
    # preference at this size); otherwise XLA inserts one copy — never
    # worse than the old chunk-major repack.  The pad to FEAT_ROWS
    # restores the sublane-aligned (16, K) chunk windows the kernels
    # DMA (one bandwidth-bound B-sized copy, ~0.5 ms at 1080p — far
    # cheaper than gathering 16-wide rows from a non-resident table).
    return jnp.pad(feat.T, ((0, FEAT_ROWS - TABLE_ROWS), (0, 0))), b_pad


def _packed_to_images(packed, grid_x, grid_y, width, height):
    """(T, PIX_ROWS, 256) -> color (H,W,3), t_fin (H,W)."""
    img = packed.reshape(grid_y, grid_x, PIX_ROWS, TILE_Y, TILE_X)
    img = img.transpose(0, 3, 1, 4, 2).reshape(
        grid_y * TILE_Y, grid_x * TILE_X, PIX_ROWS)
    img = img[:height, :width]
    return img[:, :, 0:3], img[:, :, 3]


# ---------------------------------------------------------------------------
# custom-VJP core: per-Gaussian arrays in, packed tile rows out
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _rasterize_core(means2d, conic, opacity, color, binning, base,
                    width, height, num_rows, grad_reduce):
    out, _ = _core_fwd(means2d, conic, opacity, color, binning, base,
                       width, height, num_rows, grad_reduce)
    return out


_CS_LANES = 1024  # cumsum kernel block width (b_pad is a multiple)
_PICK_W = 128  # boundary-pick output window (bounds per flush)


def _pick_step(i, ncols, nwin8, ngrp, wlast_ref, x, zb_hbm, out_hbm,
               acc, zbuf, wstate, zsem, osem):
    """Streaming in-kernel boundary pick (PROFILE.md round-5 item 2b).

    Folds `jnp.take(pse, seg_bounds, axis=1)` (measured 7.8 ms at 1080p
    as an XLA column gather) into the cumsum stream: the absolute
    exclusive-prefix block `x` (ncols, _CS_LANES) for chunk i is already
    in registers, and the sorted bounds are consumed window by window —
    the current _PICK_W-bound output window accumulates its picks via an
    exact two-pass split matmul against a one-hot (hi + lo reconstructs
    f32 exactly, so the picked values are bitwise the stored prefixes),
    flushes with an aligned (16, W) DMA when its last bound falls inside
    this chunk, and advances.  Robust to ANY bound density: clusters of
    empty segments (culled primitives share one position) just complete
    several windows in one chunk.

    wstate (SMEM, int32): [w_cur, zb_group_cur, out_pend0, out_pend1].
    zbuf: (2, 8, _PICK_W) double-buffered zb window groups.
    acc:  (2, FEAT_ROWS, _PICK_W) per-window accumulators; the slot
          being accumulated is w%2, flushed by DMA on completion.
    """
    chunk_end = (i + 1) * _CS_LANES
    x_hi, x_lo = _bf16_split(x)
    d = ((1,), (0,))
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_CS_LANES, 1), 0)

    def zdma(g, slot):
        return pltpu.make_async_copy(
            zb_hbm.at[g], zbuf.at[slot], zsem.at[slot])

    def odma(w, slot):
        off = pl.multiple_of(w * _PICK_W, _PICK_W)
        return pltpu.make_async_copy(
            acc.at[slot], out_hbm.at[:, pl.ds(off, _PICK_W)],
            osem.at[slot])

    @pl.when(i == 0)
    def _():
        wstate[0] = 0
        wstate[1] = 0
        wstate[2] = 0
        wstate[3] = 0
        acc[0] = jnp.zeros((FEAT_ROWS, _PICK_W), jnp.float32)
        acc[1] = jnp.zeros((FEAT_ROWS, _PICK_W), jnp.float32)
        zdma(0, 0).start()

        @pl.when(ngrp > 1)
        def _():
            zdma(1, 1).start()

        zdma(0, 0).wait()

    def enter_group(w):
        # ensure window w's zb group is resident; prefetch the next one
        g = w // 8

        @pl.when(g != wstate[1])
        def _():
            zdma(g, jax.lax.rem(g, 2)).wait()

            @pl.when(g + 1 < ngrp)
            def _():
                zdma(g + 1, jax.lax.rem(g + 1, 2)).start()

            wstate[1] = g

    def contrib(w):
        # add this chunk's picks for window w into acc[w%2]
        g2 = jax.lax.rem(w // 8, 2)
        wl = jax.lax.rem(w, 8)
        grp = zbuf[g2]  # (8, W)
        row = jnp.sum(jnp.where(sub == wl, grp, 0), axis=0,
                      keepdims=True)  # (1, W) select one sublane
        oh = (lane == (row - i * _CS_LANES)).astype(jnp.float32)
        slot = jax.lax.rem(w, 2)
        acc[slot, 0:ncols, :] += _mm1(x_hi, oh, d) + _mm1(x_lo, oh, d)

    def cond(w):
        return (w < nwin8) & (
            wlast_ref[jnp.minimum(w, nwin8 - 1)] < chunk_end)

    def body(w):
        enter_group(w)
        contrib(w)
        slot = jax.lax.rem(w, 2)
        odma(w, slot).start()
        wstate[2 + slot] = 1
        # prepare the slot window w+1 will accumulate into
        nslot = 1 - slot

        @pl.when(wstate[2 + nslot] == 1)
        def _():
            odma(w, nslot).wait()
            wstate[2 + nslot] = 0

        acc[nslot] = jnp.zeros((FEAT_ROWS, _PICK_W), jnp.float32)
        return w + 1

    w = jax.lax.while_loop(cond, body, wstate[0])

    # partial contribution of the (incomplete) current window
    @pl.when(w < nwin8)
    def _():
        enter_group(w)
        contrib(w)

    wstate[0] = w

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        # all windows complete by the last chunk (bounds < b_pad);
        # drain the in-flight flushes
        for sl in (0, 1):
            @pl.when(wstate[2 + sl] == 1)
            def _():
                odma(0, sl).wait()


def _cumsum9_kernel(ncols, nwin8, ngrp, wlast_ref, x_ref, zb_hbm,
                    out_hbm, carry, acc, zbuf, wstate, zsem, osem):
    """Exclusive prefix sum along axis 1 of a (ncols, B) block stream,
    fused with the streaming boundary pick (_pick_step).

    XLA lowers each 1-D cumsum to its own hierarchical reduce-window
    (~0.34 ms per column per 2.2M rows on v5e); this kernel streams all
    columns in one bandwidth-bound pass, scanning 128-lane blocks as
    exclusive triangular matmuls on the MXU with an f32 running carry
    (same split-bf16 2-pass precision as _scan_lanes).  The prefix
    blocks never reach HBM — only the (16, nwin8*W) picked windows do.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[...] = jnp.zeros((ncols, 1), jnp.float32)

    x = x_ref[...]
    t = _tri(excl=True)
    d = ((1,), (0,))
    c = carry[...]
    outs = []
    for s in range(_CS_LANES // K0):
        blk = x[:, s * K0:(s + 1) * K0]
        hi, lo = _bf16_split(blk)
        outs.append(_mm1(hi, t, d) + _mm1(lo, t, d) + c)
        c = c + jnp.sum(blk, axis=1, keepdims=True)
    carry[...] = c
    _pick_step(i, ncols, nwin8, ngrp, wlast_ref,
               jnp.concatenate(outs, axis=1), zb_hbm, out_hbm,
               acc, zbuf, wstate, zsem, osem)


def _cumsum_packed_kernel(npack, nout, nwin8, ngrp, wlast_ref, x_ref,
                          zb_hbm, out_hbm, carry, acc, zbuf, wstate,
                          zsem, osem):
    """Like _cumsum9_kernel, but the input rows are bf16x2-PACKED int32
    and the unpack happens in-register: widening a bf16 to f32 is
    exactly "append 16 zero bits", so hi = bitcast_f32(v & 0xFFFF0000)
    and lo = bitcast_f32(v << 16) — pure 32-bit ops, no 16-bit types.
    Skips the XLA-side unpack materialization of a (9, B) f32
    intermediate (~2 ms at 1080p)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[...] = jnp.zeros((nout, 1), jnp.float32)

    v = x_ref[...]  # (npack, _CS_LANES) int32
    rows = []
    himask = jnp.int32(-65536)  # 0xFFFF0000
    for r in range(npack):
        vr = v[r:r + 1, :]
        rows.append(jax.lax.bitcast_convert_type(vr & himask, jnp.float32))
        rows.append(jax.lax.bitcast_convert_type(vr << 16, jnp.float32))
    x = jnp.concatenate(rows[:nout], axis=0)  # (nout, _CS_LANES)
    t = _tri(excl=True)
    d = ((1,), (0,))
    c = carry[...]
    outs = []
    for sblk in range(_CS_LANES // K0):
        blk = x[:, sblk * K0:(sblk + 1) * K0]
        hi, lo = _bf16_split(blk)
        outs.append(_mm1(hi, t, d) + _mm1(lo, t, d) + c)
        c = c + jnp.sum(blk, axis=1, keepdims=True)
    carry[...] = c
    _pick_step(i, nout, nwin8, ngrp, wlast_ref,
               jnp.concatenate(outs, axis=1), zb_hbm, out_hbm,
               acc, zbuf, wstate, zsem, osem)


def _pick_scratch(ncols):
    return [
        pltpu.VMEM((ncols, 1), jnp.float32),  # carry
        pltpu.VMEM((2, FEAT_ROWS, _PICK_W), jnp.float32),  # acc
        pltpu.VMEM((2, 8, _PICK_W), jnp.int32),  # zb window groups
        pltpu.SMEM((4,), jnp.int32),  # w_cur, g_cur, pend0, pend1
        pltpu.SemaphoreType.DMA((2,)),  # zsem
        pltpu.SemaphoreType.DMA((2,)),  # osem
    ]


@functools.cache
def _build_cumsum_packed(npack, nout, b_pad, nwin8, interpret):
    ngrp = nwin8 // 8
    return pl.pallas_call(
        functools.partial(_cumsum_packed_kernel, npack, nout, nwin8,
                          ngrp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # per-window last bound
            grid=(b_pad // _CS_LANES,),
            in_specs=[
                pl.BlockSpec((npack, _CS_LANES), lambda i, w: (0, i)),
                pl.BlockSpec(memory_space=pl.ANY),  # zb (ngrp, 8, W)
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=_pick_scratch(nout),
        ),
        out_shape=jax.ShapeDtypeStruct((FEAT_ROWS, nwin8 * _PICK_W),
                                       jnp.float32),
        interpret=interpret,
    )


@functools.cache
def _build_cumsum9(ncols, b_pad, nwin8, interpret):
    ngrp = nwin8 // 8
    return pl.pallas_call(
        functools.partial(_cumsum9_kernel, ncols, nwin8, ngrp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b_pad // _CS_LANES,),
            in_specs=[
                pl.BlockSpec((ncols, _CS_LANES), lambda i, w: (0, i)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=_pick_scratch(ncols),
        ),
        out_shape=jax.ShapeDtypeStruct((FEAT_ROWS, nwin8 * _PICK_W),
                                       jnp.float32),
        interpret=interpret,
    )


def _core_fwd(means2d, conic, opacity, color, binning, base, width, height,
              num_rows, grad_reduce="f32"):
    grid_x, _ = tile_grid(width, height)
    num_tiles = num_rows * grid_x
    feat, b_pad = _pack_features(means2d, conic, opacity, color, binning,
                                 fast=(grad_reduce == "bf16x2"))
    max_chunks = pl.cdiv(b_pad, K)
    fwd = _build_fwd(num_tiles, grid_x, width, height, b_pad, max_chunks,
                     _interpret(), fast=(grad_reduce == "bf16x2"))
    # empty-tile answer: color 0, T 1.  Built with a runtime dependency so
    # XLA cannot constant-fold it into a giant literal (at 1080p this is a
    # 67 MB array; folding it stalls the remote AOT compile).
    is_t_row = (jax.lax.broadcasted_iota(
        jnp.int32, (num_tiles, PIX_ROWS, NPIX), 1) == 3)
    one = (binning.num_rendered * 0 + 1).astype(jnp.float32)
    out_init = jnp.where(is_t_row, one, 0.0)
    # clamp: under slack overflow total_padded may exceed b_pad (the
    # host redoes the step, see renderer.py), and the fwd stream must
    # never walk chunks past the feature array
    base2 = jnp.concatenate(
        [base, (jnp.minimum(binning.total_padded, b_pad) // K).reshape(1)])
    ranges2 = binning.tile_ranges  # (2, num_tiles) for VMEM tiling
    (packed,) = fwd(base2, ranges2, feat, out_init)
    res = (feat, binning, base, packed, means2d.shape[0])
    return packed, res


def _pack_bf16x2(a, b):
    """Two f32 columns -> one int32 column of (bf16(a) << 16 | bf16(b))."""
    ah = jax.lax.bitcast_convert_type(
        a.astype(jnp.bfloat16), jnp.uint16).astype(jnp.int32)
    bh = jax.lax.bitcast_convert_type(
        b.astype(jnp.bfloat16), jnp.uint16).astype(jnp.int32)
    return (ah << 16) | bh


def _unpack_bf16x2(v):
    hi = jax.lax.bitcast_convert_type(
        ((v >> 16) & 0xFFFF).astype(jnp.uint16), jnp.bfloat16)
    lo = jax.lax.bitcast_convert_type(
        (v & 0xFFFF).astype(jnp.uint16), jnp.bfloat16)
    return hi.astype(jnp.float32), lo.astype(jnp.float32)


def _segment_reduce_by_src(cols, binning: BinningOut, grad_reduce="f32"):
    """Per-primitive sums of per-instance columns, WITHOUT a scatter.

    An XLA scatter-add over ~1M unsorted rows costs ~20 ms on v5e — it
    was the single largest item of the whole train step.  Instead, sort
    the columns by primitive id (pad slots -> sentinel P): instances
    grouped by primitive land in id order, which is exactly expand
    order's grouping, so each per-primitive sum is a difference of the
    column's prefix sums at binning's (monotone-gathered) segment
    bounds.  Sort + cumsums + boundary gathers measure ~1.5 ms at the
    same size.

    Garbage rows (alignment slack, truncated out-of-budget instances)
    are pad_mask slots: they carry the sentinel key and sort past every
    valid row, so they never enter a prefix that gets read.

    Precision: a global f32 prefix sum loses ~eps * |running sum| per
    boundary difference; with mixed-sign gradient entries the running
    sum random-walks, keeping the relative error of per-primitive sums
    around 1e-5 — on the order of the nondeterministic float-atomics
    noise the reference's CUDA backward exhibits (backward.cu:561-592).
    """
    num_p = binning.seg_bounds.shape[0] - 1
    key = jnp.where(binning.pad_mask, num_p, binning.gauss_aligned)
    n = len(cols)
    b_pad = cols[0].shape[0]
    if grad_reduce == "bf16x2":
        # production fast mode: pairs of gradient columns ride the sort
        # as ONE bf16-packed int32 each (the sort is the largest single
        # cost of the train step and scales with payload columns,
        # PROFILE.md).  bf16 keeps f32 range; per-instance rounding is
        # ~4e-3 relative, averaging down over a primitive's instances —
        # far above CUDA's atomics noise, so this is opt-in
        # (--grad_reduce bf16x2) and excluded from parity tests.
        padded = list(cols) + [jnp.zeros_like(cols[0])] * (n % 2)
        packs = [_pack_bf16x2(padded[i], padded[i + 1])
                 for i in range(0, len(padded), 2)]
        srt = jax.lax.sort((key,) + tuple(packs), num_keys=1,
                           is_stable=False)
        sorted_cols = None  # unpack happens inside the cumsum kernel
        stacked_packed = jnp.stack(srt[1:], axis=0)  # (ceil(n/2), B)
    elif grad_reduce == "f32":
        srt = jax.lax.sort((key,) + tuple(cols), num_keys=1,
                           is_stable=False)
        sorted_cols = srt[1:]
    else:
        raise ValueError(f"unknown grad_reduce {grad_reduce!r}")
    zb = binning.seg_bounds
    # ONE fused Pallas pass for all n prefix sums WITH the boundary pick
    # folded in (_pick_step): exclusive prefixes make v[:, r] the sum
    # before slot zb[r], so segment sums are adjacent differences.  The
    # prefix array itself never reaches HBM — the kernel emits only the
    # picked (16, nwin*W) windows (the XLA take alone measured 7.8 ms at
    # 1080p; the pick rides the stream for ~1-2 ms).  The bf16x2 path
    # feeds the PACKED int32 rows straight in (in-register unpack).
    npb = num_p + 1
    nwin8 = -(-npb // _PICK_W)
    nwin8 = -(-nwin8 // 8) * 8  # zb DMA groups of 8 windows
    # pad bounds with the FINAL bound (edge), not 0: a window's
    # completion test reads its LAST entry, and a zero pad would flush
    # the last real window at chunk 0 before its real bounds stream by
    zbp = jnp.pad(zb, (0, nwin8 * _PICK_W - npb), mode="edge")
    zb3 = zbp.reshape(nwin8 // 8, 8, _PICK_W)
    wlast = zbp[_PICK_W - 1::_PICK_W]  # (nwin8,) per-window last bound
    if sorted_cols is None:
        picked = _build_cumsum_packed(
            stacked_packed.shape[0], n, b_pad, nwin8, _interpret())(
            wlast, stacked_packed, zb3)
    else:
        stacked = jnp.stack(sorted_cols, axis=0)  # (n, B_pad)
        picked = _build_cumsum9(n, b_pad, nwin8, _interpret())(
            wlast, stacked, zb3)
    v = picked[0:n, :npb]  # (n, P+1)
    diffs = v[:, 1:] - v[:, :-1]  # (n, P), depth-rank order
    # rank -> original order by SORTING on prim_order (the original id
    # per rank, a permutation): ~0.1 ms per P payload column vs the
    # 2.4 ms (P, 9) row gather by prim_inv this replaces
    srt = jax.lax.sort(
        (binning.prim_order,) + tuple(diffs[i] for i in range(n)),
        num_keys=1, is_stable=False)
    return list(srt[1:])


def _core_bwd(width, height, num_rows, grad_reduce, res, g_packed):
    feat, binning, base, packed, num_p = res
    grid_x, _ = tile_grid(width, height)
    num_tiles = num_rows * grid_x
    b_pad = binning.gauss_aligned.shape[0]
    max_chunks = pl.cdiv(b_pad, K)
    bwd = _build_bwd(num_tiles, grid_x, width, height, b_pad, max_chunks,
                     _interpret(), fast=(grad_reduce == "bf16x2"))
    base2 = jnp.concatenate(
        [base, (jnp.minimum(binning.total_padded, b_pad) // K).reshape(1)])
    (dfeat,) = bwd(base2, binning.tile_ranges, feat, g_packed, packed)

    # dfeat is (16, B_pad) feature-major; rows 0..8 carry gradients.
    # Every slot the tiles never blend (alignment slack, truncated
    # instances, the tail past total_padded) is exactly zero: slack
    # lanes fail the in-range mask so every moment is 0, and the kernel
    # zero-fills early-exit tails and the unwalked tail chunk space.
    cols = tuple(dfeat[f] for f in range(9))
    sums = _segment_reduce_by_src(cols, binning, grad_reduce)
    d_means2d = jnp.stack(sums[0:2], axis=1)
    d_conic = jnp.stack(sums[2:5], axis=1)
    d_opacity = sums[5]
    d_color = jnp.stack(sums[6:9], axis=1)
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
                tile_rows=None, grad_reduce: str = "f32"):
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
        binning, base, width, height, num_rows, grad_reduce,
    )
    color, t_fin = _packed_to_images(packed, grid_x, num_rows, width,
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
            [base, (jnp.minimum(binning.total_padded, b_pad) // K)
             .reshape(1)])
        (acc,) = trans(base2, binning.tile_ranges, feat)
        # scatter-based reduction here, not _segment_reduce_by_src: the
        # transmittance accumulators are all-positive, so a global-prefix
        # difference loses ~eps * (running sum) — too coarse for the
        # culling statistics.  This path runs only during SH culling, so
        # the scatter cost is off the training hot loop.
        num_p = prep.means2d.shape[0]
        slot = jnp.arange(b_pad, dtype=jnp.int32)
        seg_id = jnp.where(
            binning.pad_mask | (slot >= binning.total_padded),
            num_p, binning.gauss_aligned)
        acc_rows = jnp.stack(
            [acc[:, 0, :].reshape(b_pad), acc[:, 1, :].reshape(b_pad)],
            axis=1)
        asum = jax.ops.segment_sum(acc_rows, seg_id,
                                   num_segments=num_p + 1)[:num_p]
        asum = asum[binning.prim_inv]  # rank rows -> original id rows
        g_trans = asum[:, 0]
        g_touch = asum[:, 1].astype(jnp.int32)
    return color, t_fin, g_trans, g_touch
