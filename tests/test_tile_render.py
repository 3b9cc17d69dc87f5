"""Pallas tile renderer vs the pure-jnp oracle (interpret mode on CPU).

The oracle (ops/render_ref.py) implements the reference CUDA compositing
semantics (forward.cu:461-582) with plain masked jnp; the Pallas kernels
must match it to float tolerance in forward color/final_T, in end-to-end
gradients, and in the transmittance accumulators used by SH culling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reduced3dgs_tpu.cameras import Camera
from reduced3dgs_tpu.renderer import render


def make_scene(seed=0, n=300, spread=0.25):
    rng = np.random.default_rng(seed)
    xyz = np.concatenate(
        [
            rng.normal(0, spread, (n // 2, 3)),  # dense center cluster
            rng.uniform(-1.2, 1.2, (n - n // 2, 3)),
        ]
    ).astype(np.float32)
    feats = np.zeros((n, 16, 3), np.float32)
    feats[:, 0] = rng.uniform(-1.5, 1.5, (n, 3))
    feats[:, 1:] = rng.normal(0, 0.2, (n, 15, 3))
    scales = np.log(rng.uniform(0.02, 0.12, (n, 3))).astype(np.float32)
    rots = rng.normal(0, 1, (n, 4)).astype(np.float32)
    # raw opacity below the 0.99 alpha clamp (the reference backward does
    # not gate the clamp; the oracle's autodiff does — keep out of it)
    opac = rng.uniform(-2.0, 2.0, n).astype(np.float32)
    degrees = rng.integers(0, 4, n).astype(np.int32)
    return (jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(scales),
            jnp.asarray(rots), jnp.asarray(opac), jnp.asarray(degrees))


W, H = 56, 40  # 4x3 tile grid, with cropped edge pixels
BUDGET = 4096


@pytest.fixture(scope="module")
def scene():
    cam = Camera.look_at(eye=(0, 0, -3.2), target=(0, 0, 0), width=W, height=H)
    return make_scene(), cam.params()


def run(scene, backend, want_transmittance=False):
    (xyz, feats, scales, rots, opac, degrees), cp = scene
    bg = jnp.array([0.2, 0.1, 0.4])
    return render(
        xyz, feats, scales, rots, opac, degrees, cp, bg,
        width=W, height=H, instance_budget=BUDGET, backend=backend,
        want_transmittance=want_transmittance,
    )


def test_forward_matches_oracle(scene):
    ref = run(scene, "xla")
    pal = run(scene, "pallas")
    assert int(ref.num_rendered) > 300  # multi-tile coverage, >1 chunk
    np.testing.assert_allclose(pal.color, ref.color, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(pal.final_t, ref.final_t, atol=2e-5, rtol=1e-4)


def test_gradients_match_oracle(scene):
    (xyz, feats, scales, rots, opac, degrees), cp = scene
    bg = jnp.array([0.2, 0.1, 0.4])
    target = jnp.zeros((H, W, 3))

    def loss(backend, *params):
        out = render(
            *params, degrees, cp, bg, width=W, height=H,
            instance_budget=BUDGET, backend=backend,
        )
        return jnp.abs(out.color - target).mean() + 0.1 * out.final_t.mean()

    args = (xyz, feats, scales, rots, opac)
    g_ref = jax.grad(lambda *a: loss("xla", *a), argnums=(0, 1, 2, 3, 4))(*args)
    g_pal = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2, 3, 4))(*args)
    names = ["xyz", "features", "scales", "rots", "opacity"]
    for name, a, b in zip(names, g_ref, g_pal):
        scale = np.maximum(np.abs(np.asarray(a)).max(), 1e-8)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4 * scale, rtol=2e-3,
            err_msg=f"grad mismatch: {name}",
        )


def test_transmittance_matches_oracle(scene):
    ref = run(scene, "xla", want_transmittance=True)
    pal = run(scene, "pallas", want_transmittance=True)
    np.testing.assert_allclose(
        pal.transmittance_sum, ref.transmittance_sum, atol=1e-3, rtol=1e-3
    )
    np.testing.assert_array_equal(pal.pixels_touched, ref.pixels_touched)


def test_budget_overflow_reported(scene):
    out = run(scene, "pallas")
    n = int(out.num_rendered)
    assert n < BUDGET  # scene fits; sanity for the overflow contract


def test_dead_slots_emit_no_instances(scene):
    """Culled primitives (dead pool slots / alive_mask False) must not
    produce binned instances: their stale rects are >=1 tile even at
    radius 0, so counts must gate on the validity-masked tiles_touched
    (regression: phantom instances inflated num_rendered and, under
    truncation, displaced real instances by stale depth keys)."""
    (xyz, feats, scales, rots, opac, degrees), cp = scene
    n = xyz.shape[0]
    alive = jnp.arange(n) < (n // 2)  # dead half still projects in-view
    bg = jnp.array([0.2, 0.1, 0.4])

    def go(x, f, s, r, o, d, mask):
        return render(x, f, s, r, o, d, cp, bg, width=W, height=H,
                      instance_budget=BUDGET, backend="pallas",
                      alive_mask=mask)

    masked = go(xyz, feats, scales, rots, opac, degrees, alive)
    only = go(xyz[: n // 2], feats[: n // 2], scales[: n // 2],
              rots[: n // 2], opac[: n // 2], degrees[: n // 2], None)
    assert int(masked.num_rendered) == int(only.num_rendered)
    np.testing.assert_allclose(np.asarray(masked.color),
                               np.asarray(only.color), atol=1e-6)


def test_strip_rendering_matches_full(scene):
    """tile_rows strips must reproduce the corresponding full-image rows
    (multi-chip image sharding building block)."""
    full = run(scene, "pallas")
    (xyz, feats, scales, rots, opac, degrees), cp = scene
    bg = jnp.array([0.2, 0.1, 0.4])
    strips = []
    for r0, nrows in [(0, 1), (1, 2)]:  # grid_y = ceil(40/16) = 3
        out = render(
            xyz, feats, scales, rots, opac, degrees, cp, bg,
            width=W, height=H, instance_budget=BUDGET, backend="pallas",
            strip_r0=r0, strip_rows=nrows,
        )
        strips.append(np.asarray(out.color))
    got = np.concatenate(strips, axis=0)[:H]  # crop strip padding rows
    np.testing.assert_allclose(got, np.asarray(full.color), atol=1e-6)


@pytest.mark.parametrize("p", [700, 2500])
def test_segment_reduce_multichunk_ragged_bounds(p):
    """Direct _segment_reduce_by_src check at a MULTI-cumsum-chunk size
    with P+1 not a multiple of the pick window, empty-segment clusters
    and a truncated tail — the regime the fused in-kernel boundary pick
    must handle (regression: a zero-padded bounds array flushed the last
    real window at chunk 0 and dropped its picks; only surfaced past
    one 1024-lane chunk, which the render-level tests never reach).
    p=2500 additionally exercises the zb window-GROUP DMA rotation
    (ngrp > 1), which small renders never reach."""
    from reduced3dgs_tpu.ops import tile_render as tr
    from reduced3dgs_tpu.ops.binning import BinningOut, _MAXI
    rng = np.random.default_rng(3)
    lens = rng.poisson(9, p).astype(np.int64)
    lens[:p // 10] = 0  # empty cluster sharing one bound position
    lens[rng.integers(0, p, p // 16)] = 0
    offsets = np.cumsum(lens)
    nv = int(offsets[-1])
    b_pad = -(-(nv + 512) // 8192) * 8192  # multiple cumsum chunks
    assert nv < b_pad
    seg_bounds = np.concatenate([[0], offsets]).astype(np.int32)
    key = np.full(b_pad, _MAXI, np.int32)
    key[:nv] = np.repeat(np.arange(p), lens).astype(np.int32)
    perm = rng.permutation(p).astype(np.int32)
    inv = np.empty(p, np.int32)
    inv[perm] = np.arange(p, dtype=np.int32)
    binning = BinningOut(
        gauss_aligned=jnp.asarray(key),
        tile_id=jnp.zeros(b_pad, jnp.int32),
        tile_ranges=jnp.zeros((2, 1), jnp.int32),
        num_rendered=jnp.int32(nv), total_padded=jnp.int32(nv),
        seg_bounds=jnp.asarray(seg_bounds),
        prim_order=jnp.asarray(perm), prim_inv=jnp.asarray(inv),
    )
    cols_np = [rng.normal(0, 1, b_pad).astype(np.float32)
               for _ in range(9)]
    outs = tr._segment_reduce_by_src(
        [jnp.asarray(c) for c in cols_np], binning, "f32")
    ref = np.zeros((p, 9))
    for j, c in enumerate(cols_np):
        for r in range(p):
            ref[r, j] = c[seg_bounds[r]:seg_bounds[r + 1]].sum(
                dtype=np.float64)
    got = np.stack([np.asarray(o) for o in outs], axis=1)
    np.testing.assert_allclose(got, ref[inv], rtol=2e-5, atol=2e-4)


def test_bf16x2_grad_reduce_accuracy(scene):
    """--grad_reduce bf16x2 packs gradient column pairs into one int32
    sort payload: per-instance bf16 rounding must stay a small relative
    perturbation of the f32 reduction (it is an opt-in production fast
    mode, not a parity mode)."""
    (xyz, feats, scales, rots, opac, degrees), cp = scene
    bg = jnp.array([0.2, 0.1, 0.4])
    target = jnp.zeros((H, W, 3))

    def loss(grad_reduce, *params):
        out = render(
            *params, degrees, cp, bg, width=W, height=H,
            instance_budget=BUDGET, backend="pallas",
            grad_reduce=grad_reduce,
        )
        return jnp.abs(out.color - target).mean()

    args = (xyz, feats, scales, rots, opac)
    g32 = jax.grad(lambda *a: loss("f32", *a), argnums=(0, 2))(*args)
    g16 = jax.grad(lambda *a: loss("bf16x2", *a), argnums=(0, 2))(*args)
    for a, b in zip(g32, g16):
        scale = np.abs(np.asarray(a)).max()
        err = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert err < 2e-2 * scale, (err, scale)


def test_packed_feature_table_roundtrip():
    """Direct unit test of _pack_features fast mode (8-row i32 table).

    Locks the packing invariants independently of the end-to-end bf16x2
    test: the 7 bitcast-f32 columns round-trip BITWISE, opacity
    round-trips within its u16 fixed-point half-step, blue within bf16
    rounding — and specifically with opacities >= 0.5, where the packed
    row's int32 sign bit is set and an arithmetic (instead of logical)
    unpack shift would smear the sign over the blue field.
    """
    from reduced3dgs_tpu.ops import binning as B
    from reduced3dgs_tpu.ops.tile_render import (
        FEAT_ROWS, _OP_FIX, _pack_features)

    p, b_pad = 64, 256
    rng = np.random.default_rng(11)
    feat = np.zeros((p, 9), np.float32)
    feat[:, 0] = rng.uniform(0, 2000, p)       # x2d at 1080p scale
    feat[:, 1] = rng.uniform(0, 1100, p)       # y2d
    feat[:, 2:5] = rng.normal(0, 5, (p, 3))    # conic
    feat[:, 5] = rng.uniform(0.5, 1.0, p)      # opacity: sign bit SET
    feat[:, 6:9] = rng.uniform(0, 4, (p, 3))   # clamped SH colors
    gauss = rng.integers(0, p, b_pad).astype(np.int32)
    gauss[-7:] = np.iinfo(np.int32).max  # a few pad (sentinel) slots
    zero = jnp.zeros((p,), jnp.int32)
    bo = B.BinningOut(
        gauss_aligned=jnp.asarray(gauss), tile_id=jnp.zeros(b_pad, jnp.int32),
        tile_ranges=jnp.zeros((2, 1), jnp.int32),
        num_rendered=jnp.int32(b_pad), total_padded=jnp.int32(b_pad),
        seg_bounds=jnp.zeros(p + 1, jnp.int32), prim_order=zero,
        prim_inv=zero, feat_rank=jnp.asarray(feat))

    exact, _ = _pack_features(None, None, None, None, bo, fast=False)
    packed, _ = _pack_features(None, None, None, None, bo, fast=True)
    assert exact.shape == packed.shape == (FEAT_ROWS, b_pad)
    e, q = np.asarray(exact), np.asarray(packed)
    # bitwise: x, y, conic (rows 0-4) and r, g (rows 6-7)
    for row in (0, 1, 2, 3, 4, 6, 7):
        np.testing.assert_array_equal(q[row], e[row], err_msg=f"row {row}")
    # opacity: u16 fixed-point half-step
    np.testing.assert_allclose(q[5], e[5], atol=0.5 / _OP_FIX + 1e-7, rtol=0)
    # blue: bf16 rounding (no sign smear from the packed opacity bits)
    np.testing.assert_allclose(q[8], e[8], rtol=2 ** -8, atol=0)
    # pad rows above TABLE_ROWS stay zero
    np.testing.assert_array_equal(q[9:], 0.0)
