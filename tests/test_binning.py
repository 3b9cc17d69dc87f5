"""Direct unit tests for ops/binning.py against a numpy oracle.

The renderer tests exercise binning end-to-end; these localize failures:
per-tile instance lists (contents + depth order), K-alignment of the
relocation, the expand's row-major rect enumeration under truncation,
and the u32 packed-key fast path vs the 2-column fallback.

Reference semantics: duplicateWithKeys + radix sort + identifyTileRanges
(/root/reference/cuda_rasterizer/rasterizer_impl.cu:97-141,290-334).
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from reduced3dgs_tpu.ops import binning  # noqa: E402
from reduced3dgs_tpu.ops.preprocess import PreprocessOut  # noqa: E402


def make_prep(p, gx, gy, rng, cull_frac=0.2):
    """Synthetic PreprocessOut with just the fields binning reads."""
    rmin_x = rng.integers(0, gx, p)
    rmin_y = rng.integers(0, gy, p)
    w = rng.integers(1, 5, p)
    h = rng.integers(1, 5, p)
    rmax_x = np.minimum(rmin_x + w, gx)
    rmax_y = np.minimum(rmin_y + h, gy)
    tiles = (rmax_x - rmin_x) * (rmax_y - rmin_y)
    culled = rng.random(p) < cull_frac
    tiles[culled] = 0
    depths = rng.uniform(0.3, 10.0, p).astype(np.float32)
    z = np.zeros((p, 2), np.float32)
    return PreprocessOut(
        means2d=z, depths=jnp.asarray(depths),
        conic=np.zeros((p, 3), np.float32),
        opacity=np.zeros(p, np.float32),
        color=np.zeros((p, 3), np.float32),
        radii=jnp.asarray((tiles > 0).astype(np.int32)),
        rect_min=jnp.asarray(np.stack([rmin_x, rmin_y], 1).astype(np.int32)),
        rect_max=jnp.asarray(np.stack([rmax_x, rmax_y], 1).astype(np.int32)),
        tiles_touched=jnp.asarray(tiles.astype(np.int32)),
    )


def oracle_lists(prep, gx, gy):
    """Per-tile rank lists: primitives sorted by (depth-bits, id)."""
    depths = np.asarray(prep.depths)
    order = np.lexsort((np.arange(len(depths)),
                        depths.view(np.int32)))  # rank -> original id
    tiles = {t: [] for t in range(gx * gy)}
    for rank, pid in enumerate(order):
        if int(prep.tiles_touched[pid]) == 0:
            continue
        x0, y0 = np.asarray(prep.rect_min)[pid]
        x1, y1 = np.asarray(prep.rect_max)[pid]
        for ty in range(y0, y1):
            for tx in range(x0, x1):
                tiles[ty * gx + tx].append(rank)
    return order, tiles


def run_bin(prep, width, height, budget):
    return jax.jit(
        lambda pr: binning.bin_gaussians(pr, width, height, budget)
    )(prep)


def check_against_oracle(b, prep, gx, gy):
    order, tiles = oracle_lists(prep, gx, gy)
    gauss = np.asarray(b.gauss_aligned)
    ranges = np.asarray(b.tile_ranges)
    assert np.array_equal(np.asarray(b.prim_order), order)
    for t in range(gx * gy):
        s, e = int(ranges[0, t]), int(ranges[1, t])
        assert s % binning.ALIGN == 0, "tile start not K-aligned"
        got = gauss[s:e].tolist()
        assert got == tiles[t], f"tile {t}: {got} != {tiles[t]}"
        # alignment slack after the range is padding
        pad_end = s + -(-(e - s) // binning.ALIGN) * binning.ALIGN
        assert np.all(np.asarray(b.pad_mask)[e:pad_end])


def test_binning_matches_oracle():
    rng = np.random.default_rng(3)
    gx, gy = 7, 5  # 112x80 image
    prep = make_prep(200, gx, gy, rng)
    b = run_bin(prep, gx * 16, gy * 16, 4096)
    nr = int(b.num_rendered)
    assert nr == int(np.asarray(prep.tiles_touched).sum())
    check_against_oracle(b, prep, gx, gy)


def test_binning_empty_and_full_cull():
    rng = np.random.default_rng(4)
    gx, gy = 4, 3
    prep = make_prep(50, gx, gy, rng, cull_frac=1.0)
    b = run_bin(prep, gx * 16, gy * 16, 1024)
    assert int(b.num_rendered) == 0
    assert bool(np.asarray(b.pad_mask).all())
    assert np.array_equal(np.asarray(b.tile_ranges[0]),
                          np.asarray(b.tile_ranges[1]))


def test_truncation_keeps_expand_prefix():
    """budget < num_rendered: kept instances are exactly the first nv of
    the expand order (rank-major, row-major over each rect), like the
    clipped duplicateWithKeys stream."""
    rng = np.random.default_rng(5)
    gx, gy = 6, 4
    prep = make_prep(150, gx, gy, rng, cull_frac=0.1)
    nr = int(np.asarray(prep.tiles_touched).sum())
    budget = (nr // 2 // binning.ALIGN) * binning.ALIGN
    b = run_bin(prep, gx * 16, gy * 16, budget)
    assert int(b.num_rendered) == nr  # true count still reported

    order, _ = oracle_lists(prep, gx, gy)
    # expand-order stream of (tile, rank), truncated to budget
    stream = []
    for rank, pid in enumerate(order):
        if int(prep.tiles_touched[pid]) == 0:
            continue
        x0, y0 = np.asarray(prep.rect_min)[pid]
        x1, y1 = np.asarray(prep.rect_max)[pid]
        for ty in range(y0, y1):
            for tx in range(x0, x1):
                stream.append((ty * gx + tx, rank))
    kept = sorted(stream[:budget])
    gauss = np.asarray(b.gauss_aligned)
    ranges = np.asarray(b.tile_ranges)
    got = []
    for t in range(gx * gy):
        s, e = int(ranges[0, t]), int(ranges[1, t])
        # truncated tiles may have shorter real extents: end counts only
        # non-pad slots
        seg = gauss[s:e]
        seg = seg[seg != np.int32(2**31 - 1)]
        got += [(t, int(r)) for r in seg]
    assert sorted(got) == kept


def test_two_col_fallback_matches_packed(monkeypatch):
    rng = np.random.default_rng(6)
    gx, gy = 7, 5
    prep = make_prep(180, gx, gy, rng)
    b_fast = run_bin(prep, gx * 16, gy * 16, 2048)
    monkeypatch.setattr(binning, "_use_packed_key", lambda t, p: False)
    b_slow = jax.jit(
        lambda pr: binning.bin_gaussians(pr, gx * 16, gy * 16, 2048)
    )(prep)
    for a, c in zip(jax.tree.leaves(b_fast), jax.tree.leaves(b_slow)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_slack_overflow_trips_regrow_contract():
    """A pathological scene (one instance in each of many tiles) needs
    more K-alignment slack than the statistical pool reserves; binning
    must clamp the layout inside array bounds and render() must report
    it through num_rendered so the standard regrow loop recovers an
    image identical to a big-budget render (round-4 slack tightening)."""
    import jax
    import jax.numpy as jnp

    from reduced3dgs_tpu.cameras import Camera
    from reduced3dgs_tpu.ops.binning import _slack_pool, padded_size
    from reduced3dgs_tpu.renderer import render

    w = h = 128  # 8x8 = 64 tiles
    assert _slack_pool(64) < 64 * 128  # the pool CAN be exceeded here
    n = 64
    # one tiny splat per tile center
    ys, xs = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    px = (xs.reshape(-1) * 16 + 8).astype(np.float32)
    py = (ys.reshape(-1) * 16 + 8).astype(np.float32)
    # place in world space on the z=0 plane of a fronto-parallel camera
    cam = Camera.look_at(eye=(0, 0, -2.0), target=(0, 0, 0), width=w,
                         height=h)
    # back-project pixel centers to world at depth 2 (fov 60deg)
    tanx, tany = cam.tan_fovx, cam.tan_fovy
    wx = (px / w * 2 - 1) * tanx * 2.0
    wy = (py / h * 2 - 1) * tany * 2.0
    xyz = np.stack([wx, wy, np.zeros_like(wx)], 1).astype(np.float32)
    feats = np.zeros((n, 16, 3), np.float32)
    feats[:, 0] = 1.0
    scales = np.full((n, 3), np.log(0.004), np.float32)
    rots = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    opac = np.full(n, 3.0, np.float32)
    deg = np.zeros(n, np.int32)
    args = tuple(jnp.asarray(a) for a in (xyz, feats, scales, rots, opac))

    def run(budget):
        return render(*args, jnp.asarray(deg), cam.params(), jnp.zeros(3),
                      width=w, height=h, instance_budget=budget,
                      backend="pallas")

    budget = 128
    out = run(budget)
    assert int(out.num_rendered) > budget  # the overflow IS reported
    while int(out.num_rendered) > budget:  # standard regrow loop
        budget *= 2
        out = run(budget)
        assert budget <= 1 << 16, "regrow did not converge"
    ref = run(1 << 14)
    np.testing.assert_allclose(np.asarray(out.color),
                               np.asarray(ref.color), atol=1e-6)
    # and the recovered image actually contains the splats
    assert float(jnp.asarray(out.color).max()) > 0.1


@pytest.mark.parametrize("p,budget", [(700, 8192 + 1024),
                                      (2200, 32 * 1024)])
def test_expand_stream_matches_scatter_semantics(p, budget):
    """Direct _expand_stream check at MULTI-chunk scale against the
    scatter+cumsum/cummax semantics it replaced: values at every slot
    equal the (rank-1, rectpack, start-slot) of the last marked
    primitive at-or-before it, 0-series (-1 for rank) before the first
    mark, with empty (unmarked) primitives interleaved and clustered.
    The larger case exercises the mark window-GROUP DMA rotation
    (ngrp > 1) that small renders never reach."""
    rng = np.random.default_rng(11)
    counts = rng.poisson(11, p).astype(np.int64)
    counts[:80] = 0
    counts[rng.integers(0, p, 60)] = 0
    offsets = np.cumsum(counts)
    assert offsets[-1] < budget
    starts = (offsets - counts).astype(np.int32)
    mark_pos = np.where(counts > 0, starts, budget).astype(np.int32)
    rank1 = np.arange(1, p + 1, dtype=np.int32)
    rectpack = rng.integers(0, 1 << 30, p, dtype=np.int64).astype(
        np.int32)

    g, r, s = binning._expand_stream(
        jnp.asarray(mark_pos), jnp.asarray(rank1), jnp.asarray(rectpack),
        budget)

    # reference: scatter deltas + prefix fill in numpy
    ref_g = np.zeros(budget, np.int64)
    ref_r = np.zeros(budget, np.int64)
    ref_s = np.zeros(budget, np.int64)
    last = (0, 0, 0)
    marks = {int(mp): i for i, mp in enumerate(mark_pos) if mp < budget}
    for slot in range(budget):
        if slot in marks:
            i = marks[slot]
            last = (int(rank1[i]), int(rectpack[i]), slot)
        ref_g[slot], ref_r[slot], ref_s[slot] = last
    np.testing.assert_array_equal(np.asarray(g), ref_g - 1)
    np.testing.assert_array_equal(np.asarray(r), ref_r)
    np.testing.assert_array_equal(np.asarray(s), ref_s)
