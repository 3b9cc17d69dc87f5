"""Codebook k-means + multi-section PLY format round trips."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from reduced3dgs_tpu.data.ply import read_ply
from reduced3dgs_tpu.models import gaussians as G
from reduced3dgs_tpu.models.ply_io import (
    load_gaussian_ply, pool_from_arrays, save_gaussian_ply,
)
from reduced3dgs_tpu.ops import kmeans


def make_pool(n=200, cap=256, seed=0):
    rng = np.random.default_rng(seed)
    pool = G.create_from_pcd(
        rng.normal(0, 1, (n, 3)).astype(np.float32),
        rng.uniform(0, 1, (n, 3)).astype(np.float32), capacity=cap,
    )
    params = pool.params._replace(
        features_rest=jnp.asarray(rng.normal(0, 0.3, (cap, 15, 3)),
                                  jnp.float32),
        rotation=jnp.asarray(rng.normal(0, 1, (cap, 4)), jnp.float32),
        opacity=jnp.asarray(rng.normal(0, 1.5, (cap, 1)), jnp.float32),
    )
    degrees = jnp.asarray(rng.integers(0, 4, cap).astype(np.int32))
    return pool._replace(params=params, degrees=degrees)


def test_kmeans_clusters_1d():
    rng = np.random.default_rng(1)
    vals = np.concatenate([rng.normal(m, 0.05, 2000) for m in (-2, 0, 3)])
    vals = jnp.asarray(vals, jnp.float32)
    init = vals[jax.random.randint(jax.random.PRNGKey(0), (8,), 0, 6000)]
    ids, centers = kmeans.kmeans_1d(vals, init, 1e-4, num_clusters=8)
    # quantization error far below cluster spread
    err = jnp.abs(vals - centers[ids]).mean()
    assert float(err) < 0.05
    assert ids.dtype == jnp.int32 and int(ids.max()) < 8


def test_codebooks_reconstruct():
    pool = make_pool()
    cb = kmeans.produce_clusters(pool, jax.random.PRNGKey(0))
    assert len(cb) == 20
    # dequantised opacity (raw space) close to original for alive rows
    alive = np.asarray(pool.alive)
    deq = np.asarray(cb["opacity"].evaluate()).reshape(-1)[alive]
    raw = np.asarray(pool.params.opacity[:, 0])[alive]
    assert np.abs(deq - raw).mean() < 0.05
    pool2 = kmeans.apply_clustering(pool, cb)
    ds = np.abs(np.asarray(pool2.params.scaling - pool.params.scaling))[alive]
    assert ds.mean() < 0.1


def test_codebooks_degenerate_small_pool():
    """alive << num_clusters (and saturated opacity logits): every live
    value must land on (essentially) its own center, with finite
    inverse-activated centers.  Regression: the round-1 fit drowned the
    live values in dead-row mass and stored inf opacity centers."""
    pool = make_pool(n=14, cap=1024, seed=3)
    # saturate one opacity logit: sigmoid -> 1.0 in f32
    params = pool.params._replace(
        opacity=pool.params.opacity.at[0, 0].set(32.0))
    pool = pool._replace(params=params)
    cb = kmeans.produce_clusters(pool, jax.random.PRNGKey(0))
    for name, c in cb.items():
        assert np.isfinite(np.asarray(c.centers)).all(), name
    rec = kmeans.apply_clustering(pool, cb)
    alive = np.asarray(pool.alive)
    ds = np.abs(np.asarray(rec.params.scaling - pool.params.scaling))[alive]
    assert ds.max() < 1e-3
    # opacity compared post-sigmoid (saturated logits legitimately
    # decode to a different logit with the same effective opacity)
    so = 1 / (1 + np.exp(-np.asarray(pool.params.opacity)))[alive]
    sr = 1 / (1 + np.exp(-np.asarray(rec.params.opacity)))[alive]
    assert np.abs(so - sr).max() < 1e-3
    rot = np.asarray(pool.params.rotation)
    rot = rot / np.linalg.norm(rot, axis=-1, keepdims=True)
    dr = np.abs(np.asarray(rec.params.rotation) - rot)[alive]
    assert dr.max() < 1e-3


def _roundtrip(tmp_path, quantised, half_float, atol):
    pool = make_pool()
    cb = (kmeans.produce_clusters(pool, jax.random.PRNGKey(0))
          if quantised else None)
    path = os.path.join(tmp_path, "pc.ply")
    save_gaussian_ply(path, pool, cb, quantised=quantised,
                      half_float=half_float)
    arrs = load_gaussian_ply(path, quantised=quantised,
                             half_float=half_float)
    alive = np.asarray(pool.alive)
    n = int(alive.sum())
    assert arrs["xyz"].shape == (n, 3)
    # rows are grouped by degree; compare per-degree sets
    degs = np.asarray(pool.degrees)[alive]
    if quantised:
        ref = kmeans.apply_clustering(pool, cb)
    else:
        ref = pool
    for d in range(4):
        got = np.sort(arrs["xyz"][arrs["degrees"] == d], axis=0)
        want = np.sort(
            np.asarray(pool.params.xyz)[alive][degs == d], axis=0)
        np.testing.assert_allclose(got, want, atol=1e-3 if half_float else 1e-6)
        got_r = np.sort(arrs["rotation"][arrs["degrees"] == d], axis=0)
        want_r = np.sort(
            np.asarray(ref.params.rotation)[alive][degs == d], axis=0)
        np.testing.assert_allclose(got_r, want_r, atol=atol)


def test_ply_roundtrip_plain(tmp_path):
    _roundtrip(str(tmp_path), quantised=False, half_float=False, atol=1e-6)


def test_ply_roundtrip_half(tmp_path):
    _roundtrip(str(tmp_path), quantised=False, half_float=True, atol=2e-3)


def test_ply_roundtrip_quantised(tmp_path):
    _roundtrip(str(tmp_path), quantised=True, half_float=False, atol=1e-5)


def test_ply_roundtrip_quantised_half(tmp_path):
    _roundtrip(str(tmp_path), quantised=True, half_float=True, atol=2e-3)


def test_ply_roundtrip_pack_xyz(tmp_path):
    """quantised_pack variant: chunked fixed-point u16 xyz must
    round-trip ~16x tighter than float16 at the same 6 bytes/row, and
    autodetect on load via the xyz_chunk_bounds element."""
    pool = make_pool()
    cb = kmeans.produce_clusters(pool, jax.random.PRNGKey(0))
    path = os.path.join(str(tmp_path), "pack.ply")
    save_gaussian_ply(path, pool, cb, quantised=True, half_float=True,
                      xyz_codec="u16c")
    data = read_ply(path)
    assert "xyz_chunk_bounds" in data
    assert data["vertex_1"].dtype["x"] == np.dtype("<u2")
    # codec autodetected (no explicit xyz_codec)
    arrs = load_gaussian_ply(path, quantised=True, half_float=True)
    alive = np.asarray(pool.alive)
    want_all = np.asarray(pool.params.xyz)[alive]
    degs = np.asarray(pool.degrees)[alive]
    span = want_all.max(0) - want_all.min(0)
    for d in range(4):
        got = np.sort(arrs["xyz"][arrs["degrees"] == d], axis=0)
        want = np.sort(want_all[degs == d], axis=0)
        # error bound: one u16 step of the whole extent (chunk boxes
        # are never larger); f16 at this magnitude would be ~16x worse
        np.testing.assert_allclose(got, want,
                                   atol=float(span.max()) / 65535 + 1e-7)
    # same bytes as the plain _half layout + ~24B per 256-row chunk
    half_path = os.path.join(str(tmp_path), "half.ply")
    save_gaussian_ply(half_path, pool, cb, quantised=True,
                      half_float=True)
    n_chunks = sum(-(-int(((np.asarray(pool.degrees) == d) & alive).sum())
                     // 256) for d in range(4))
    overhead = os.path.getsize(path) - os.path.getsize(half_path)
    assert overhead <= 24 * n_chunks + 200  # + bounds element header


def test_ply_format_matches_reference_schema(tmp_path):
    """Element names/properties must match gaussian_model.py:239-311."""
    pool = make_pool()
    cb = kmeans.produce_clusters(pool, jax.random.PRNGKey(0))
    path = os.path.join(str(tmp_path), "q.ply")
    save_gaussian_ply(path, pool, cb, quantised=True, half_float=True)
    data = read_ply(path)
    assert list(data.keys()) == [f"vertex_{i}" for i in range(4)] + [
        "codebook_centers"]
    v1 = data["vertex_1"]
    assert v1.dtype.names[:6] == ("x", "y", "z", "f_dc_0", "f_dc_1", "f_dc_2")
    assert "f_rest_8" in v1.dtype.names and "f_rest_9" not in v1.dtype.names
    assert v1.dtype["x"] == np.dtype("<i2")  # half-float bitcast
    assert v1.dtype["f_dc_0"] == np.dtype("u1")  # quantised ids
    cbel = data["codebook_centers"]
    assert len(cbel) == 256 and len(cbel.dtype.names) == 20

    # quantised+half sizes: ~27x smaller than 59-float baseline would be
    n_alive = int(np.asarray(pool.alive).sum())
    size = os.path.getsize(path)
    baseline = n_alive * 59 * 4
    assert size < baseline  # (tiny pool; codebook overhead dominates)
