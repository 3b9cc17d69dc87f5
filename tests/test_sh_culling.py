"""Adaptive SH-band culling behavior (oracle backend, CPU).

Mirrors the semantics of cull_sh_bands (gaussian_model.py:728-760):
primitives whose view-dependent colour barely changes get demoted to
lower SH degrees; colour-stable primitives collapse to degree 0 with the
DC term rewritten to the observed mean colour.
"""

import math

import jax.numpy as jnp
import numpy as np

from reduced3dgs_tpu.cameras import Camera
from reduced3dgs_tpu.models import gaussians as G
from reduced3dgs_tpu.ops import sh_culling


def make_pool_and_cams(n=24, seed=0):
    rng = np.random.default_rng(seed)
    pool = G.create_from_pcd(
        rng.uniform(-0.6, 0.6, (n, 3)).astype(np.float32),
        rng.uniform(0.3, 0.9, (n, 3)).astype(np.float32), capacity=32,
    )
    # half the primitives get strong view-dependent SH, half stay flat
    rest = np.zeros((32, 15, 3), np.float32)
    rest[: n // 2] = rng.normal(0, 0.8, (n // 2, 15, 3))
    pool = pool._replace(
        params=pool.params._replace(
            features_rest=jnp.asarray(rest),
            opacity=jnp.full((32, 1), 3.0),  # opaque -> well observed
        ),
        degrees=jnp.where(pool.alive, 3, 0).astype(jnp.int32),
        active_sh_degree=jnp.int32(3),
    )
    cams = [
        Camera.look_at(
            eye=(3 * math.cos(a), 0.5, 3 * math.sin(a)),
            target=(0, 0, 0), width=48, height=48, uid=i)
        for i, a in enumerate(np.linspace(0, 2 * np.pi, 6, endpoint=False))
    ]
    return pool, cams


def test_variance_stats_separate_flat_from_viewdependent():
    pool, cams = make_pool_and_cams()
    dists, var, mean = sh_culling.calculate_colours_variance(
        pool, cams, budget=4096, backend="xla")
    alive = np.asarray(pool.alive)
    d = np.nan_to_num(np.asarray(dists))[alive]
    flat = d[12:]  # second half: zero rest coeffs
    vd = d[:12]
    # distance from full colour to degree-0 colour is ~0 for flat ones
    assert flat[:, 0].max() < 1e-4
    assert np.median(vd[:, 0]) > flat[:, 0].max() + 1e-3


def test_cull_sh_bands_demotes_degrees():
    pool, cams = make_pool_and_cams()
    culled = sh_culling.cull_sh_bands(
        pool, cams, threshold=6 * np.sqrt(3) / 255.0, std_threshold=0.04,
        budget=4096, backend="xla")
    alive = np.asarray(pool.alive)
    deg = np.asarray(culled.degrees)[alive]
    # flat primitives drop below degree 3; strongly view-dependent mostly
    # keep high degrees
    assert (deg[12:] < 3).all(), deg[12:]
    assert np.median(deg[:12]) >= 2, deg[:12]
    # zeroed coefficients for demoted bands
    rest = np.asarray(culled.params.features_rest)[alive]
    for i, dg in enumerate(deg):
        coeffs = (dg + 1) ** 2 - 1
        assert np.allclose(rest[i, coeffs:], 0.0)
