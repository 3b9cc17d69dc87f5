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


def test_variance_stats_golden_reference_semantics():
    """Golden N9 test: expected statistics computed OUTSIDE the
    framework, with explicit numpy transcriptions of the reference
    kernels (reduced_3dgs.cu:41-203 Welford/distance accumulation,
    sh_culling.cu:6-91 cumulative clamped per-degree colours), for a
    2-primitive, 2-camera case whose per-camera mean transmittances are
    knowable by construction:

      * p0: isolated, degree 3, visible from both cameras -> at every
        pixel it touches it is the frontmost (only) primitive, so its
        blend transmittance is exactly 1 at each touched pixel and its
        mean transmittance w is exactly 1.0 per camera;
      * p1: degree 1, visible from camera 0 (w=1) but BEHIND camera 1
        (view z < 0.2, frustum-culled, forward.cu in_frustum) -> w=0,
        present=false; exercises the unequal-weight Welford path and
        the colours[~present]=0 zeroing;
      * (pool padding rows are never present: wSum=0 -> NaN outputs,
        the reference's 0/0 division semantics.)

    Pins the reference quirk that a primitive with degree < max has
    colours[deg+1..3] = 0, so its "full" colour is 0 and its distances
    compare each truncated colour against zero.
    """
    # --- scene ----------------------------------------------------------
    rng = np.random.default_rng(7)
    p0 = np.array([0.0, 0.0, 0.0], np.float32)
    p1 = np.array([3.5, 0.0, 4.0], np.float32)  # behind cam1 (x > 3)
    sh = rng.normal(0, 0.4, (2, 16, 3)).astype(np.float32)
    sh[:, 0] = rng.uniform(0.5, 1.5, (2, 3))  # bright DC: keep clamps off
    degrees = np.array([3, 1], np.int32)
    cam0 = Camera.look_at(eye=(0, 0, -3), target=(0, 0, 1),
                          width=64, height=64, uid=0)
    cam1 = Camera.look_at(eye=(3, 0, 0), target=(0, 0, 0),
                          width=64, height=64, uid=1)

    pool = G.create_from_pcd(
        np.stack([p0, p1]), np.full((2, 3), 0.5, np.float32), capacity=8)
    pool = pool._replace(
        params=pool.params._replace(
            features_dc=pool.params.features_dc.at[:2].set(sh[:, :1]),
            features_rest=pool.params.features_rest.at[:2].set(sh[:, 1:]),
            scaling=pool.params.scaling.at[:2].set(np.log(0.08)),
            opacity=pool.params.opacity.at[:2].set(3.0),
        ),
        degrees=pool.degrees.at[:2].set(jnp.asarray(degrees)),
        active_sh_degree=jnp.int32(3),
    )

    dists, var, mean = sh_culling.calculate_colours_variance(
        pool, [cam0, cam1], budget=4096, backend="pallas")
    dists, var, mean = (np.asarray(dists), np.asarray(var),
                        np.asarray(mean))

    # --- expected values: plain numpy, no framework imports -------------
    SH_C0 = 0.28209479177387814
    SH_C1 = 0.4886025119029199
    SH_C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
             -1.0925484305920792, 0.5462742152960396]
    SH_C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
             0.3731763325901154, -0.4570457994644658, 1.445305721320277,
             -0.5900435899266435]

    def colours_per_degree(pos, campos, coeffs, deg):
        """sh_culling.cu:6-58: cumulative clamped colours, zeros above
        the primitive's own degree."""
        d = pos - campos
        x, y, z = d / np.linalg.norm(d)
        out = np.zeros((4, 3))
        c = SH_C0 * coeffs[0] + 0.5
        out[0] = np.maximum(c, 0.0)
        if deg == 0:
            return out
        c = c - SH_C1 * y * coeffs[1] + SH_C1 * z * coeffs[2] \
            - SH_C1 * x * coeffs[3]
        out[1] = np.maximum(c, 0.0)
        if deg == 1:
            return out
        xx, yy, zz, xy, yz, xz = x * x, y * y, z * z, x * y, y * z, x * z
        c = (c + SH_C2[0] * xy * coeffs[4] + SH_C2[1] * yz * coeffs[5]
             + SH_C2[2] * (2 * zz - xx - yy) * coeffs[6]
             + SH_C2[3] * xz * coeffs[7] + SH_C2[4] * (xx - yy) * coeffs[8])
        out[2] = np.maximum(c, 0.0)
        if deg == 2:
            return out
        c = (c + SH_C3[0] * y * (3 * xx - yy) * coeffs[9]
             + SH_C3[1] * xy * z * coeffs[10]
             + SH_C3[2] * y * (4 * zz - xx - yy) * coeffs[11]
             + SH_C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * coeffs[12]
             + SH_C3[4] * x * (4 * zz - xx - yy) * coeffs[13]
             + SH_C3[5] * z * (xx - yy) * coeffs[14]
             + SH_C3[6] * x * (xx - 3 * yy) * coeffs[15])
        out[3] = np.maximum(c, 0.0)
        return out

    # per-(cam, prim) mean transmittance & presence, by construction
    w_table = np.array([[1.0, 1.0],   # cam0: both isolated & frontmost
                        [1.0, 0.0]])  # cam1: p1 frustum-culled
    campos = [np.array([0.0, 0.0, -3.0]), np.array([3.0, 0.0, 0.0])]
    positions = [p0, p1]

    exp_wsum = np.zeros(2)
    exp_dist = np.zeros((2, 3))
    exp_mean = np.zeros((2, 3))
    exp_var = np.zeros((2, 3))
    for ci in range(2):
        for pi in range(2):
            w = w_table[ci, pi]
            present = w > 0
            cols = (colours_per_degree(positions[pi], campos[ci],
                                       sh[pi], degrees[pi])
                    if present else np.zeros((4, 3)))
            full = cols[3]
            for d in range(3):  # reduced_3dgs.cu:168-183
                exp_dist[pi, d] += w * np.linalg.norm(full - cols[d])
            exp_wsum[pi] += w
            coef = w / exp_wsum[pi] if exp_wsum[pi] > 0 else 0.0
            if present:  # index_put_({present}, ...) gating
                mean_old = exp_mean[pi].copy()
                exp_mean[pi] = mean_old + coef * (full - mean_old)
                exp_var[pi] += w * (full - mean_old) * (full - exp_mean[pi])
    exp_avg_dist = exp_dist / exp_wsum[:, None]
    exp_var_out = exp_var / exp_wsum[:, None]

    np.testing.assert_allclose(dists[:2], exp_avg_dist, atol=1e-5)
    np.testing.assert_allclose(var[:2, 0], exp_var_out, atol=1e-5)
    np.testing.assert_allclose(mean[:2, 0], exp_mean, atol=1e-5)
    # p1's quirk value is nonzero (distances against the zero "full")
    assert exp_avg_dist[1, 0] > 0.1
    # never-present padding rows divide by wSum=0 -> NaN
    assert np.isnan(dists[2:]).all()


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
