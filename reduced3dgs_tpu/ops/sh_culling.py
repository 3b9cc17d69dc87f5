"""Adaptive SH-band culling (JAX) — colour variance/distance statistics.

Replaces Reduced3DGS::calculateColourVariance (reduced_3dgs.cu:41-203) +
calculateColour (reduced_3dgs/sh_culling.cu:6-91) and the culling passes
GaussianModel._low_variance_colour_culling / _low_distance_colour_culling
(gaussian_model.py:697-726).

Per training camera:
  * render with transmittance accumulation (the calculate_mean_transmittance
    outputs of forward.cu:560-565) -> per-Gaussian mean blend transmittance
    w = sum_T / max(touched, 1) and presence (radii > 0),
  * per-degree colours at the camera direction (clamped at each emitted
    cumulative degree, zero above the primitive's own degree),
  * accumulate w-weighted colour distances (full vs degree-d) and a
    streaming w-weighted Welford mean/variance of the full colour.

Returned: (avg_distances (P, D), weighted_variance (P,1,3), mean (P,1,3)).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from reduced3dgs_tpu.ops import sh as sh_ops
from reduced3dgs_tpu.ops.preprocess import CameraParams
from reduced3dgs_tpu.renderer import render


@partial(jax.jit, static_argnames=("width", "height", "budget", "backend",
                                   "max_sh_degree"))
def _accumulate_camera(acc, xyz, features, scaling, rotation, opacity,
                       degrees, alive, cam: CameraParams, *, width, height,
                       budget, backend, max_sh_degree):
    wsum, dist_accum, mean, var = acc
    out = render(
        xyz, features, scaling, rotation, opacity, degrees, cam,
        jnp.zeros(3), width=width, height=height, instance_budget=budget,
        alive_mask=alive, backend=backend, want_transmittance=True,
    )
    present = out.radii > 0
    touched = jnp.maximum(out.pixels_touched, 1).astype(jnp.float32)
    w = (out.transmittance_sum / touched)[:, None]  # (P,1)

    dirs = xyz - cam.campos[None, :]
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True),
                              1e-12)
    colours = sh_ops.eval_sh_color_per_degree(
        features, dirs, degrees, max_degree=max_sh_degree
    )  # (P, D+1, 3)
    colours = jnp.where(present[:, None, None], colours, 0.0)
    full = colours[:, max_sh_degree, :]  # (P,3)

    # distance of the full colour to each truncated-degree colour
    d = jnp.sqrt(
        ((full[:, None, :] - colours[:, :max_sh_degree, :]) ** 2).sum(-1)
    )  # (P, D)
    d = jnp.nan_to_num(d)
    dist_accum = dist_accum + w * d

    new_wsum = wsum + w
    coef = jnp.nan_to_num(w / new_wsum)  # 0 where wSum == 0
    mean_old = mean
    mean = mean_old + coef[:, :, None] * (full[:, None, :] - mean_old)
    var = var + w[:, :, None] * (full[:, None, :] - mean_old) * (
        full[:, None, :] - mean
    )
    return (new_wsum, dist_accum, mean, var)


def calculate_colours_variance(pool, cameras, *, budget=1 << 17,
                               backend="pallas", max_sh_degree=3):
    """Loop over all cameras (reduced_3dgs.cu:88-195).

    pool: GaussianPool.  Returns (avg_distances, weighted_variance,
    weighted_mean) with the reference's division-by-wSum semantics
    (NaN where a primitive was never blended, handled by the callers).
    """
    p = pool.capacity
    acc = (
        jnp.zeros((p, 1)),
        jnp.zeros((p, max_sh_degree)),
        jnp.zeros((p, 1, 3)),
        jnp.zeros((p, 1, 3)),
    )
    feats = pool.features()
    for cam in cameras:
        cp = cam.params() if hasattr(cam, "params") else cam
        acc = _accumulate_camera(
            acc, pool.params.xyz, feats, pool.params.scaling,
            pool.params.rotation, pool.params.opacity[:, 0], pool.degrees,
            pool.alive, cp, width=cp.width, height=cp.height, budget=budget,
            backend=backend, max_sh_degree=max_sh_degree,
        )
    wsum, dist_accum, mean, var = acc
    return dist_accum / wsum, var / wsum[:, :, None], mean


def low_variance_colour_culling(pool, std_threshold, weighted_variance,
                                weighted_mean):
    """Degree-0 demotion of colour-stable primitives
    (gaussian_model.py:697-709): set the DC term to reproduce the mean
    observed colour, zero the rest."""
    std = jnp.nan_to_num(jnp.sqrt(weighted_variance))  # (P,1,3)
    std = std.mean(axis=2)[:, 0]  # (P,)
    mask = pool.alive & (std < std_threshold)
    f_dc = jnp.where(
        mask[:, None, None],
        (weighted_mean - 0.5) / sh_ops.SH_C0,
        pool.params.features_dc,
    )
    f_rest = jnp.where(mask[:, None, None], 0.0, pool.params.features_rest)
    degrees = jnp.where(mask, 0, pool.degrees)
    return pool._replace(
        params=pool.params._replace(features_dc=f_dc, features_rest=f_rest),
        degrees=degrees,
    ), mask.sum()


def low_distance_colour_culling(pool, threshold, colour_distances,
                                active_sh_degree=3):
    """Demote bands whose colour contribution is imperceptible
    (gaussian_model.py:711-726)."""
    dists = jnp.nan_to_num(colour_distances)  # (P, D)
    degrees = pool.degrees
    f_rest = pool.params.features_rest
    coeff_band = jnp.array([0] + [1] * 3 + [2] * 5 + [3] * 7, jnp.int32)[1:]
    for d in range(active_sh_degree - 1, 0, -1):
        mask = pool.alive & (dists[:, d] < threshold)
        degrees = jnp.where(mask, jnp.minimum(d, degrees), degrees)
        # zero coefficients of bands > d (rest index >= (d+1)^2 - 1)
        kill = mask[:, None] & (coeff_band[None, :] > d)
        f_rest = jnp.where(kill[:, :, None], 0.0, f_rest)
    return pool._replace(
        params=pool.params._replace(features_rest=f_rest), degrees=degrees
    )


def cull_sh_bands(pool, cameras, threshold=0.0, std_threshold=0.0, *,
                  budget=1 << 17, backend="pallas", max_sh_degree=3,
                  active_sh_degree=3):
    """GaussianModel.cull_sh_bands (gaussian_model.py:728-760): variance
    pass, recompute, distance pass."""
    _, var, mean = calculate_colours_variance(
        pool, cameras, budget=budget, backend=backend,
        max_sh_degree=max_sh_degree,
    )
    pool, _ = low_variance_colour_culling(pool, std_threshold, var, mean)
    dists, _, _ = calculate_colours_variance(
        pool, cameras, budget=budget, backend=backend,
        max_sh_degree=max_sh_degree,
    )
    pool = low_distance_colour_culling(pool, threshold, dists,
                                       active_sh_degree)
    return pool
