"""1-D k-means codebook quantization (JAX).

Replaces the CUDA Lloyd iteration (reduced_3dgs/kmeans.cu:13-122, driver
Reduced3DGS::kmeans reduced_3dgs.cu:288-339) and the codebook machinery
(generate_codebook / Codebook, scene/gaussian_model.py:28-45): 256-entry
scalar codebooks with uint8 ids, tolerance-based convergence, max 500
iterations.

TPU formulation: one Lloyd step = distance argmin (a (N, 256) broadcast
on the VPU, chunked) + segment-sum center update; the convergence loop is
a lax.while_loop so the whole fit stays on device.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Codebook(NamedTuple):
    """ids: (...,) uint8 assignments; centers: (num_clusters, 1) values."""

    ids: jnp.ndarray
    centers: jnp.ndarray

    def evaluate(self):
        return self.centers[self.ids.astype(jnp.int32).reshape(-1)]


def _assign(values, centers, chunk=1 << 16):
    """Closest-center id per value (updateIds, kmeans.cu:13-31)."""
    n = values.shape[0]
    pad = (-n) % chunk
    v = jnp.pad(values, (0, pad))

    def per_chunk(i, out):
        s = i * chunk
        blk = jax.lax.dynamic_slice_in_dim(v, s, chunk, 0)
        d = jnp.abs(blk[:, None] - centers[None, :])
        ids = jnp.argmin(d, axis=1).astype(jnp.int32)
        return jax.lax.dynamic_update_slice_in_dim(out, ids, s, 0)

    out = jnp.zeros(v.shape[0], jnp.int32)
    out = jax.lax.fori_loop(0, v.shape[0] // chunk, per_chunk, out)
    return out[:n]


@partial(jax.jit, static_argnames=("num_clusters", "max_iterations"))
def kmeans_1d(values, init_centers, tol=1e-4, *, num_clusters=256,
              max_iterations=500):
    """Lloyd iterations until sum |delta center| < tol (kmeans.cu driver).

    Empty clusters keep their previous center (the CUDA updateCenters
    divides accumulated sums by counts only where count > 0).
    """
    values = values.reshape(-1).astype(jnp.float32)

    def step(carry):
        centers, _, it = carry
        ids = _assign(values, centers)
        sums = jax.ops.segment_sum(values, ids, num_segments=num_clusters)
        counts = jax.ops.segment_sum(jnp.ones_like(values), ids,
                                     num_segments=num_clusters)
        new_centers = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0),
                                centers)
        delta = jnp.abs(new_centers - centers).sum()
        return new_centers, delta, it + 1

    def cond(carry):
        _, delta, it = carry
        return (delta >= tol) & (it < max_iterations)

    centers, _, _ = jax.lax.while_loop(
        cond, step, (init_centers.reshape(-1), jnp.float32(jnp.inf),
                     jnp.int32(0))
    )
    ids = _assign(values, centers)
    return ids, centers


def generate_codebook(values, key, inverse_activation_fn=lambda x: x,
                      num_clusters=256, tol=1e-4):
    """generate_codebook (gaussian_model.py:36-45): random-sample init,
    fit, store inverse-activated centers + uint8-able ids."""
    shape = values.shape
    flat = values.reshape(-1)
    init_idx = jax.random.randint(key, (num_clusters,), 0, flat.shape[0])
    ids, centers = kmeans_1d(flat, flat[init_idx], tol,
                             num_clusters=num_clusters)
    return Codebook(
        ids=ids.astype(jnp.uint8).reshape(shape),
        centers=inverse_activation_fn(centers).reshape(-1, 1),
    )


def produce_clusters(pool, key, num_clusters=256, max_sh_degree=3):
    """GaussianModel.produce_clusters (gaussian_model.py:762-783): the 20
    codebooks of the paper — features_dc, features_rest_0..14, opacity
    (inverse-sigmoid space), scaling (log space), rotation re/im.

    Only alive rows feed the codebooks; dead slots would skew centers.
    NOTE: the fit uses the alive values with dead rows *mapped to the
    value of an arbitrary alive row* so shapes stay static.
    """
    alive = pool.alive
    first_alive = jnp.argmax(alive)

    def alive_vals(x):
        src = jnp.where(
            alive.reshape((-1,) + (1,) * (x.ndim - 1)), x, x[first_alive]
        )
        return src

    keys = jax.random.split(key, 20)
    max_coeffs = (max_sh_degree + 1) ** 2 - 1
    cb = {}
    cb["features_dc"] = generate_codebook(
        alive_vals(pool.params.features_dc)[:, 0], keys[0], tol=1e-3,
        num_clusters=num_clusters,
    )
    for i in range(max_coeffs):
        cb[f"features_rest_{i}"] = generate_codebook(
            alive_vals(pool.params.features_rest)[:, i], keys[1 + i],
            num_clusters=num_clusters,
        )
    inv_sigmoid = lambda y: jnp.log(y / (1.0 - y))
    cb["opacity"] = generate_codebook(
        jax.nn.sigmoid(alive_vals(pool.params.opacity)), keys[16],
        inverse_activation_fn=inv_sigmoid, num_clusters=num_clusters,
    )
    cb["scaling"] = generate_codebook(
        jnp.exp(alive_vals(pool.params.scaling)), keys[17],
        inverse_activation_fn=jnp.log, num_clusters=num_clusters,
    )
    rot = alive_vals(pool.params.rotation)
    rot = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
    cb["rotation_re"] = generate_codebook(rot[:, 0:1], keys[18],
                                          num_clusters=num_clusters)
    cb["rotation_im"] = generate_codebook(rot[:, 1:], keys[19],
                                          num_clusters=num_clusters)
    return cb


def apply_clustering(pool, codebook_dict, max_sh_degree=3):
    """GaussianModel.apply_clustering (gaussian_model.py:785-807): replace
    raw parameters by their dequantized codebook values (fine-tune /
    inference path)."""
    max_coeffs = (max_sh_degree + 1) ** 2 - 1
    c = pool.capacity
    opacity = codebook_dict["opacity"].evaluate().reshape(c, 1)
    scaling = codebook_dict["scaling"].evaluate().reshape(c, 3)
    rotation = jnp.concatenate(
        [codebook_dict["rotation_re"].evaluate().reshape(c, 1),
         codebook_dict["rotation_im"].evaluate().reshape(c, 3)], axis=1)
    f_dc = codebook_dict["features_dc"].evaluate().reshape(c, 1, 3)
    f_rest = jnp.stack(
        [codebook_dict[f"features_rest_{i}"].evaluate().reshape(c, 3)
         for i in range(max_coeffs)], axis=1)
    return pool._replace(params=pool.params._replace(
        xyz=pool.params.xyz, features_dc=f_dc, features_rest=f_rest,
        scaling=scaling, rotation=rotation, opacity=opacity,
    ))
