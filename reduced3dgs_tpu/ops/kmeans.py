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
              max_iterations=500, weights=None):
    """Lloyd iterations until sum |delta center| < tol (kmeans.cu driver).

    Empty clusters keep their previous center (the CUDA updateCenters
    divides accumulated sums by counts only where count > 0).

    `weights` (same flat length as `values`, 0/1) lets callers exclude
    padding rows from the center updates while keeping static shapes:
    zero-weight values still get an id assigned but contribute nothing
    to the fit (the CUDA path never sees dead rows at all — it fits on
    the compacted tensor, kmeans.cu:13-31).
    """
    values = values.reshape(-1).astype(jnp.float32)
    w = (jnp.ones_like(values) if weights is None
         else weights.reshape(-1).astype(jnp.float32))

    def step(carry):
        centers, _, it = carry
        ids = _assign(values, centers)
        sums = jax.ops.segment_sum(values * w, ids,
                                   num_segments=num_clusters)
        counts = jax.ops.segment_sum(w, ids, num_segments=num_clusters)
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


def _quantile_init(flat, weights, num_clusters):
    """Half the centers at evenly spaced quantiles of the weight>0
    values (density), half uniformly over [min, max] (range coverage).

    Deterministic, and when there are fewer distinct live values than
    half the clusters every value gets (at least) one quantile center,
    so the fit is exact — the reference's random-sample init
    (gaussian_model.py:38) can leave live values orphaned whenever
    alive << capacity.  The uniform half bounds the error of sparse
    TAILS: density-proportional centers starve values in low-density
    ranges (e.g. a handful of quaternions with strongly negative re
    among tens of thousands of positives), and one badly-quantised
    rotation on a large splat smears a whole image region; uniform
    centers cap the assignment gap at (max-min)/num_clusters·2 and
    Lloyd still refines them (empty ones keep their position, dense
    ones behave like quantile centers)."""
    order = jnp.argsort(jnp.where(weights > 0, flat, jnp.inf))
    n_alive = jnp.maximum((weights > 0).sum(), 1)
    nq = num_clusters // 2
    pos = (jnp.arange(nq, dtype=jnp.float32) + 0.5) / nq
    idx = jnp.clip((pos * n_alive.astype(jnp.float32)).astype(jnp.int32),
                   0, n_alive - 1)
    qcenters = flat[order[idx]]
    vmin = flat[order[0]]
    vmax = flat[order[n_alive - 1]]
    nu = num_clusters - nq
    t = (jnp.arange(nu, dtype=jnp.float32) + 0.5) / nu
    ucenters = vmin + t * (vmax - vmin)
    return jnp.concatenate([qcenters, ucenters])


def generate_codebook(values, key, inverse_activation_fn=lambda x: x,
                      num_clusters=256, tol=1e-4, weights=None):
    """generate_codebook (gaussian_model.py:36-45): quantile init (see
    _quantile_init; deterministic divergence from the reference's
    random sampling), fit, store inverse-activated centers +
    uint8-able ids.  `key` is kept for API compatibility."""
    del key
    shape = values.shape
    flat = values.reshape(-1)
    w = jnp.ones_like(flat) if weights is None else weights.reshape(-1)
    ids, centers = kmeans_1d(flat, _quantile_init(flat, w, num_clusters),
                             tol, num_clusters=num_clusters, weights=w)
    return Codebook(
        ids=ids.astype(jnp.uint8).reshape(shape),
        centers=inverse_activation_fn(centers).reshape(-1, 1),
    )


def produce_clusters(pool, key, num_clusters=256, max_sh_degree=3):
    """GaussianModel.produce_clusters (gaussian_model.py:762-783): the 20
    codebooks of the paper — features_dc, features_rest_0..14, opacity
    (inverse-sigmoid space), scaling (log space), rotation re/im.

    Only alive rows feed the codebooks: dead slots get weight 0 in the
    Lloyd updates (shapes stay static; ids for dead rows are computed
    but never saved).  Activated values that saturate in f32 (sigmoid
    -> 1.0 for logits > ~17) are clamped before the inverse activation
    so stored centers stay finite.
    """
    alive = pool.alive

    def wts(x):
        return jnp.broadcast_to(
            alive.reshape((-1,) + (1,) * (x.ndim - 1)), x.shape
        ).astype(jnp.float32)

    keys = jax.random.split(key, 20)
    max_coeffs = (max_sh_degree + 1) ** 2 - 1
    cb = {}
    f_dc = pool.params.features_dc[:, 0]
    cb["features_dc"] = generate_codebook(
        f_dc, keys[0], tol=1e-3, num_clusters=num_clusters,
        weights=wts(f_dc),
    )
    for i in range(max_coeffs):
        f_i = pool.params.features_rest[:, i]
        cb[f"features_rest_{i}"] = generate_codebook(
            f_i, keys[1 + i], num_clusters=num_clusters, weights=wts(f_i),
        )
    eps = 1e-6
    inv_sigmoid = lambda y: jnp.log(y / (1.0 - y))
    op = jnp.clip(jax.nn.sigmoid(pool.params.opacity), eps, 1.0 - eps)
    cb["opacity"] = generate_codebook(
        op, keys[16], inverse_activation_fn=inv_sigmoid,
        num_clusters=num_clusters, weights=wts(op),
    )
    # clamp like opacity: a diverged scaling logit >= ~88.7 overflows
    # exp in f32 and would store a non-finite center
    sc = jnp.minimum(jnp.exp(pool.params.scaling), jnp.float32(1e30))
    cb["scaling"] = generate_codebook(
        sc, keys[17], inverse_activation_fn=lambda y: jnp.log(
            jnp.maximum(y, 1e-30)),
        num_clusters=num_clusters, weights=wts(sc),
    )
    rot = pool.params.rotation
    rot = rot / jnp.maximum(jnp.linalg.norm(rot, axis=-1, keepdims=True),
                            1e-12)
    cb["rotation_re"] = generate_codebook(rot[:, 0:1], keys[18],
                                          num_clusters=num_clusters,
                                          weights=wts(rot[:, 0:1]))
    cb["rotation_im"] = generate_codebook(rot[:, 1:], keys[19],
                                          num_clusters=num_clusters,
                                          weights=wts(rot[:, 1:]))
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
