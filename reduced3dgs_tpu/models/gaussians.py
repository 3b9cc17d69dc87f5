"""Gaussian primitive pool — the TPU-native GaussianModel.

The reference GaussianModel (scene/gaussian_model.py:47) stores parameters
in dynamically-sized torch tensors and resizes them (plus Adam state) on
every densify/prune.  XLA wants static shapes, so here the model is a
**fixed-capacity pool with an alive mask**: the arrays have `capacity`
rows, `alive` marks the used slots, densification writes into free slots
and pruning clears mask bits.  The pool is a pytree (NamedTuples of jnp
arrays), so the whole train state jits, shards and checkpoints cleanly.

Capacity growth happens host-side in discrete power-of-two buckets
(`grow()`), giving a handful of recompiles per run instead of one per
densify step.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from reduced3dgs_tpu.ops import sh as sh_ops


class GaussianParams(NamedTuple):
    """Differentiable leaves (raw / pre-activation, like the reference's
    nn.Parameters: log scales, raw quaternion, pre-sigmoid opacity)."""

    xyz: jnp.ndarray  # (C, 3)
    features_dc: jnp.ndarray  # (C, 1, 3)
    features_rest: jnp.ndarray  # (C, 15, 3)
    scaling: jnp.ndarray  # (C, 3) log-scale
    rotation: jnp.ndarray  # (C, 4) unnormalized quaternion
    opacity: jnp.ndarray  # (C, 1) pre-sigmoid


class GaussianPool(NamedTuple):
    params: GaussianParams
    degrees: jnp.ndarray  # (C,) int32 per-primitive SH degree
    alive: jnp.ndarray  # (C,) bool
    max_radii2d: jnp.ndarray  # (C,) float32
    xyz_grad_accum: jnp.ndarray  # (C,) float32 sum ||dL/dmean2d_ndc||
    denom: jnp.ndarray  # (C,) float32 visibility counts
    active_sh_degree: jnp.ndarray  # () int32

    @property
    def capacity(self) -> int:
        return self.params.xyz.shape[0]

    @property
    def num_alive(self) -> jnp.ndarray:
        return self.alive.sum()

    def features(self) -> jnp.ndarray:
        """(C, 16, 3) dense SH coefficients (dc ++ rest)."""
        return jnp.concatenate([self.params.features_dc,
                                self.params.features_rest], axis=1)

    def get_scaling(self):
        return jnp.exp(self.params.scaling)

    def get_rotation(self):
        q = self.params.rotation
        return q / jnp.linalg.norm(q, axis=-1, keepdims=True)

    def get_opacity(self):
        return jax.nn.sigmoid(self.params.opacity)


def round_capacity(n: int, minimum: int = 1024) -> int:
    """Next power-of-two bucket >= n."""
    return max(minimum, 1 << max(0, math.ceil(math.log2(max(n, 1)))))


def empty_pool(capacity: int, max_sh_degree: int = 3) -> GaussianPool:
    del max_sh_degree  # dense (15, 3) rest storage covers degrees 0..3
    z = lambda *s: jnp.zeros(s, jnp.float32)
    params = GaussianParams(
        xyz=z(capacity, 3),
        features_dc=z(capacity, 1, 3),
        features_rest=z(capacity, 15, 3),
        scaling=z(capacity, 3),
        rotation=jnp.concatenate(
            [jnp.ones((capacity, 1)), jnp.zeros((capacity, 3))], axis=1
        ),
        opacity=z(capacity, 1),
    )
    return GaussianPool(
        params=params,
        degrees=jnp.zeros((capacity,), jnp.int32),
        alive=jnp.zeros((capacity,), bool),
        max_radii2d=z(capacity),
        xyz_grad_accum=z(capacity),
        denom=z(capacity),
        active_sh_degree=jnp.int32(0),
    )


def create_from_pcd(points, colors, capacity: int | None = None) -> GaussianPool:
    """Initialize from a point cloud (reference create_from_pcd,
    gaussian_model.py:177-201): SH-DC from RGB, log(sqrt(mean 3-NN dist^2))
    isotropic scales, identity rotations, opacity 0.1."""
    from reduced3dgs_tpu.ops.knn import mean_knn_dist2

    points = jnp.asarray(points, jnp.float32)
    colors = jnp.asarray(colors, jnp.float32)
    n = points.shape[0]
    capacity = capacity or round_capacity(int(n * 4))
    pool = empty_pool(capacity)

    dist2 = jnp.maximum(mean_knn_dist2(points), 1e-7)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
    opacity = jnp.full((n, 1), float(np.log(0.1 / 0.9)), jnp.float32)

    idx = jnp.arange(n)
    params = pool.params._replace(
        xyz=pool.params.xyz.at[idx].set(points),
        features_dc=pool.params.features_dc.at[idx, 0].set(
            sh_ops.rgb_to_sh(colors)
        ),
        scaling=pool.params.scaling.at[idx].set(scales),
        opacity=pool.params.opacity.at[idx].set(opacity),
    )
    return pool._replace(
        params=params, alive=pool.alive.at[idx].set(True)
    )


def grow(pool: GaussianPool, new_capacity: int) -> GaussianPool:
    """Host-side capacity growth: pad every per-primitive array."""
    old = pool.capacity
    if new_capacity <= old:
        return pool
    pad = new_capacity - old

    def pad_leaf(x):
        if x.ndim == 0 or x.shape[0] != old:
            return x
        return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])

    grown = jax.tree.map(pad_leaf, pool)
    # keep padded rotations at identity so quat normalization stays finite
    rot = grown.params.rotation.at[old:, 0].set(1.0)
    return grown._replace(params=grown.params._replace(rotation=rot))


def one_up_sh_degree(pool: GaussianPool, max_sh_degree: int = 3) -> GaussianPool:
    """oneupSHdegree (gaussian_model.py:172-175): bump active degree and
    every primitive's own degree."""
    can = pool.active_sh_degree < max_sh_degree
    bump = jnp.where(can, 1, 0)
    return pool._replace(
        active_sh_degree=pool.active_sh_degree + bump,
        degrees=jnp.where(pool.alive, pool.degrees + bump, pool.degrees),
    )


def reset_opacity(pool: GaussianPool) -> GaussianPool:
    """Clamp opacity to <= 0.01 in activation space (gaussian_model.py:313-316).
    The caller must also zero the opacity Adam state (replace_tensor
    semantics)."""
    op = jnp.minimum(pool.get_opacity(), 0.01)
    raw = jnp.log(op / (1.0 - op))
    return pool._replace(
        params=pool.params._replace(
            opacity=jnp.where(pool.alive[:, None], raw, pool.params.opacity)
        )
    )
