"""Redundancy metric for "mercy" pruning (JAX).

Vectorized replacement for the reference CUDA kernels in
reduced_3dgs/redundancy_score.cu and the driver
Scene.calculate_redundancy_metric (scene/__init__.py:142-174):

  1. minimum projected pixel size over all cameras (transformCentersNDC,
     redundancy_score.cu:45-116),
  2. sphere/ellipsoid intersection counts against 30 nearest neighbours
     (:119-183) — including the reference's quirk of using the *point's
     own* rotation for the neighbour ellipsoid (R[idx], line 147),
  3. scatter of the minimum redundancy value to every intersecting
     neighbour (:6-42) — a segment_min instead of atomicMin.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from reduced3dgs_tpu.ops.transforms import quat_to_rotmat


def min_projected_pixel_size(xyz, projmatrices, inv_projmatrices, heights,
                             widths):
    """(P,) min over cameras of the world-space length of a one-pixel NDC
    offset at each point's depth; 1e4 where never inside any frustum.

    projmatrices: (N, 4, 4) transposed full projection matrices (the
    row-vector convention of Camera.full_proj_transform).
    """
    xyz1 = jnp.concatenate([xyz, jnp.ones_like(xyz[:, :1])], axis=1)  # (P,4)

    def per_cam(proj, inv_proj, h, w):
        p_hom = xyz1 @ proj  # (P,4)
        p_w = 1.0 / (p_hom[:, 3] + 1e-7)
        p_proj = p_hom[:, :3] * p_w[:, None]
        inside = (
            (jnp.abs(p_proj[:, 0]) <= 1.0)
            & (jnp.abs(p_proj[:, 1]) <= 1.0)
            & (p_proj[:, 2] >= 0.0)
            & (p_proj[:, 2] <= 1.0)
        )
        depth = p_proj[:, 2]
        step = jnp.where(w > h, 2.0 / w, 2.0 / h)
        dx = jnp.where(w > h, step, 0.0)
        dy = jnp.where(w > h, 0.0, step)
        p_end = jnp.stack(
            [jnp.full_like(depth, dx), jnp.full_like(depth, dy), depth,
             jnp.ones_like(depth)], axis=1)
        p_start = jnp.stack(
            [jnp.zeros_like(depth), jnp.zeros_like(depth), depth,
             jnp.ones_like(depth)], axis=1)

        def unproject(p):
            o = p @ inv_proj
            return o[:, :3] / (o[:, 3:4] + 1e-7)

        size = jnp.linalg.norm(unproject(p_end) - unproject(p_start), axis=1)
        return jnp.where(inside, size, 1e4)

    sizes = jax.vmap(per_cam)(projmatrices, inv_projmatrices,
                              jnp.asarray(heights), jnp.asarray(widths))
    return sizes.min(axis=0)


def sphere_ellipsoid_intersection(xyz, scales, rotations_norm, neighbours,
                                  sphere_radius):
    """(P,) intersection counts + (P, K) mask (redundancy_score.cu:119-183).

    For point i and neighbour j: sphere(center_i, r_i) vs ellipsoid at
    center_j with semi-axes scales_j + r_i in the frame of R[i] (the
    reference uses the point's own rotation — replicated for parity).
    """
    r = quat_to_rotmat(rotations_norm)  # (P,3,3)
    diff = xyz[:, None, :] - xyz[neighbours]  # (P,K,3)
    aug = scales[neighbours] + sphere_radius[:, None, None]  # (P,K,3)
    # difference * R  (row-vector x matrix == R^T difference)
    local = jnp.einsum("pki,pij->pkj", diff, r)
    q = ((local / aug) ** 2).sum(-1)
    mask = q < 1.0
    return mask.sum(axis=1).astype(jnp.int32), mask


def allocate_min_redundancy(red_values, neighbours, mask, num_points):
    """atomicMin scatter (redundancy_score.cu:6-42) as a segment_min:
    each point receives the min redundancy value among all points whose
    intersection list contains it."""
    p, k = neighbours.shape
    flat_idx = jnp.where(mask, neighbours, num_points).reshape(-1)
    flat_val = jnp.broadcast_to(red_values[:, None], (p, k)).reshape(-1)
    return jax.ops.segment_min(
        flat_val, flat_idx, num_segments=num_points + 1,
        indices_are_sorted=False,
    )[:num_points]


@jax.jit
def _alive_order(alive):
    """(order, n_alive): stable partition with alive rows first."""
    p = alive.shape[0]
    _, order = jax.lax.sort(
        ((~alive).astype(jnp.int32), jnp.arange(p, dtype=jnp.int32)),
        num_keys=1, is_stable=True)
    return order, alive.sum()


@partial(jax.jit, static_argnames=("m",))
def _compact(xyz, scales, rots, order, n_alive, m):
    """First m rows of the alive-first ordering; rows >= n_alive get
    +inf coords (the KNN "absent point" convention, ops/knn.py)."""
    sel = order[:m]
    absent = jnp.arange(m) >= n_alive
    xyz_c = jnp.where(absent[:, None], jnp.inf, xyz[sel])
    return xyz_c, scales[sel], rots[sel], sel, absent


@jax.jit
def _redundancy_core(pts, scales, rotations_norm, absent, neighbours,
                     projmatrices, inv_projmatrices, heights, widths,
                     pixel_scale):
    p = pts.shape[0]
    # absent rows carry inf coords; keep the projection math finite for
    # them (their outputs are masked below)
    safe = jnp.where(absent[:, None], 0.0, pts)
    cube_size = min_projected_pixel_size(
        safe, projmatrices, inv_projmatrices, heights, widths
    )
    half_diag = cube_size * pixel_scale * jnp.sqrt(3.0) / 2.0
    counts, mask = sphere_ellipsoid_intersection(
        safe, scales, rotations_norm, neighbours, half_diag
    )
    # absent rows intersect nothing, scatter nothing, and are never a
    # valid neighbour (KNN only returns them when fewer than k real
    # points exist; their inf distance made the query treat them as
    # placed at `safe`'s origin above, so gate them out explicitly)
    mask = mask & ~absent[:, None] & ~absent[neighbours]
    counts = jnp.where(absent, 0, counts + 1)  # self (scene/__init__.py:168)
    self_idx = jnp.arange(p, dtype=jnp.int32)[:, None]
    neighbours = jnp.concatenate([self_idx, neighbours], axis=1)
    mask = jnp.concatenate([~absent[:, None], mask], axis=1)
    min_red = allocate_min_redundancy(counts, neighbours, mask, p)
    return min_red, cube_size


@partial(jax.jit, static_argnames=("cap",))
def _scatter_back(sel, absent, red_c, cube_c, cap):
    red = jnp.zeros((cap,), jnp.int32).at[sel].set(
        jnp.where(absent, 0, red_c))
    cube = jnp.zeros((cap,), jnp.float32).at[sel].set(
        jnp.where(absent, 0.0, cube_c))
    return red, cube


def redundancy_metric(xyz, scales, rotations_norm, alive, projmatrices,
                      inv_projmatrices, heights, widths, pixel_scale=1.0,
                      num_neighbours=30):
    """Scene.calculate_redundancy_metric (scene/__init__.py:142-174).

    Returns (min_redundancy (P,) int32, cube_size (P,)) over the full
    capacity; dead pool slots report 0.

    A HOST-level function, not one jit, for two reasons:
      * the exact-KNN ladder reruns its jitted search with a growing
        shortlist until the exactness certificate holds (ops/knn.py) — a
        host-side loop that cannot run under a trace (calling it inside
        a jit raised TracerBoolConversionError the first time a pool
        grew past the brute-force limit mid-training; round-4 fix);
      * the KNN runs on a COMPACTED alive-rows-first view (power-of-two
        bucket, +inf "absent" padding): the reference's simple-knn sees
        only the live, compacted tensors, and scattering dead slots to
        a far line both wastes KNN work on them and collapses the
        Morton grid (every real point lands in one cell), defeating the
        certificate into the O(P^2) brute fallback.
    """
    from reduced3dgs_tpu.ops.knn import knn_indices

    cap = xyz.shape[0]
    order, n_alive_dev = _alive_order(alive)
    n_alive = int(n_alive_dev)
    m = max(1 << (max(n_alive - 1, 1)).bit_length(),
            num_neighbours + 1)
    m = min(m, cap)
    xyz_c, scales_c, rots_c, sel, absent = _compact(
        xyz, scales, rotations_norm, order, jnp.int32(n_alive), m)
    neighbours = knn_indices(xyz_c, num_neighbours)
    red_c, cube_c = _redundancy_core(
        xyz_c, scales_c, rots_c, absent, neighbours, projmatrices,
        inv_projmatrices, heights, widths, jnp.float32(pixel_scale))
    return _scatter_back(sel, absent, red_c, cube_c, cap)
