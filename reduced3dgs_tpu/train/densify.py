"""Densification / pruning / mercy culling on the fixed-capacity pool.

Reimplements the reference's tensor-resizing operations
(gaussian_model.py:502-691 densify/clone/split/prune + optimizer-state
surgery, :524-551 mercy_points) as pure, jittable masked-pool updates:
cloning/splitting scatters into free slots, pruning clears alive bits,
and the Adam "surgery" is zeroing (mu, nu) rows at the touched slots —
semantically identical to the reference's cat/slice of exp_avg tensors.

All functions return (pool, adam_state, stats) with static shapes; slot
exhaustion drops the lowest-priority allocations and reports the drop
count so the host can grow the pool bucket.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from reduced3dgs_tpu.models.gaussians import GaussianPool
from reduced3dgs_tpu.ops.transforms import quat_to_rotmat
from reduced3dgs_tpu.train.adam import AdamState


# ---------------------------------------------------------------------------
# masked-statistics helpers (torch.quantile / median semantics)
# ---------------------------------------------------------------------------

def masked_quantile(values, mask, q):
    """torch.quantile (linear interpolation) over the masked subset."""
    big = jnp.where(mask, values, jnp.inf)
    s = jnp.sort(big)
    n = mask.sum()
    pos = q * (n.astype(jnp.float32) - 1.0)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, values.shape[0] - 1)
    hi = jnp.clip(lo + 1, 0, values.shape[0] - 1)
    frac = pos - lo.astype(jnp.float32)
    hi_ok = hi < n
    upper = jnp.where(hi_ok, s[hi], s[jnp.maximum(n - 1, 0)])
    return s[lo] * (1.0 - frac) + upper * frac


def masked_median(values, mask):
    """torch.median: the lower of the two middle elements."""
    big = jnp.where(mask, values, jnp.inf)
    s = jnp.sort(big)
    n = mask.sum()
    return s[jnp.maximum((n - 1) // 2, 0)]


# ---------------------------------------------------------------------------
# slot allocation + scatter
# ---------------------------------------------------------------------------

def _allocate(alive, want):
    """Assign one distinct free slot per wanted source row.

    Returns (dst (C,), ok (C,), n_dropped): ok marks sources that got a
    slot; drops happen when free slots run out.
    """
    c = alive.shape[0]
    free_first = jnp.argsort(alive)  # stable: free slots first, by index
    n_free = c - alive.sum()
    rank = jnp.cumsum(want) - 1
    ok = want & (rank < n_free)
    dst = free_first[jnp.clip(rank, 0, c - 1)]
    n_dropped = want.sum() - ok.sum()
    return dst, ok, n_dropped


def _scatter_rows(tree, dst, ok, src_tree):
    """tree[dst[i]] = src_tree[i] where ok[i] (drop otherwise)."""
    c = jax.tree.leaves(tree)[0].shape[0]
    safe = jnp.where(ok, dst, c)

    def put(x, v):
        return x.at[safe].set(v, mode="drop")

    return jax.tree.map(put, tree, src_tree)


def _zero_rows(tree, dst, ok):
    c = jax.tree.leaves(tree)[0].shape[0]
    safe = jnp.where(ok, dst, c)

    def put(x):
        return x.at[safe].set(jnp.zeros_like(x[0]), mode="drop")

    return jax.tree.map(put, tree)


def _insert(pool: GaussianPool, opt: AdamState, want, src_params, src_degrees,
            grads_tree=None):
    """Insert rows built from per-source arrays into free slots.

    Implements cat_tensors_to_optimizer semantics (gaussian_model.py:570-598):
    new rows get zero Adam state and (store_grads) zero pending gradients.
    """
    dst, ok, dropped = _allocate(pool.alive, want)
    params = _scatter_rows(pool.params, dst, ok, src_params)
    degrees = pool.degrees.at[jnp.where(ok, dst, pool.capacity)].set(
        src_degrees, mode="drop"
    )
    alive = pool.alive.at[jnp.where(ok, dst, pool.capacity)].set(
        True, mode="drop"
    )
    opt = opt._replace(mu=_zero_rows(opt.mu, dst, ok),
                       nu=_zero_rows(opt.nu, dst, ok))
    if grads_tree is not None:
        grads_tree = _zero_rows(grads_tree, dst, ok)
    pool = pool._replace(params=params, degrees=degrees, alive=alive)
    return pool, opt, grads_tree, ok.sum(), dropped


# ---------------------------------------------------------------------------
# clone / split / prune (gaussian_model.py:622-691)
# ---------------------------------------------------------------------------

def prune_points(pool: GaussianPool, opt: AdamState, mask):
    """prune_points (gaussian_model.py:553-568): drop masked primitives.
    On the pool this clears alive bits; Adam rows are zeroed on slot
    reuse (_insert), matching the reference's state slicing."""
    alive = pool.alive & ~mask
    return pool._replace(alive=alive), opt, mask.sum()


def densify_and_clone(pool, opt, grads_avg, grad_threshold, percent_dense,
                      extent, grads_tree=None):
    max_scale = pool.get_scaling().max(axis=1)
    sel = (
        pool.alive
        & (grads_avg >= grad_threshold)
        & (max_scale <= percent_dense * extent)
    )
    pool, opt, grads_tree, n, dropped = _insert(
        pool, opt, sel, pool.params, pool.degrees, grads_tree
    )
    return pool, opt, grads_tree, n, dropped


def densify_and_split(pool, opt, key, grads_avg, grad_threshold,
                      percent_dense, extent, n_split=2, grads_tree=None):
    """Split big high-gradient primitives into N=2 children sampled from
    the primitive's own Gaussian, scales / (0.8 N) (gaussian_model.py:622-649).
    Child 1 overwrites the source slot; child 2 goes to a free slot."""
    scales = pool.get_scaling()
    max_scale = scales.max(axis=1)
    sel = (
        pool.alive
        & (grads_avg >= grad_threshold)
        & (max_scale > percent_dense * extent)
    )
    c = pool.capacity
    rot = quat_to_rotmat(pool.get_rotation())  # (C,3,3) normalized like ref
    noise = jax.random.normal(key, (n_split, c, 3)) * scales[None]
    child_xyz = (
        jnp.einsum("cij,ncj->nci", rot, noise) + pool.params.xyz[None]
    )
    child_scaling = jnp.log(scales / (0.8 * n_split))

    def child_params(i):
        return pool.params._replace(
            xyz=child_xyz[i], scaling=child_scaling
        )

    # child 1 replaces the source row in place (fresh Adam + zero grads,
    # matching postfix-then-prune of the reference)
    sel_col = sel[:, None]

    def overwrite(x, v):
        m = sel_col if x.ndim == 2 else sel[:, None, None]
        return jnp.where(m, v, x)

    params = jax.tree.map(overwrite, pool.params, child_params(0))
    pool = pool._replace(params=params)
    idx = jnp.where(sel, jnp.arange(c), c)
    opt = opt._replace(
        mu=_zero_rows(opt.mu, idx, sel), nu=_zero_rows(opt.nu, idx, sel)
    )
    if grads_tree is not None:
        grads_tree = _zero_rows(grads_tree, idx, sel)

    # children 2..N into free slots
    dropped_total = jnp.int32(0)
    for i in range(1, n_split):
        pool, opt, grads_tree, _, dropped = _insert(
            pool, opt, sel, child_params(i), pool.degrees, grads_tree
        )
        dropped_total += dropped
    return pool, opt, grads_tree, sel.sum(), dropped_total


def prune(pool, opt, min_opacity, extent, max_screen_size):
    """Opacity / size pruning (gaussian_model.py:684-691).
    max_screen_size=0 disables the size tests (reference None)."""
    mask = pool.alive & (pool.get_opacity()[:, 0] < min_opacity)
    if max_screen_size:
        big_vs = pool.max_radii2d > max_screen_size
        big_ws = pool.get_scaling().max(axis=1) > 0.1 * extent
        mask = mask | (pool.alive & (big_vs | big_ws))
    return prune_points(pool, opt, mask)


def densify_and_prune(pool, opt, key, max_grad, min_opacity, extent,
                      max_screen_size, percent_dense, grads_tree=None):
    """Full densify step (gaussian_model.py:672-682).  Returns
    (pool, opt, grads_tree, stats dict)."""
    grads_avg = pool.xyz_grad_accum / jnp.maximum(pool.denom, 1e-20)
    grads_avg = jnp.where(
        jnp.isnan(grads_avg) | (pool.denom == 0), 0.0, grads_avg
    )
    pool, opt, grads_tree, n_cloned, d1 = densify_and_clone(
        pool, opt, grads_avg, max_grad, percent_dense, extent, grads_tree
    )
    pool, opt, grads_tree, n_split, d2 = densify_and_split(
        pool, opt, key, grads_avg, max_grad, percent_dense, extent,
        grads_tree=grads_tree,
    )
    pool, opt, n_pruned = prune(pool, opt, min_opacity, extent,
                                max_screen_size)
    # densification_postfix resets the accumulators for everyone
    # (gaussian_model.py:618-621)
    pool = pool._replace(
        xyz_grad_accum=jnp.zeros_like(pool.xyz_grad_accum),
        denom=jnp.zeros_like(pool.denom),
        max_radii2d=jnp.zeros_like(pool.max_radii2d),
    )
    stats = {
        "n_points_cloned": n_cloned,
        "n_points_split": n_split,
        "n_points_pruned": n_pruned,
        "n_dropped_capacity": d1 + d2,
    }
    return pool, opt, grads_tree, stats


# ---------------------------------------------------------------------------
# mercy culling (gaussian_model.py:524-551)
# ---------------------------------------------------------------------------

def mercy_points(pool, opt, key, splat_counts, lambda_mercy=2.0,
                 mercy_minimum=2, mercy_type="redundancy_opacity"):
    """Prune over-represented primitives by redundancy score.

    splat_counts: (C,) the per-primitive minimum redundancy value from
    ops/redundancy.py (reference _splatted_num_accum).
    """
    alive = pool.alive
    counts = splat_counts.astype(jnp.float32)
    n = alive.sum().astype(jnp.float32)
    mean = jnp.where(alive, counts, 0.0).sum() / jnp.maximum(n, 1.0)
    var = jnp.where(alive, (counts - mean) ** 2, 0.0).sum() / jnp.maximum(
        n - 1.0, 1.0
    )
    redundancy_threshold = mean + lambda_mercy * jnp.sqrt(var)
    # mercy_minimum may be a traced scalar (mercy_step jits it non-static)
    threshold = jnp.maximum(redundancy_threshold,
                            jnp.asarray(mercy_minimum, jnp.float32))
    mask = alive & (counts > threshold)
    opacity = pool.get_opacity()[:, 0]
    opacity_threshold = jnp.float32(0.0)  # reference reports 0 for
    # redundancy-only types (gaussian_model.py:551)

    if mercy_type == "redundancy_opacity":
        med = masked_median(opacity, mask)
        mask = mask & (opacity < med)
    elif mercy_type == "redundancy_random":
        mask = mask & (jax.random.uniform(key, mask.shape) < 0.5)
    elif mercy_type == "opacity":
        opacity_threshold = masked_quantile(opacity, alive, 0.045)
        mask = alive & (opacity < opacity_threshold)
    elif mercy_type == "redundancy_opacity_opacity":
        med = masked_median(opacity, mask)
        mask = mask & (opacity < med)
        opacity_threshold = jnp.minimum(
            masked_quantile(opacity, alive, 0.03), 0.05)
        mask = mask | (alive & (opacity < opacity_threshold))
    else:
        raise ValueError(f"unknown mercy_type {mercy_type!r}")

    pool, opt, n_mercied = prune_points(pool, opt, mask)
    return pool, opt, {"n_points_mercied": n_mercied,
                       "redundancy_threshold": redundancy_threshold,
                       "opacity_threshold": opacity_threshold}
