"""Pool densification mechanics: clone/split/prune/mercy on the masked pool."""

import jax
import jax.numpy as jnp
import numpy as np

from reduced3dgs_tpu.models import gaussians as G
from reduced3dgs_tpu.train import adam, densify


def make_pool(n=64, cap=256, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(0, 1, (n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return G.create_from_pcd(pts, cols, capacity=cap)


def test_clone_allocates_free_slots():
    pool = make_pool()
    opt = adam.init(pool.params)
    grads = jnp.where(jnp.arange(pool.capacity) < 10, 1.0, 0.0)
    new_pool, _, _, n, dropped = densify.densify_and_clone(
        pool, opt, grads, 0.5, percent_dense=0.01, extent=1e6
    )
    assert int(n) == 10 and int(dropped) == 0
    assert int(new_pool.num_alive) == int(pool.num_alive) + 10
    # clones replicate source params
    src = np.asarray(pool.params.xyz[:10])
    dst = np.asarray(new_pool.params.xyz[64:74])
    np.testing.assert_allclose(np.sort(dst, 0), np.sort(src, 0), atol=1e-6)


def test_split_replaces_source_and_shrinks_scale():
    pool = make_pool()
    opt = adam.init(pool.params)
    grads = jnp.where(jnp.arange(pool.capacity) < 5, 1.0, 0.0)
    key = jax.random.PRNGKey(0)
    new_pool, _, _, n, dropped = densify.densify_and_split(
        pool, opt, key, grads, 0.5, percent_dense=0.0, extent=0.0
    )
    assert int(n) == 5 and int(dropped) == 0
    assert int(new_pool.num_alive) == int(pool.num_alive) + 5  # +2 -1 each
    # children scales = source / 1.6
    old = np.exp(np.asarray(pool.params.scaling[:5]))
    new = np.exp(np.asarray(new_pool.params.scaling[:5]))
    np.testing.assert_allclose(new, old / 1.6, rtol=1e-5)


def test_prune_and_reuse_zeroes_adam_state():
    pool = make_pool()
    opt = adam.init(pool.params)
    opt = opt._replace(mu=jax.tree.map(lambda x: x + 1.0, opt.mu))
    mask = jnp.arange(pool.capacity) < 32
    pool2, opt, _ = densify.prune_points(pool, opt, mask & pool.alive)
    assert int(pool2.num_alive) == 32
    # reuse the freed slots via clone: fresh rows must have zero Adam state
    grads = jnp.where((jnp.arange(pool.capacity) >= 32)
                      & (jnp.arange(pool.capacity) < 42), 1.0, 0.0)
    pool3, opt3, _, n, _ = densify.densify_and_clone(
        pool2, opt, grads, 0.5, percent_dense=0.01, extent=1e6
    )
    assert int(n) == 10
    reused = np.asarray(opt3.mu.xyz[:10])  # slots 0..9 were freed first
    np.testing.assert_array_equal(reused, 0.0)


def test_capacity_overflow_drops_and_reports():
    pool = make_pool(n=64, cap=64)  # full pool
    opt = adam.init(pool.params)
    grads = jnp.ones(64)
    _, _, _, n, dropped = densify.densify_and_clone(
        pool, opt, grads, 0.5, percent_dense=0.01, extent=1e6
    )
    assert int(n) == 0 and int(dropped) == 64


def test_mercy_redundancy_opacity():
    pool = make_pool(n=64, cap=128)
    rng = np.random.default_rng(9)
    pool = pool._replace(params=pool.params._replace(
        opacity=jnp.asarray(rng.normal(0, 1, (128, 1)).astype(np.float32))
    ))
    opt = adam.init(pool.params)
    counts = jnp.where(jnp.arange(128) < 20, 50, 1)  # 20 hot primitives
    key = jax.random.PRNGKey(1)
    new_pool, _, stats = densify.mercy_points(
        pool, opt, key, counts, lambda_mercy=1.0, mercy_minimum=2,
        mercy_type="redundancy_opacity",
    )
    # strictly-below-lower-median opacity of the 20 redundant points
    # pruned (torch.median takes the lower middle element -> 9 of 20)
    assert int(stats["n_points_mercied"]) == 9
    assert int(new_pool.num_alive) == 55


def test_masked_quantile_matches_torch_semantics():
    import torch

    rng = np.random.default_rng(3)
    v = rng.normal(0, 1, 97).astype(np.float32)
    mask = rng.uniform(size=97) < 0.7
    for q in [0.03, 0.045, 0.5, 0.9]:
        got = float(densify.masked_quantile(jnp.asarray(v), jnp.asarray(mask), q))
        want = float(torch.quantile(torch.tensor(v[mask]), q))
        assert abs(got - want) < 1e-5, (q, got, want)
    got = float(densify.masked_median(jnp.asarray(v), jnp.asarray(mask)))
    want = float(torch.median(torch.tensor(v[mask])))
    assert abs(got - want) < 1e-6


def test_mercy_step_traced_args():
    """mercy thresholds through the trainer's jitted mercy_step, where
    lambda_mercy/mercy_minimum arrive as traced scalars (the path the
    CLI exercises; regression for a ConcretizationTypeError)."""
    from reduced3dgs_tpu.train.trainer import TrainState, mercy_step

    pool = make_pool()
    opt = adam.init(pool.params)
    st = TrainState(pool, opt, jax.random.PRNGKey(0))
    counts = jnp.arange(pool.capacity, dtype=jnp.float32)
    st2, stats = mercy_step(st, counts, lambda_mercy=1.0, mercy_minimum=3,
                            mercy_type="redundancy_opacity_opacity")
    assert int(st2.pool.num_alive) <= int(pool.num_alive)
    assert "n_points_mercied" in stats


def test_masked_quantile_boundary_cases():
    """n==1, n==2 (hi clamp), q==1.0, and the all-masked case — mercy
    thresholds hang off these (VERDICT round 3 weak #8)."""
    import torch

    v = np.array([5.0, 2.0, 9.0, 7.0], np.float32)

    # single survivor: every quantile is that value
    mask1 = np.array([False, True, False, False])
    for q in (0.0, 0.37, 0.5, 1.0):
        got = float(densify.masked_quantile(
            jnp.asarray(v), jnp.asarray(mask1), q))
        assert got == 2.0, (q, got)
    assert float(densify.masked_median(
        jnp.asarray(v), jnp.asarray(mask1))) == 2.0

    # two survivors incl. q=1.0 (the hi_ok clamp path: hi == n)
    mask2 = np.array([True, False, False, True])
    for q in (0.0, 0.25, 0.9, 1.0):
        got = float(densify.masked_quantile(
            jnp.asarray(v), jnp.asarray(mask2), q))
        want = float(torch.quantile(torch.tensor(v[mask2]), q))
        assert abs(got - want) < 1e-6, (q, got, want)
    got = float(densify.masked_median(jnp.asarray(v), jnp.asarray(mask2)))
    want = float(torch.median(torch.tensor(v[mask2])))
    assert abs(got - want) < 1e-6  # lower middle element

    # all masked out: a non-finite sentinel, never a silently-valid
    # threshold (torch.quantile of an empty tensor raises; callers here
    # only reach this with an empty pool, where any threshold is moot)
    mask0 = np.zeros(4, bool)
    got = float(densify.masked_quantile(
        jnp.asarray(v), jnp.asarray(mask0), 0.5))
    assert not np.isfinite(got)
