"""Multi-device (virtual 8-CPU mesh) sharded training step vs single-chip.

Validates the SURVEY section 2.3 sharding design: DP over cameras x
tile-strip/primitive sharding, parameters replicated, one psum for
gradients.  The sharded step with one camera must match the single-chip
train_step numerically.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reduced3dgs_tpu.config import OptimizationParams
from reduced3dgs_tpu.models import gaussians as G
from reduced3dgs_tpu.parallel.sharded import (
    make_mesh, sharded_train_step, stack_camera_params,
)
from reduced3dgs_tpu.train import adam
from reduced3dgs_tpu.train.trainer import TrainState, train_step

from test_training import target_scene, W, H, BUDGET


def make_state(seed=3, cap=256):
    rng = np.random.default_rng(seed)
    pool = G.create_from_pcd(
        rng.uniform(-0.9, 0.9, (40, 3)).astype(np.float32),
        rng.uniform(0.2, 0.8, (40, 3)).astype(np.float32), capacity=cap,
    )
    return TrainState(pool, adam.init(pool.params), jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def cams():
    return target_scene(seed=7)


def test_sharded_matches_single_chip(cams):
    assert len(jax.devices()) >= 8
    cfg = OptimizationParams()
    state = make_state()
    cam = cams[0]
    gt = jnp.asarray(cam.image)[None]

    mesh = make_mesh(1, 4)
    st_sh, m_sh = sharded_train_step(
        state, stack_camera_params([cam]), gt, jnp.zeros(3), jnp.int32(1),
        mesh=mesh, width=W, height=H, budget=BUDGET, opt_cfg=cfg,
        spatial_lr_scale=3.0,
    )

    st_1, m_1 = train_step(
        state, cam.params(), jnp.asarray(cam.image), jnp.zeros(3),
        jnp.int32(1), width=W, height=H, budget=BUDGET, backend="pallas",
        opt_cfg=cfg, spatial_lr_scale=3.0,
    )

    np.testing.assert_allclose(float(m_sh["loss"]), float(m_1["loss"]),
                               rtol=1e-5)
    for name in ("xyz", "scaling", "opacity", "features_dc"):
        a = np.asarray(getattr(st_sh.pool.params, name))
        b = np.asarray(getattr(st_1.pool.params, name))
        np.testing.assert_allclose(a, b, atol=5e-6, rtol=1e-4,
                                   err_msg=f"param mismatch: {name}")
    np.testing.assert_allclose(
        np.asarray(st_sh.pool.xyz_grad_accum),
        np.asarray(st_1.pool.xyz_grad_accum), atol=1e-5, rtol=1e-3)


def test_sharded_data_parallel_batch(cams):
    cfg = OptimizationParams()
    state = make_state()
    mesh = make_mesh(2, 2)
    gts = jnp.stack([jnp.asarray(c.image) for c in cams[:2]])
    st, m = sharded_train_step(
        state, stack_camera_params(cams[:2]), gts, jnp.zeros(3),
        jnp.int32(1), mesh=mesh, width=W, height=H, budget=BUDGET,
        opt_cfg=cfg, spatial_lr_scale=3.0,
    )
    assert np.isfinite(float(m["loss"]))
    # parameters moved
    assert float(jnp.abs(st.pool.params.xyz - state.pool.params.xyz).max()) > 0
    # denom counts both cameras where visible in both
    assert float(st.pool.denom.max()) <= 2.0


def test_sharded_overflow_contract(cams):
    """num_rendered_max reports the true max strip demand; the regrow
    wrapper redoes the step with a grown budget and then matches a
    directly-big-budget run (single-chip contract, trainer.py)."""
    from reduced3dgs_tpu.parallel.sharded import run_sharded_step_with_regrow

    cfg = OptimizationParams()
    state = make_state()
    cam = cams[0]
    gt = jnp.asarray(cam.image)[None]
    mesh = make_mesh(1, 2)
    cp = stack_camera_params([cam])

    # tiny budget: truncated but finite, true demand reported
    st_small, m_small = sharded_train_step(
        state, cp, gt, jnp.zeros(3), jnp.int32(1), mesh=mesh,
        width=W, height=H, budget=128, opt_cfg=cfg, spatial_lr_scale=3.0)
    needed = int(m_small["num_rendered_max"])
    assert needed > 128
    assert np.isfinite(float(m_small["loss"]))

    st_grown, m_grown, budget = run_sharded_step_with_regrow(
        state, cp, gt, jnp.zeros(3), jnp.int32(1), mesh=mesh,
        width=W, height=H, budget=128, opt_cfg=cfg, spatial_lr_scale=3.0)
    assert budget >= needed
    st_big, m_big = sharded_train_step(
        state, cp, gt, jnp.zeros(3), jnp.int32(1), mesh=mesh,
        width=W, height=H, budget=budget, opt_cfg=cfg,
        spatial_lr_scale=3.0)
    np.testing.assert_allclose(float(m_grown["loss"]), float(m_big["loss"]),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(st_grown.pool.params.xyz),
                                  np.asarray(st_big.pool.params.xyz))


def test_param_sharded_matches_single_chip(cams):
    """param_shard=True: params + Adam state row-sharded over "tile",
    gradients arrive via the all_gather-transpose reduce-scatter.  Must
    match the single-chip step numerically AND keep the sharded layout."""
    from reduced3dgs_tpu.parallel.sharded import shard_state

    cfg = OptimizationParams(lambda_alpha_regul=0.001,
                             lambda_sh_sparsity=0.1)
    state = make_state()
    cam = cams[0]
    gt = jnp.asarray(cam.image)[None]
    mesh = make_mesh(1, 4)
    st_in = shard_state(state, mesh, param_shard=True)
    st_sh, m_sh = sharded_train_step(
        st_in, stack_camera_params([cam]), gt, jnp.zeros(3), jnp.int32(1),
        mesh=mesh, width=W, height=H, budget=BUDGET, opt_cfg=cfg,
        spatial_lr_scale=3.0, param_shard=True,
    )
    st_1, m_1 = train_step(
        state, cam.params(), jnp.asarray(cam.image), jnp.zeros(3),
        jnp.int32(1), width=W, height=H, budget=BUDGET, backend="pallas",
        opt_cfg=cfg, spatial_lr_scale=3.0,
    )
    np.testing.assert_allclose(float(m_sh["loss"]), float(m_1["loss"]),
                               rtol=1e-5)
    for name in ("xyz", "scaling", "opacity", "features_dc",
                 "features_rest", "rotation"):
        a = np.asarray(getattr(st_sh.pool.params, name))
        b = np.asarray(getattr(st_1.pool.params, name))
        np.testing.assert_allclose(a, b, atol=5e-6, rtol=1e-4,
                                   err_msg=f"param mismatch: {name}")
    np.testing.assert_allclose(
        np.asarray(st_sh.pool.xyz_grad_accum),
        np.asarray(st_1.pool.xyz_grad_accum), atol=1e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(st_sh.pool.denom),
                               np.asarray(st_1.pool.denom))
    # the optimizer state stayed sharded (no silent full replication)
    spec = st_sh.opt.mu.xyz.sharding.spec
    assert "tile" in tuple(spec), spec


def test_sharded_trainer_surgery_parity(cams):
    """A ShardedTrainer run crossing densify + opacity-reset + mercy
    events matches the single-chip Trainer's trace (VERDICT round 3
    item 5: surgery was never exercised under the mesh)."""
    from reduced3dgs_tpu.parallel.sharded import ShardedTrainer
    from reduced3dgs_tpu.scene import Scene
    from reduced3dgs_tpu.train.trainer import Trainer

    class MiniScene:
        def __init__(self, cams_):
            self._cams = cams_
            self.pool = None

        def get_train_cameras(self, scale=1.0):
            return self._cams

        calculate_redundancy_metric = Scene.calculate_redundancy_metric

    cfg = OptimizationParams(
        densify_from_iter=1, densification_interval=4,
        densify_until_iter=14, opacity_reset_interval=8,
        # iterations stays large: fine_tune_start = iterations - 3000
        # must exceed the mercy iteration (trainer.py fine-tune phase)
        mercy_points=True, mercy_interval=3, iterations=5000,
        densify_grad_threshold=1e-5,  # tiny scene: make clones happen
    )

    def build(cls, **kw):
        rng = np.random.default_rng(5)
        pool = G.create_from_pcd(
            rng.uniform(-0.9, 0.9, (40, 3)).astype(np.float32),
            rng.uniform(0.2, 0.8, (40, 3)).astype(np.float32),
            capacity=256)
        t = cls(pool, cfg, cams, spatial_lr_scale=3.0,
                background=np.zeros(3), backend="pallas", seed=0,
                initial_budget=BUDGET, scene=MiniScene(cams), **kw)
        t.extent = 3.0
        return t

    t1 = build(Trainer)
    mesh = make_mesh(1, 4)
    t2 = build(ShardedTrainer, mesh=mesh, param_shard=True)

    events_seen = set()
    for it in range(1, 15):
        m1 = t1.step(it)
        m2 = t2.step(it)
        ev = t1._events(it)
        if ev[0]:
            events_seen.add("densify")
        if ev[1]:
            events_seen.add("reset")
        if ev[3]:
            events_seen.add("mercy")
        np.testing.assert_allclose(
            float(m2["loss"]), float(m1["loss"]), rtol=2e-4,
            err_msg=f"loss diverged at iteration {it}")
    assert {"densify", "reset", "mercy"} <= events_seen, events_seen
    assert np.array_equal(np.asarray(t1.state.pool.alive),
                          np.asarray(t2.state.pool.alive))
    for name in ("xyz", "scaling", "opacity", "features_dc"):
        a = np.asarray(getattr(t2.state.pool.params, name))
        b = np.asarray(getattr(t1.state.pool.params, name))
        alive = np.asarray(t1.state.pool.alive)
        np.testing.assert_allclose(a[alive], b[alive], atol=2e-4,
                                   rtol=1e-3,
                                   err_msg=f"param mismatch: {name}")


def test_scaling_bench_runs():
    """The scaling harness runs on the virtual mesh and reports sane
    efficiency numbers."""
    from reduced3dgs_tpu.parallel.launch import scaling_bench

    res = scaling_bench(widths=(64,), n_prims=256, budget=4096, iters=2,
                        mesh_shapes=[(1, 1), (2, 2)])
    assert len(res) == 2
    for (_, pps) in res:
        assert pps > 0


def test_raw_gradients_pinned_both_layouts(cams):
    """Pin the RAW per-parameter gradients of both mesh layouts against
    the single-chip step (VERDICT r4 weak #4).

    sharded.py relies on two hand-managed invariants under
    check_vma=False: the cross-device psum is applied OUTSIDE the
    differentiated function (differentiating through psum with
    check_vma=False takes the legacy psum-transpose, inflating
    replicated-input cotangents by the mesh size), and the regularizer
    rows enter exactly once (gate_rows).  Full-step parity dilutes an
    inflation through the lr/Adam normalization; this test compares the
    skip_update=True gradients leaf-by-leaf at tight tolerance so an
    x-mesh-size inflation or a double-counted regularizer fails loudly.
    """
    from reduced3dgs_tpu.parallel.sharded import shard_state

    cfg = OptimizationParams(lambda_alpha_regul=0.001,
                             lambda_sh_sparsity=0.1)
    state = make_state()
    cam = cams[0]
    gt = jnp.asarray(cam.image)[None]

    _, _, g_ref = train_step(
        state, cam.params(), jnp.asarray(cam.image), jnp.zeros(3),
        jnp.int32(1), width=W, height=H, budget=BUDGET, backend="pallas",
        opt_cfg=cfg, spatial_lr_scale=3.0, skip_update=True,
    )

    for param_shard in (False, True):
        mesh = make_mesh(1, 4)
        st_in = (shard_state(state, mesh, param_shard=True)
                 if param_shard else state)
        _, _, g_sh = sharded_train_step(
            st_in, stack_camera_params([cam]), gt, jnp.zeros(3),
            jnp.int32(1), mesh=mesh, width=W, height=H, budget=BUDGET,
            opt_cfg=cfg, spatial_lr_scale=3.0, param_shard=param_shard,
            skip_update=True,
        )
        for name in g_ref._fields:
            a = np.asarray(getattr(g_ref, name))
            b = np.asarray(getattr(g_sh, name))
            scale = max(np.abs(a).max(), 1e-12)
            np.testing.assert_allclose(
                b, a, atol=2e-6 + 1e-4 * scale, rtol=0,
                err_msg=f"grad mismatch ({name}, "
                        f"param_shard={param_shard})")
