"""Update-ordering / store_grads semantics across densify surgery.

The reference applies optimizer.step() AFTER densify/prune rearranged
the pending .grad tensors (train.py:116-155).  Without --store_grads the
surgery rebuilds every param as a fresh nn.Parameter with .grad None, so
torch's step() is a no-op on densify/mercy/dead-prune iterations; with
--store_grads the gradients ride through the surgery (pruned rows
dropped, new rows zero, gaussian_model.py:502-598) and the step applies
to the post-surgery pool.  These tests pin that behavior onto Trainer.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from reduced3dgs_tpu.config import OptimizationParams
from reduced3dgs_tpu.models import gaussians as G
from reduced3dgs_tpu.train.trainer import Trainer

from tests.test_training import BUDGET, target_scene


def make_trainer(store_grads, **cfg_kw):
    cams = target_scene()
    rng = np.random.default_rng(7)
    n0 = 32
    pts = rng.uniform(-0.9, 0.9, (n0, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 0.8, (n0, 3)).astype(np.float32)
    pool = G.create_from_pcd(pts, cols, capacity=256)
    kw = dict(
        iterations=30,
        densify_from_iter=2,
        densification_interval=5,
        opacity_reset_interval=10_000,
        densify_grad_threshold=1e-7,  # force densification
        percent_dense=10.0,  # scale test passes -> clones, not splits
        store_grads=store_grads,
    )
    kw.update(cfg_kw)
    cfg = dataclasses.replace(OptimizationParams(), **kw)
    tr = Trainer(pool, cfg, cams, spatial_lr_scale=3.0,
                 background=jnp.zeros(3), backend="xla",
                 initial_budget=BUDGET, seed=1)
    tr.extent = 3.0
    return tr


def steps_of(tr):
    return [int(x) for x in jax.tree.leaves(tr.state.opt.step)]


def test_no_store_grads_skips_step_on_densify_iteration():
    tr = make_trainer(store_grads=False)
    for it in range(1, 5):  # its 1..4: plain steps
        tr.step(it)
    assert steps_of(tr) == [4] * 6
    alive_before = np.asarray(tr.state.pool.alive).copy()
    xyz_before = np.asarray(tr.state.pool.params.xyz).copy()
    tr.step(5)  # densify iteration: surgery, but NO Adam step
    assert steps_of(tr) == [4] * 6  # per-leaf counts unchanged (torch
    # sees fresh Parameters with .grad None)
    pool = tr.state.pool
    # surgery happened (clones appeared), but rows untouched by the
    # surgery kept their exact params (no optimizer update applied)
    assert int(pool.num_alive) > alive_before.sum()
    # clone surgery copies rows but never rewrites the sources, and no
    # Adam update ran: every pre-existing row is bit-identical
    np.testing.assert_array_equal(
        np.asarray(pool.params.xyz)[alive_before], xyz_before[alive_before])


def test_store_grads_applies_step_after_surgery():
    tr = make_trainer(store_grads=True)
    for it in range(1, 5):
        tr.step(it)
    assert steps_of(tr) == [4] * 6
    alive_before = np.asarray(tr.state.pool.alive).copy()
    tr.step(5)  # densify iteration: surgery THEN deferred Adam step
    assert steps_of(tr) == [5] * 6  # the step ran (post-surgery)
    pool = tr.state.pool
    assert int(pool.num_alive) > alive_before.sum()
    # cloned rows were inserted with zero pending grads + zero moments:
    # Adam with g=0, m=0, v=0 leaves them exactly at the source value.
    # Find a new row and check it equals some pre-existing row's
    # post-insert value family (finite, alive).
    new_rows = np.asarray(pool.alive) & ~alive_before
    assert new_rows.any()
    assert np.isfinite(np.asarray(pool.params.xyz)[new_rows]).all()


def test_final_iteration_never_steps():
    tr = make_trainer(store_grads=False, iterations=3,
                      densify_from_iter=100)
    tr.step(1)
    tr.step(2)
    assert steps_of(tr) == [2] * 6
    xyz_before = np.asarray(tr.state.pool.params.xyz).copy()
    tr.step(3)  # == cfg.iterations: reference skips optimizer.step
    assert steps_of(tr) == [2] * 6
    np.testing.assert_array_equal(
        np.asarray(tr.state.pool.params.xyz), xyz_before)


def test_white_bg_reset_steps_all_but_opacity():
    tr = make_trainer(store_grads=False, iterations=30,
                      densify_from_iter=3, densification_interval=1000)
    tr.white_background = True
    tr.step(1)
    tr.step(2)
    assert steps_of(tr) == [2] * 6
    tr.step(3)  # white-bg opacity reset at densify_from_iter
    # (reference train.py:141-142): opacity param replaced -> .grad
    # None -> torch steps every OTHER param
    steps = dict(zip(tr.state.opt.step._fields, steps_of(tr)))
    assert steps["opacity"] == 2
    assert all(v == 3 for k, v in steps.items() if k != "opacity")
    # and the reset actually clamped opacity
    pool = tr.state.pool
    alive = np.asarray(pool.alive)
    op = np.asarray(pool.get_opacity())[alive]
    assert (op <= 0.0100001).all()
