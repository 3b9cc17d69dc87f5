"""Fused multi-step training (lax.scan launch) vs sequential parity.

`Trainer.step_group` must be the same computation as the equivalent
sequence of `Trainer.step` calls: same camera sampling order, same
random backgrounds, same Adam updates, same metrics.  Tolerances are
tight but not bitwise: the scan body and the standalone step are
separately compiled XLA programs, so fusion/reassociation can differ
by ~1 ulp per step, and a 1-ulp wobble in the (integer) binning rect
boundaries shifts instance slots, perturbing reduction rounding.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from reduced3dgs_tpu.config import OptimizationParams
from reduced3dgs_tpu.models import gaussians as G
from reduced3dgs_tpu.train.trainer import Trainer

from test_training import BUDGET, target_scene


def _make_trainer(cams, seed=1, **cfg_over):
    rng = np.random.default_rng(42)
    pts = rng.uniform(-0.9, 0.9, (32, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 0.8, (32, 3)).astype(np.float32)
    pool = G.create_from_pcd(pts, cols, capacity=256)
    base = dict(iterations=60, densify_from_iter=1000,
                opacity_reset_interval=10_000)  # no surgery by default
    base.update(cfg_over)
    cfg = dataclasses.replace(OptimizationParams(), **base)
    tr = Trainer(pool, cfg, cams, spatial_lr_scale=3.0,
                 background=jnp.zeros(3), backend="xla",
                 initial_budget=BUDGET, seed=seed)
    tr.extent = 3.0
    return tr


def test_fused_matches_sequential():
    cams = target_scene()
    tr_seq = _make_trainer(cams)
    tr_fus = _make_trainer(cams)

    seq_metrics = [tr_seq.step(it) for it in range(1, 13)]
    fus_metrics = []
    it = 1
    while it <= 12:
        assert tr_fus.fusible(it)
        ms = tr_fus.step_group(list(range(it, min(it + 5, 13))))
        fus_metrics.extend(ms)
        it += len(ms)

    assert len(fus_metrics) == len(seq_metrics)
    for a, b in zip(seq_metrics, fus_metrics):
        np.testing.assert_allclose(
            float(a["loss"]), float(b["loss"]), rtol=1e-5)
        # rect boundaries are ulp-sensitive across compilations
        assert abs(int(a["num_rendered"]) - int(b["num_rendered"])) <= 2

    for la, lb in zip(jax.tree.leaves(tr_seq.state.pool.params),
                      jax.tree.leaves(tr_fus.state.pool.params)):
        # the two programs compile separately, so fusion/reassociation ulp
        # noise is amplified by 12 Adam steps (rsqrt near zero); allow ~1e-3
        # absolute on near-zero params, tight relative elsewhere
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=5e-4, atol=1e-3)


def test_fused_random_background_and_overflow():
    cams = target_scene()
    tr_seq = _make_trainer(cams, random_background=True)
    tr_fus = _make_trainer(cams, random_background=True)
    # tiny initial budget forces the overflow-regrow-redo contract
    tr_seq.initial_budget = 512
    tr_fus.initial_budget = 512

    for it in range(1, 7):
        tr_seq.step(it)
    ms = tr_fus.step_group([1, 2, 3])
    ms += tr_fus.step_group([4, 5, 6])
    assert len(ms) == 6

    assert tr_seq.budgets == tr_fus.budgets
    for la, lb in zip(jax.tree.leaves(tr_seq.state.pool.params),
                      jax.tree.leaves(tr_fus.state.pool.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-5, atol=1e-5)


def test_fusible_respects_boundaries():
    cams = target_scene()
    tr = _make_trainer(cams, densify_from_iter=5, densification_interval=10,
                       iterations=60)
    assert not tr.fusible(10)  # densify iteration
    assert not tr.fusible(60)  # final iteration never steps
    assert tr.fusible(11)
    # % 1000 SH-degree boundary
    tr2 = _make_trainer(cams, iterations=2000, densify_from_iter=5000)
    assert not tr2.fusible(1000)
