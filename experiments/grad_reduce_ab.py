#!/usr/bin/env python
"""A/B evidence for --grad_reduce bf16x2.

The per-Gaussian gradient reduction sort is the largest single device
cost of the train step (PROFILE.md); packing gradient column pairs as
bf16 halves its payload.  This experiment quantifies what that costs:

1. one-step gradient error: relative L2 of bf16x2 vs f32 per-parameter
   gradients on a mid-training-like synthetic scene;
2. training quality: N iterations of the real Trainer on a procedural
   multi-view scene, f32 vs bf16x2, comparing held-out PSNR.

Run:  python experiments/grad_reduce_ab.py [iters]
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    import jax
    import jax.numpy as jnp

    from reduced3dgs_tpu.cameras import Camera
    from reduced3dgs_tpu.config import OptimizationParams
    from reduced3dgs_tpu.models import gaussians as G
    from reduced3dgs_tpu.ops.losses import psnr
    from reduced3dgs_tpu.renderer import render
    from reduced3dgs_tpu.train.trainer import Trainer

    w = h = 256
    budget = 1 << 19
    rng = np.random.default_rng(7)

    # ground-truth world: colour-coherent blobs (structured targets)
    n_gt = 3000
    centers = rng.uniform(-1.0, 1.0, (40, 3)).astype(np.float32)
    col_c = rng.uniform(0.1, 0.9, (40, 3)).astype(np.float32)
    which = rng.integers(0, 40, n_gt)
    xyz_gt = (centers[which]
              + rng.normal(0, 0.15, (n_gt, 3)).astype(np.float32))
    feats_gt = np.zeros((n_gt, 16, 3), np.float32)
    feats_gt[:, 0] = (col_c[which]
                      + rng.normal(0, 0.05, (n_gt, 3)) - 0.5) / 0.2820948
    scales_gt = np.log(rng.uniform(0.02, 0.08, (n_gt, 3))).astype(np.float32)
    rots_gt = rng.normal(0, 1, (n_gt, 4)).astype(np.float32)
    opac_gt = rng.uniform(0.5, 3.0, n_gt).astype(np.float32)
    deg_gt = np.full(n_gt, 0, np.int32)

    cams = [Camera.look_at(
        eye=(math.cos(a) * 3.2, 0.9, math.sin(a) * 3.2), target=(0, 0, 0),
        width=w, height=h, uid=i)
        for i, a in enumerate(np.linspace(0, 2 * math.pi, 14,
                                          endpoint=False))]
    bg = jnp.zeros(3)

    @jax.jit
    def gt_render(cp):
        return render(
            jnp.asarray(xyz_gt), jnp.asarray(feats_gt),
            jnp.asarray(scales_gt), jnp.asarray(rots_gt),
            jnp.asarray(opac_gt), jnp.asarray(deg_gt), cp, bg,
            width=w, height=h, instance_budget=budget,
            backend="pallas").color
    for c in cams:
        c.image = np.clip(np.asarray(gt_render(c.params())), 0, 1)
    test_cams = cams[::7]
    train_cams = [c for c in cams if c not in test_cams]

    # --- part 1: one-step gradient relative error ----------------------
    n0 = 20000
    pool = G.create_from_pcd(
        rng.uniform(-1.2, 1.2, (n0, 3)).astype(np.float32),
        rng.uniform(0.2, 0.8, (n0, 3)).astype(np.float32),
        capacity=1 << 15)
    cp0 = train_cams[0].params()
    gt0 = jnp.asarray(train_cams[0].image)

    def loss_fn(params, mode):
        feats = jnp.concatenate(
            [params.features_dc, params.features_rest], axis=1)
        out = render(
            params.xyz, feats, params.scaling, params.rotation,
            params.opacity[:, 0], pool.degrees, cp0, bg,
            width=w, height=h, instance_budget=budget,
            backend="pallas", grad_reduce=mode)
        return jnp.abs(out.color - gt0).mean()

    g_f32 = jax.jit(jax.grad(lambda p: loss_fn(p, "f32")))(pool.params)
    g_b16 = jax.jit(jax.grad(lambda p: loss_fn(p, "bf16x2")))(pool.params)
    errs = {}
    for k in g_f32._fields:
        a = np.asarray(getattr(g_f32, k)).ravel()
        b = np.asarray(getattr(g_b16, k)).ravel()
        denom = float(np.linalg.norm(a))
        errs[k] = float(np.linalg.norm(b - a) / denom) if denom else 0.0

    # --- part 2: short training A/B ------------------------------------
    results = {}
    for mode, seed in (("f32", 1), ("f32_s2", 2), ("bf16x2", 1),
                       ("bf16x2_s2", 2)):
        reduce_mode = mode.split("_")[0]
        cfg = dataclasses.replace(
            OptimizationParams(),
            iterations=iters,
            densify_from_iter=100, densification_interval=100,
            densify_until_iter=max(iters - 100, 150),
            opacity_reset_interval=10 ** 9,
        )
        pool_m = G.create_from_pcd(
            rng.uniform(-1.2, 1.2, (4000, 3)).astype(np.float32),
            rng.uniform(0.2, 0.8, (4000, 3)).astype(np.float32),
            capacity=1 << 15)
        tr = Trainer(pool_m, cfg, train_cams, spatial_lr_scale=1.0,
                     background=bg, backend="pallas",
                     initial_budget=budget, seed=seed,
                     grad_reduce=reduce_mode)
        tr.extent = 3.2
        for it in range(1, iters + 1):
            m = tr.step(it)
            if it % max(iters // 8, 1) == 0:
                print(f"[{mode}] iter {it}: loss "
                      f"{float(m['loss']):.4f} pts {int(tr.state.pool.num_alive)}",
                      flush=True)
        ps = []
        pl = tr.state.pool
        for c in test_cams:
            img = render(
                pl.params.xyz, pl.features(), pl.params.scaling,
                pl.params.rotation, pl.params.opacity[:, 0], pl.degrees,
                c.params(), bg, width=w, height=h,
                instance_budget=budget, backend="pallas",
                alive_mask=pl.alive).color
            ps.append(float(psnr(jnp.clip(img, 0, 1),
                                 jnp.asarray(c.image))))
        results[mode] = sum(ps) / len(ps)

    out = {
        "one_step_grad_rel_l2": errs,
        "test_psnr": results,
        "psnr_delta_db": results["bf16x2"] - results["f32"],
        "seed_noise_db": abs(results["f32_s2"] - results["f32"]),
        "iters": iters,
    }
    print(json.dumps(out, indent=2))
    with open(os.path.join(REPO, "experiments", "grad_reduce_ab.json"),
              "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
