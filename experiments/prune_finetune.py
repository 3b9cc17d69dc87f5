#!/usr/bin/env python
"""Offline prune -> fine-tune -> quantise ladder (the x20 push).

Takes a trained full_final model, prunes the lowest-opacity fraction of
primitives, fine-tunes for a short burst (no densify/mercy — the
remaining splats re-absorb the pruned ones' mass, mirroring how the
reference's in-training mercy pruning gets its losses repaid over the
following iterations, train.py:146-150), then quantises and saves the
chunked-u16-xyz pack variant.  Reports PSNR + bytes for each rung.

Run:  python experiments/prune_finetune.py \
          [--root /tmp/r3dgs_eval] [--fracs 0.10 0.14 0.18]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ITER = 10_000


def eval_psnr(pool, cams):
    import jax.numpy as jnp

    from reduced3dgs_tpu.ops.losses import psnr
    from reduced3dgs_tpu.renderer import render

    ps = []
    for cam in cams:
        out = render(
            pool.params.xyz, pool.features(), pool.params.scaling,
            pool.params.rotation, pool.params.opacity[:, 0],
            pool.degrees, cam.params(), jnp.zeros(3),
            width=cam.width, height=cam.height,
            instance_budget=1 << 21, alive_mask=pool.alive,
            backend="pallas")
        ps.append(float(psnr(jnp.clip(out.color, 0, 1),
                             jnp.asarray(cam.image))))
    return float(np.mean(ps))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/r3dgs_eval")
    ap.add_argument("--model", default="model_full")
    ap.add_argument("--fracs", nargs="+", type=float,
                    default=[0.10, 0.14, 0.18])
    ap.add_argument("--ft_iters", type=int, default=1000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from reduced3dgs_tpu.config import ModelParams, OptimizationParams
    from reduced3dgs_tpu.models.ply_io import save_gaussian_ply
    from reduced3dgs_tpu.ops.kmeans import produce_clusters
    from reduced3dgs_tpu.scene import Scene
    from reduced3dgs_tpu.train.trainer import Trainer

    data = os.path.join(args.root, "scene")
    model = os.path.join(args.root, args.model)
    ds = ModelParams(source_path=data, model_path=model, eval=True)
    scene = Scene(ds, load_iteration=ITER, shuffle=False)
    scene.load_model(quantised=False, half_float=False)
    pool0 = scene.pool
    test_cams = scene.get_test_cameras()
    train_cams = scene.get_train_cameras()
    alive = np.asarray(pool0.alive)
    op = 1 / (1 + np.exp(-np.asarray(pool0.params.opacity[:, 0])))
    n0 = int(alive.sum())
    base_psnr = eval_psnr(pool0, test_cams)
    print(f"start: {n0} primitives, test PSNR {base_psnr:.3f}", flush=True)

    results = {"base": {"psnr": base_psnr, "n": n0}}
    for frac in args.fracs:
        k = int(n0 * frac)
        score = np.where(alive, op, np.inf)
        cut = np.argsort(score)[:k]
        m = alive.copy()
        m[cut] = False
        pool = pool0._replace(alive=jnp.asarray(m))

        # fine-tune: plain optimization, no densify/mercy/reset
        cfg = OptimizationParams(
            iterations=ITER + args.ft_iters,
            position_lr_max_steps=ITER,
            densify_from_iter=0, densify_until_iter=0,
            opacity_reset_interval=10 ** 9,
        )
        tr = Trainer(pool, cfg, train_cams,
                     spatial_lr_scale=scene.cameras_extent,
                     background=np.zeros(3), backend="pallas",
                     scene=scene, grad_reduce="bf16x2")
        tr.extent = scene.cameras_extent
        it = ITER + 1
        while it <= ITER + args.ft_iters:
            group = [i for i in range(it, min(it + 16,
                                              ITER + args.ft_iters + 1))
                     if tr.fusible(i)]
            if group and group[0] == it:
                tr.step_group(group)
                it = group[-1] + 1
            else:
                tr.step(it)
                it += 1
        pool = tr.state.pool
        ft_psnr = eval_psnr(pool, test_cams)

        cb = produce_clusters(pool, jax.random.PRNGKey(0))
        path = os.path.join("/tmp", f"pf_{int(frac * 100)}.ply")
        save_gaussian_ply(path, pool, cb, quantised=True,
                          half_float=True, xyz_codec="u16c")
        from reduced3dgs_tpu.models.ply_io import (
            load_gaussian_ply, pool_from_arrays,
        )
        rpool = pool_from_arrays(load_gaussian_ply(
            path, quantised=True, half_float=True))
        q_psnr = eval_psnr(rpool, test_cams)
        size = os.path.getsize(path)
        results[f"frac_{frac}"] = {
            "n": int(np.asarray(pool.alive).sum()), "ft_psnr": ft_psnr,
            "pack_psnr": q_psnr, "bytes": size,
        }
        print(f"frac {frac:.2f}: n={results[f'frac_{frac}']['n']} "
              f"ft_psnr={ft_psnr:.3f} pack_psnr={q_psnr:.3f} "
              f"size={size / 1e6:.3f} MB "
              f"x_vs_vanilla={12296696 / size:.1f}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
