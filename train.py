#!/usr/bin/env python
"""Training CLI — the reference train.py for the TPU framework.

Flags mirror /root/reference/train.py:280-307 (ModelParams,
OptimizationParams, PipelineParams + the ad-hoc driver flags), so
reference invocations like

  python train.py -s <scene> --eval --mercy_points --cull_SH 15000 ...

work unchanged.  The hot loop runs through reduced3dgs_tpu.train.Trainer
(fully jitted steps on TPU); the final compression pipeline (codebooks +
quantised/half PLYs, train.py:172-175) runs at the end.
"""

from __future__ import annotations

import os
import random
import sys
import uuid
from argparse import ArgumentParser, Namespace

import numpy as np


def main():
    from reduced3dgs_tpu.platform import setup

    setup()

    parser = ArgumentParser(description="Training script parameters")
    from reduced3dgs_tpu import config as C

    C.add_model_params(parser)
    C.add_optimization_params(parser)
    C.add_pipeline_params(parser)
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--debug_from", type=int, default=-1)
    parser.add_argument("--detect_anomaly", action="store_true")
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--cull_SH", nargs="+", type=int, default=[])
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(sys.argv[1:])
    args.save_iterations.append(args.iterations)

    dataset = C.extract_model(args)
    opt = C.extract_optimization(args)
    pipe = C.extract_pipeline(args)

    if not args.model_path:
        args.model_path = os.path.join("./output/", str(uuid.uuid4())[:10])
        dataset = dataset.__class__(**{**dataset.__dict__,
                                       "model_path": args.model_path})
    print(f"Optimizing {args.model_path}")
    os.makedirs(args.model_path, exist_ok=True)
    C.dump_cfg_args(args.model_path, args)

    # safe_state: deterministic seeds (utils/general_utils.py:112-133)
    random.seed(args.seed)
    np.random.seed(args.seed)

    import jax
    import jax.numpy as jnp

    if args.detect_anomaly:
        # torch.autograd.set_detect_anomaly analogue (train.py:306):
        # every jitted step checks outputs and raises at the op that
        # produced the first NaN
        jax.config.update("jax_debug_nans", True)

    from reduced3dgs_tpu.network_gui import NetworkGUI
    from reduced3dgs_tpu.ops.kmeans import produce_clusters
    from reduced3dgs_tpu.ops.losses import psnr
    from reduced3dgs_tpu.renderer import render
    from reduced3dgs_tpu.scene import Scene
    from reduced3dgs_tpu.train.checkpoint import (
        load_checkpoint, save_checkpoint,
    )
    from reduced3dgs_tpu.train.trainer import Trainer

    scene = Scene(dataset)
    background = jnp.asarray(
        [1.0, 1.0, 1.0] if dataset.white_background else [0.0, 0.0, 0.0])

    # the reference's torch dual-path flags select the jnp oracle here
    backend = ("xla" if (pipe.convert_SHs_python or pipe.compute_cov3D_python)
               else pipe.backend)
    trainer = Trainer(
        scene.pool, opt, scene.get_train_cameras(),
        spatial_lr_scale=scene.cameras_extent, background=background,
        backend=backend, max_sh_degree=dataset.sh_degree,
        seed=args.seed, cull_sh_iterations=args.cull_SH, scene=scene,
        white_background=dataset.white_background,
        grad_reduce=pipe.grad_reduce,
    )
    trainer.extent = scene.cameras_extent
    first_iter = 0
    if args.start_checkpoint:
        state, first_iter, slr = load_checkpoint(args.start_checkpoint)
        trainer.state = state
        trainer.spatial_lr_scale = slr

    gui = NetworkGUI(args.ip, args.port, dataset.source_path,
                     trainer, pipe, background)

    tb = None
    try:
        from tensorboardX import SummaryWriter

        tb = SummaryWriter(args.model_path)
    except Exception:
        print("Tensorboard not available: not logging progress")

    try:
        from tqdm import tqdm

        bar = tqdm(range(first_iter, opt.iterations),
                   desc="Training progress")
    except Exception:
        bar = None

    def eval_report(iteration):
        """Test/train eval + scene histograms (reference training_report,
        train.py:246-278)."""
        train_cams = scene.get_train_cameras()
        sample = ([train_cams[i % len(train_cams)]
                   for i in range(5, 30, 5)] if train_cams else [])
        for name, cams in [("test", scene.get_test_cameras()),
                           ("train", sample)]:
            if not cams:
                continue
            pool = trainer.state.pool
            ps, l1s = [], []
            for idx, cam in enumerate(cams):
                out = render(
                    pool.params.xyz, pool.features(), pool.params.scaling,
                    pool.params.rotation, pool.params.opacity[:, 0],
                    pool.degrees, cam.params(), background,
                    width=cam.width, height=cam.height,
                    instance_budget=trainer._budget_for(cam.uid),
                    alive_mask=pool.alive, backend=backend)
                gt = np.clip(np.asarray(cam.image), 0, 1)
                img = np.clip(np.asarray(out.color), 0, 1)
                if tb and idx < 5:
                    hwc_to_chw = (2, 0, 1)
                    tb.add_image(f"{name}_view_{cam.image_name}/render",
                                 img.transpose(hwc_to_chw), iteration)
                    if iteration == args.test_iterations[0]:
                        tb.add_image(
                            f"{name}_view_{cam.image_name}/ground_truth",
                            gt.transpose(hwc_to_chw), iteration)
                ps.append(float(psnr(jnp.asarray(img), jnp.asarray(gt))))
                l1s.append(float(np.abs(img - gt).mean()))
            print(f"\n[ITER {iteration}] Evaluating {name}: "
                  f"L1 {np.mean(l1s):.5f} PSNR {np.mean(ps):.2f}")
            if tb:
                tb.add_scalar(f"{name}/loss_viewpoint - l1_loss",
                              np.mean(l1s), iteration)
                tb.add_scalar(f"{name}/loss_viewpoint - psnr",
                              np.mean(ps), iteration)
        if tb:
            pool = trainer.state.pool
            alive = np.asarray(pool.alive)
            n = max(int(alive.sum()), 1)
            tb.add_histogram("scene/opacity_histogram",
                             np.asarray(pool.get_opacity())[alive],
                             iteration)
            tb.add_scalar("total_points", n, iteration)
            degrees = np.asarray(pool.degrees)[alive]
            for d in range(4):
                tb.add_scalar(f"total_points/points_{d}_bands_%",
                              float((degrees == d).sum()) / n, iteration)

    # windowed loss/time aggregation (reference train.py:199-237)
    loss_agg = dict.fromkeys(
        ["l1_loss", "ssim_loss", "alpha_regul", "sh_sparsity_loss",
         "total_loss", "iter_time"], 0.0)
    dens_stats = dict.fromkeys(
        ["n_points_cloned", "n_points_split", "n_points_mercied",
         "n_points_pruned"], 0)
    dens_stats["redundancy_threshold"] = 0.0
    dens_stats["opacity_threshold"] = 0.0

    import time as _time

    ema = 0.0
    # fuse up to pipe.fused_steps boundary-free iterations into one
    # lax.scan launch; host work (logging/eval/save) replays per
    # iteration afterwards, and any iteration whose state an eval/save
    # must observe ends its group
    fused = max(1, int(getattr(pipe, "fused_steps", 1)))
    host_bounds = (set(args.test_iterations)
                   | set(args.checkpoint_iterations)
                   | set(args.save_iterations))

    def run_iterations():
        iteration = first_iter + 1
        while iteration <= opt.iterations:
            gui.poll(iteration)
            k = 1
            if fused > 1 and trainer.fusible(iteration):
                while (k < fused and iteration + k <= opt.iterations
                       and trainer.fusible(iteration + k)
                       and (iteration + k - 1) not in host_bounds):
                    k += 1
                # round down to a power of two so ragged boundary tails
                # reuse a bounded set of compiled scan lengths
                k = 1 << (k.bit_length() - 1)
            t0 = _time.perf_counter()
            if k > 1:
                ms = trainer.step_group(
                    list(range(iteration, iteration + k)))
                elapsed = (_time.perf_counter() - t0) / len(ms)
                for j, m in enumerate(ms):
                    post_step(iteration + j, m, elapsed)
                iteration += len(ms)
            else:
                metrics = trainer.step(iteration)
                post_step(iteration, metrics,
                          _time.perf_counter() - t0)
                iteration += 1

    def post_step(iteration, metrics, elapsed):
        nonlocal ema
        for k in ("n_points_cloned", "n_points_split", "n_points_mercied",
                  "n_points_pruned", "redundancy_threshold",
                  "opacity_threshold"):
            if k in trainer.stats:
                dens_stats[k] = trainer.stats.pop(k)
        if iteration % 10 == 0:
            loss = float(metrics["loss"])
            if not np.isfinite(loss):
                # post-mortem snapshot, the TPU analogue of the
                # rasterizer's snapshot_fw.dump on kernel error
                # (diff_gaussian_rasterization/__init__.py:91-97): dump
                # everything needed to replay the failing step offline
                snap = os.path.join(args.model_path, "snapshot_fw.npz")
                pool = trainer.state.pool
                np.savez(
                    snap, iteration=iteration,
                    **{f"param_{k}": np.asarray(v) for k, v in
                       pool.params._asdict().items()},
                    alive=np.asarray(pool.alive),
                    degrees=np.asarray(pool.degrees))
                raise FloatingPointError(
                    f"non-finite loss at iteration {iteration}; state "
                    f"snapshot written to {snap}")
            ema = 0.4 * loss + 0.6 * ema
            if bar is not None:
                bar.set_postfix({"Loss": f"{ema:.7f}",
                                 "N": int(metrics["num_alive"])})
                bar.update(10)
        if iteration % opt.densification_interval == 0:
            w = opt.densification_interval
            if tb:
                for key, tag in [("l1_loss", "l1_loss"),
                                 ("ssim_loss", "ssim_loss"),
                                 ("alpha_regul", "alpha_regul"),
                                 ("sh_sparsity_loss", "sh_sparsity_loss"),
                                 ("total_loss", "total_loss")]:
                    tb.add_scalar(f"train_loss_patches/{tag}",
                                  loss_agg[key] / w, iteration)
                tb.add_scalar("iter_time", loss_agg["iter_time"] / w,
                              iteration)
                n = max(int(metrics["num_alive"]), 1)
                for key in ("n_points_cloned", "n_points_split"):
                    tb.add_scalar(f"total_points/points_{key[9:]}",
                                  dens_stats[key], iteration)
                for key in ("n_points_mercied", "n_points_pruned"):
                    tb.add_scalar(f"total_points/points_{key[9:]}",
                                  dens_stats[key], iteration)
                    tb.add_scalar(f"total_points/points_{key[9:]}_%",
                                  dens_stats[key] / n, iteration)
                tb.add_scalar("total_points/redundancy_threshold",
                              dens_stats["redundancy_threshold"], iteration)
                tb.add_scalar("total_points/opacity_threshold",
                              dens_stats["opacity_threshold"], iteration)
            for key in ("n_points_cloned", "n_points_split",
                        "n_points_mercied", "n_points_pruned"):
                dens_stats[key] = 0
            for key in loss_agg:
                loss_agg[key] = 0.0
        else:
            loss_agg["l1_loss"] += float(metrics["l1"])
            loss_agg["ssim_loss"] += float(metrics["ssim_loss"])
            loss_agg["alpha_regul"] += float(metrics["alpha_regul"])
            loss_agg["sh_sparsity_loss"] += float(
                metrics["sh_sparsity_loss"])
            loss_agg["total_loss"] += float(metrics["loss"])
            loss_agg["iter_time"] += elapsed
        if iteration in args.test_iterations:
            eval_report(iteration)
        if iteration in args.checkpoint_iterations:
            print(f"\n[ITER {iteration}] Saving Checkpoint")
            save_checkpoint(
                os.path.join(args.model_path, f"chkpnt{iteration}.npz"),
                trainer.state, iteration, trainer.spatial_lr_scale)
        if iteration in args.save_iterations:
            print(f"\n[ITER {iteration}] Saving Gaussians")
            if opt.prune_dead_points:
                from reduced3dgs_tpu.train.trainer import prune_dead_step

                trainer.state, _ = prune_dead_step(
                    trainer.state, jnp.float32(trainer.extent))
            scene.pool = trainer.state.pool
            scene.save(iteration)

    run_iterations()

    if bar is not None:
        bar.close()

    # final compression pipeline (train.py:172-175)
    scene.pool = trainer.state.pool
    scene.save(opt.iterations)
    codebooks = produce_clusters(scene.pool, jax.random.PRNGKey(args.seed),
                                 max_sh_degree=dataset.sh_degree)
    scene.save(opt.iterations, codebooks, quantise=True)
    scene.save(opt.iterations, codebooks, quantise=True, half_float=True)
    # framework extension: same bytes as _half, chunked-u16 xyz codec
    scene.save(opt.iterations, codebooks, quantise=True, half_float=True,
               pack_xyz=True)
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
