#!/usr/bin/env python
"""Metrics CLI — mirror of /root/reference/metrics.py:36-93.

Computes SSIM / PSNR / LPIPS over renders-vs-gt directories produced by
render.py and writes results.json + per_view.json per model dir.  LPIPS
uses the JAX VGG implementation when pretrained weights are available
(see reduced3dgs_tpu/ops/lpips.py — this environment has no network
access, so it degrades to reporting null).
"""

from __future__ import annotations

import json
import os
from argparse import ArgumentParser

import numpy as np
from PIL import Image


def read_images(renders_dir, gt_dir):
    renders, gts, names = [], [], []
    for fname in sorted(os.listdir(renders_dir)):
        r = np.asarray(Image.open(os.path.join(renders_dir, fname)),
                       dtype=np.float32) / 255.0
        g = np.asarray(Image.open(os.path.join(gt_dir, fname)),
                       dtype=np.float32) / 255.0
        renders.append(r[:, :, :3])
        gts.append(g[:, :, :3])
        names.append(fname)
    return renders, gts, names


def evaluate(model_paths, lpips_weights=None):
    from reduced3dgs_tpu.platform import setup
    setup()

    import jax.numpy as jnp

    from reduced3dgs_tpu.ops.losses import psnr, ssim
    from reduced3dgs_tpu.ops.lpips import lpips_fn

    # weights resolution: --lpips_weights > $R3DGS_LPIPS_WEIGHTS >
    # <repo>/weights/lpips_vgg.npz; see docs in ops/lpips.py and the
    # export_weights_from_torch converter for producing the .npz in an
    # environment that has torchvision + the lpips pip package.
    lpips = lpips_fn(lpips_weights)  # None if VGG weights unavailable
    if lpips is None and lpips_weights:
        raise FileNotFoundError(
            f"--lpips_weights {lpips_weights!r} not found/loadable")
    if lpips is None:
        print("LPIPS skipped (no VGG16 weights found — place an .npz at "
              "$R3DGS_LPIPS_WEIGHTS or <repo>/weights/lpips_vgg.npz; "
              "see reduced3dgs_tpu/ops/lpips.py). results.json will "
              "report LPIPS: null.")

    for scene_dir in model_paths:
        print(f"Scene: {scene_dir}")
        full_dict, per_view_dict = {}, {}
        for split in ("test", "train"):
            split_dir = os.path.join(scene_dir, split)
            if not os.path.isdir(split_dir):
                continue
            for method_dir_name in os.listdir(split_dir):
                method_root = os.path.join(split_dir, method_dir_name)
                for ours in sorted(os.listdir(method_root)):
                    method = f"{method_dir_name}/{ours}"
                    base = os.path.join(method_root, ours)
                    renders_dir = os.path.join(base, "renders")
                    gt_dir = os.path.join(base, "gt")
                    if not os.path.isdir(renders_dir):
                        continue
                    renders, gts, names = read_images(renders_dir, gt_dir)
                    ssims, psnrs, lpipss = [], [], []
                    for r, g in zip(renders, gts):
                        r, g = jnp.asarray(r), jnp.asarray(g)
                        ssims.append(float(ssim(r, g)))
                        psnrs.append(float(psnr(r, g)))
                        if lpips is not None:
                            lpipss.append(float(lpips(r, g)))
                    print(f"  {split}/{method}: "
                          f"SSIM {np.mean(ssims):.7f} "
                          f"PSNR {np.mean(psnrs):.7f} "
                          + (f"LPIPS {np.mean(lpipss):.7f}"
                             if lpipss else "LPIPS n/a"))
                    key = f"{split}_{method}"
                    full_dict[key] = {
                        "SSIM": float(np.mean(ssims)),
                        "PSNR": float(np.mean(psnrs)),
                        "LPIPS": float(np.mean(lpipss)) if lpipss else None,
                    }
                    per_view_dict[key] = {
                        "SSIM": dict(zip(names, map(float, ssims))),
                        "PSNR": dict(zip(names, map(float, psnrs))),
                    }
        with open(os.path.join(scene_dir, "results.json"), "w") as f:
            json.dump(full_dict, f, indent=2)
        with open(os.path.join(scene_dir, "per_view.json"), "w") as f:
            json.dump(per_view_dict, f, indent=2)


if __name__ == "__main__":
    parser = ArgumentParser(description="Training script parameters")
    parser.add_argument("--model_paths", "-m", required=True, nargs="+",
                        type=str)
    parser.add_argument("--lpips_weights", type=str, default=None,
                        help=".npz of VGG16+LPIPS weights (see "
                             "reduced3dgs_tpu/ops/lpips.py)")
    args = parser.parse_args()
    evaluate(args.model_paths, lpips_weights=args.lpips_weights)
