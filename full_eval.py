#!/usr/bin/env python
"""Full evaluation harness — mirror of /root/reference/full_eval.py.

Trains + renders + evaluates the paper's 13 scenes (MipNeRF360 outdoor at
images_4 / indoor at images_2, Tanks&Temples, Deep Blending) under named
experiment configurations; `full_final` is the paper configuration
(full_eval.py:32-54).
"""

from __future__ import annotations

import os
from argparse import ArgumentParser

mipnerf360_outdoor_scenes = ["bicycle", "flowers", "garden", "stump",
                             "treehill"]
mipnerf360_indoor_scenes = ["room", "counter", "kitchen", "bonsai"]
tanks_and_temples_scenes = ["truck", "train"]
deep_blending_scenes = ["drjohnson", "playroom"]

# experiment name -> extra train.py flags (full_eval.py:32-54)
configurations = {
    "baseline": "",
    "prune": "--mercy_points --prune_dead_points",
    "sh_sparsity": "--store_grads --lambda_sh_sparsity 0.1 --cull_SH 15000",
    "full_final": (
        "--store_grads --lambda_sh_sparsity 0.1 --cull_SH 15000 "
        "--mercy_points --prune_dead_points --lambda_alpha_regul 0.001 "
        "--std_threshold 0.04 --cdist_threshold 6 "
        "--mercy_type redundancy_opacity_opacity"
    ),
}


def main():
    parser = ArgumentParser(description="Full evaluation script parameters")
    parser.add_argument("--skip_training", action="store_true")
    parser.add_argument("--skip_rendering", action="store_true")
    parser.add_argument("--skip_metrics", action="store_true")
    parser.add_argument("--output_path", default="./eval")
    parser.add_argument("--mipnerf360", "-m360", type=str,
                        default="MipNeRF360")
    parser.add_argument("--tanksandtemples", "-tat", type=str,
                        default="TanksAndTemples")
    parser.add_argument("--deepblending", "-db", type=str,
                        default="DeepBlending")
    parser.add_argument("--configurations", nargs="+", type=str,
                        default=["full_final"])
    args = parser.parse_args()

    scenes = (
        [(args.mipnerf360, s, "-i images_4") for s in
         mipnerf360_outdoor_scenes]
        + [(args.mipnerf360, s, "-i images_2") for s in
           mipnerf360_indoor_scenes]
        + [(args.tanksandtemples, s, "") for s in tanks_and_temples_scenes]
        + [(args.deepblending, s, "") for s in deep_blending_scenes]
    )

    for config in args.configurations:
        extra = configurations[config]
        for root, scene, imgflag in scenes:
            src = os.path.join(root, scene)
            out = os.path.join(args.output_path, config, scene)
            if not args.skip_training:
                os.system(
                    f"python train.py -s {src} {imgflag} -m {out} "
                    f"--eval --quiet {extra}")
            if not args.skip_rendering:
                os.system(
                    f"python render.py -m {out} --eval --skip_train")
            if not args.skip_metrics:
                os.system(f"python metrics.py -m {out}")


if __name__ == "__main__":
    main()
