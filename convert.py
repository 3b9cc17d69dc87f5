#!/usr/bin/env python
"""COLMAP preprocessing driver — mirror of /root/reference/convert.py.

Shells out to a local COLMAP install (feature extraction, exhaustive
matching, mapping, undistortion) and produces the sparse/ + images/
layout the Scene loader expects, with optional 1/2, 1/4, 1/8 resized
image pyramids (via PIL instead of ImageMagick).
"""

from __future__ import annotations

import logging
import os
import shutil
from argparse import ArgumentParser


def run(cmd):
    code = os.system(cmd)
    if code != 0:
        logging.error(f"command failed with code {code}: {cmd}")
        raise SystemExit(code)


def main():
    parser = ArgumentParser("Colmap converter")
    parser.add_argument("--no_gpu", action="store_true")
    parser.add_argument("--skip_matching", action="store_true")
    parser.add_argument("--source_path", "-s", required=True, type=str)
    parser.add_argument("--camera", default="OPENCV", type=str)
    parser.add_argument("--colmap_executable", default="", type=str)
    parser.add_argument("--resize", action="store_true")
    args = parser.parse_args()
    colmap = (f'"{args.colmap_executable}"' if args.colmap_executable
              else "colmap")
    use_gpu = 0 if args.no_gpu else 1
    src = args.source_path

    if shutil.which(colmap.strip('"')) is None and not args.colmap_executable:
        raise SystemExit(
            "COLMAP not found on PATH; install it or pass "
            "--colmap_executable")

    if not args.skip_matching:
        os.makedirs(os.path.join(src, "distorted", "sparse"), exist_ok=True)
        run(f"{colmap} feature_extractor"
            f" --database_path {src}/distorted/database.db"
            f" --image_path {src}/input"
            f" --ImageReader.single_camera 1"
            f" --ImageReader.camera_model {args.camera}"
            f" --SiftExtraction.use_gpu {use_gpu}")
        run(f"{colmap} exhaustive_matcher"
            f" --database_path {src}/distorted/database.db"
            f" --SiftMatching.use_gpu {use_gpu}")
        run(f"{colmap} mapper"
            f" --database_path {src}/distorted/database.db"
            f" --image_path {src}/input"
            f" --output_path {src}/distorted/sparse"
            f" --Mapper.ba_global_function_tolerance=0.000001")

    run(f"{colmap} image_undistorter"
        f" --image_path {src}/input"
        f" --input_path {src}/distorted/sparse/0"
        f" --output_path {src}"
        f" --output_type COLMAP")

    sparse0 = os.path.join(src, "sparse", "0")
    os.makedirs(sparse0, exist_ok=True)
    for f in os.listdir(os.path.join(src, "sparse")):
        if f == "0":
            continue
        shutil.move(os.path.join(src, "sparse", f),
                    os.path.join(sparse0, f))

    if args.resize:
        from PIL import Image

        for denom, sub in [(2, "images_2"), (4, "images_4"),
                           (8, "images_8")]:
            out_dir = os.path.join(src, sub)
            os.makedirs(out_dir, exist_ok=True)
            for fname in os.listdir(os.path.join(src, "images")):
                img = Image.open(os.path.join(src, "images", fname))
                img = img.resize((img.width // denom, img.height // denom))
                img.save(os.path.join(out_dir, fname))
    print("Done.")


if __name__ == "__main__":
    main()
