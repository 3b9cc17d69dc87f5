#!/usr/bin/env python
"""Offline compression CLI — mirror of /root/reference/compress.py.

Loads an unquantised new-format PLY, fits the 20 k-means codebooks and
writes the quantised (+ optional half-float) PLYs without retraining.

Framework extensions beyond the reference CLI:
  --pack_xyz      also write point_cloud_quantised_pack.ply (chunked
                  fixed-point uint16 xyz + f16 codebook centers — same
                  bytes as _half with none of the f16 xyz PSNR cost)
"""

from __future__ import annotations

import os
from argparse import ArgumentParser


def main():
    from reduced3dgs_tpu.platform import setup

    setup()

    from reduced3dgs_tpu import config as C

    parser = ArgumentParser(description="Compression script parameters")
    C.add_model_params(parser, fill_none=True)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--pack_xyz", action="store_true")
    args = C.get_combined_args(parser)

    import jax

    from reduced3dgs_tpu.models.ply_io import (
        load_gaussian_ply, pool_from_arrays, save_gaussian_ply,
    )
    from reduced3dgs_tpu.ops.kmeans import produce_clusters
    from reduced3dgs_tpu.scene import search_max_iteration

    iteration = args.iteration
    if iteration == -1:
        iteration = search_max_iteration(
            os.path.join(args.model_path, "point_cloud"))
    base = os.path.join(args.model_path, "point_cloud",
                        f"iteration_{iteration}")
    pool = pool_from_arrays(
        load_gaussian_ply(os.path.join(base, "point_cloud.ply")))
    print(f"Quantising {base} ({int(pool.num_alive)} primitives)")
    codebooks = produce_clusters(pool, jax.random.PRNGKey(args.seed))
    save_gaussian_ply(os.path.join(base, "point_cloud_quantised.ply"),
                      pool, codebooks, quantised=True)
    save_gaussian_ply(os.path.join(base, "point_cloud_quantised_half.ply"),
                      pool, codebooks, quantised=True, half_float=True)
    names = ["point_cloud.ply", "point_cloud_quantised.ply",
             "point_cloud_quantised_half.ply"]
    if args.pack_xyz:
        save_gaussian_ply(
            os.path.join(base, "point_cloud_quantised_pack.ply"),
            pool, codebooks, quantised=True, half_float=True,
            xyz_codec="u16c")
        names.append("point_cloud_quantised_pack.ply")
    for name in names:
        p = os.path.join(base, name)
        print(f"  {name}: {os.path.getsize(p) / 1e6:.2f} MB")


if __name__ == "__main__":
    main()
