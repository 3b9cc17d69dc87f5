#!/usr/bin/env python
"""Results aggregator — mirror of /root/reference/generate_results.py.

Computes the analytic per-variant memory model (float/byte/half widths
per attribute + codebook overhead, generate_results.py:43-111, with the
59-float uncompressed baseline at :98-101), per-band point percentages,
and merges with results.json / fps_results.json into a pandas table.
"""

from __future__ import annotations

import json
import os
from argparse import ArgumentParser

import numpy as np
import pandas as pd

from reduced3dgs_tpu.data.ply import read_ply

BASELINE_FLOATS = 59  # xyz3 + dc3 + rest45 + op1 + scale3 + rot4


def memory_results(model_dir, iteration):
    base = os.path.join(model_dir, "point_cloud", f"iteration_{iteration}")
    rows = {}
    for variant, fname in [
        ("baseline", "point_cloud.ply"),
        ("quantised", "point_cloud_quantised.ply"),
        ("quantised_half", "point_cloud_quantised_half.ply"),
        ("quantised_pack", "point_cloud_quantised_pack.ply"),
    ]:
        path = os.path.join(base, fname)
        if not os.path.exists(path):
            continue
        data = read_ply(path)
        counts = {name: len(el) for name, el in data.items()
                  if name.startswith("vertex_")}
        total = sum(counts.values())
        # analytic model: per-band bytes/primitive
        analytic = 0
        for name, n in counts.items():
            deg = int(name.split("_")[1])
            coeffs = (deg + 1) ** 2 - 1
            attr = 3 + coeffs * 3 + 1 + 3 + 4  # dc + rest + op + scale + rot
            half_like = "half" in variant or "pack" in variant
            xyz_b = 2 if half_like else 4  # pack: u16 fixed-point
            attr_b = 1 if "quantised" in variant else xyz_b
            analytic += n * (3 * xyz_b + attr * attr_b)
        if "codebook_centers" in data:
            width = 2 if ("half" in variant or "pack" in variant) else 4
            analytic += 256 * 20 * width
        if "xyz_chunk_bounds" in data:
            analytic += len(data["xyz_chunk_bounds"]) * 24
        rows[variant] = {
            "n_points": total,
            **{f"pct_band_{k.split('_')[1]}": 100.0 * v / max(total, 1)
               for k, v in counts.items()},
            "disk_MB": os.path.getsize(path) / 1e6,
            "analytic_MB": analytic / 1e6,
            "uncompressed_MB": total * BASELINE_FLOATS * 4 / 1e6,
            "compression_x": total * BASELINE_FLOATS * 4
            / max(os.path.getsize(path), 1),
        }
    return rows


def main():
    parser = ArgumentParser()
    parser.add_argument("--model_paths", "-m", nargs="+", required=True)
    parser.add_argument("--iteration", type=int, default=30000)
    args = parser.parse_args()

    records = []
    for model in args.model_paths:
        mem = memory_results(model, args.iteration)
        results = {}
        rpath = os.path.join(model, "results.json")
        if os.path.exists(rpath):
            with open(rpath) as f:
                results = json.load(f)
        fps = {}
        fpath = os.path.join(model, "fps_results.json")
        if os.path.exists(fpath):
            with open(fpath) as f:
                fps = json.load(f)
        for variant, row in mem.items():
            rec = {"model": os.path.basename(model.rstrip("/")),
                   "variant": variant, **row}
            for key, metrics in results.items():
                if variant in key and key.startswith("test"):
                    rec.update({k: v for k, v in metrics.items()})
            if variant in fps:
                rec["fps"] = fps[variant]
            records.append(rec)
    df = pd.DataFrame.from_records(records)
    print(df.to_string(index=False))
    out = os.path.join(os.path.dirname(args.model_paths[0]), "summary.csv")
    df.to_csv(out, index=False)
    print(f"\nWritten {out}")


if __name__ == "__main__":
    main()
