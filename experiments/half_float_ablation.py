#!/usr/bin/env python
"""Diagnose WHERE the half-float PSNR cost concentrates (VERDICT r4
weak item 3 / next-round item 2).

Loads the round-4 trained full/baseline model, then rounds ONE
attribute group at a time through float16 and measures test-set PSNR.
The group whose f16 rounding reproduces the quantised->quantised_half
drop is the culprit the half format needs to treat differently.

Run: python experiments/half_float_ablation.py [--root /tmp/r3dgs_eval]
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


def f16(a):
    return np.asarray(a, np.float32).astype(np.float16).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/r3dgs_eval")
    ap.add_argument("--model", default="model_full")
    args = ap.parse_args()

    import jax.numpy as jnp

    from reduced3dgs_tpu.config import ModelParams
    from reduced3dgs_tpu.ops.losses import psnr
    from reduced3dgs_tpu.renderer import render
    from reduced3dgs_tpu.scene import Scene

    data = os.path.join(args.root, "scene")
    model = os.path.join(args.root, args.model)
    ds = ModelParams(source_path=data, model_path=model, eval=True)
    scene = Scene(ds, load_iteration=ITER, shuffle=False)
    scene.load_model(quantised=False, half_float=False)
    pool0 = scene.pool
    cams = scene.get_test_cameras()

    base = {
        "xyz": np.asarray(pool0.params.xyz),
        "features_dc": np.asarray(pool0.params.features_dc),
        "features_rest": np.asarray(pool0.params.features_rest),
        "opacity": np.asarray(pool0.params.opacity),
        "scaling": np.asarray(pool0.params.scaling),
        "rotation": np.asarray(pool0.params.rotation),
    }

    def eval_pool(arrs):
        params = pool0.params._replace(
            xyz=jnp.asarray(arrs["xyz"]),
            features_dc=jnp.asarray(arrs["features_dc"]),
            features_rest=jnp.asarray(arrs["features_rest"]),
            opacity=jnp.asarray(arrs["opacity"]),
            scaling=jnp.asarray(arrs["scaling"]),
            rotation=jnp.asarray(arrs["rotation"]),
        )
        pool = pool0._replace(params=params)
        ps = []
        for cam in cams:
            out = render(
                pool.params.xyz, pool.features(), pool.params.scaling,
                pool.params.rotation, pool.params.opacity[:, 0],
                pool.degrees, cam.params(), jnp.zeros(3),
                width=cam.width, height=cam.height,
                instance_budget=1 << 21, alive_mask=pool.alive,
                backend="pallas")
            img = jnp.clip(out.color, 0, 1)
            ps.append(float(psnr(img, jnp.asarray(cam.image))))
        return float(np.mean(ps))

    results = {}
    results["f32_all"] = eval_pool(base)
    print(f"f32_all           {results['f32_all']:.3f}", flush=True)

    for key in base:
        arrs = dict(base)
        arrs[key] = f16(base[key])
        results[f"f16_{key}"] = eval_pool(arrs)
        print(f"f16_{key:<14}{results[f'f16_{key}']:.3f}  "
              f"(delta {results[f'f16_{key}'] - results['f32_all']:+.3f})",
              flush=True)

    arrs = {k: f16(v) for k, v in base.items()}
    results["f16_all"] = eval_pool(arrs)
    print(f"f16_all           {results['f16_all']:.3f}  "
          f"(delta {results['f16_all'] - results['f32_all']:+.3f})",
          flush=True)

    # candidate fixes for the worst offender, applied in isolation
    # (scaling is stored in log space: f16 rel error 4.9e-4 on the LOG
    # becomes a multiplicative size error ~exp(+-4.9e-4*|log s|)...)
    stats = {k: {"min": float(np.min(v)), "max": float(np.max(v)),
                 "absmax": float(np.abs(v).max())}
             for k, v in base.items()}
    print(json.dumps({"psnr": results, "ranges": stats}, indent=1))


if __name__ == "__main__":
    main()
