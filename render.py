#!/usr/bin/env python
"""Rendering/eval CLI — mirror of /root/reference/render.py.

Loads a trained model dir (self-describing via cfg_args) and renders the
train/test splits for each requested model variant:

  baseline        point_cloud.ply
  quantised       point_cloud_quantised.ply
  quantised_half  point_cloud_quantised_half.ply
  quantised_pack  point_cloud_quantised_pack.ply  (framework extension:
                  chunked fixed-point uint16 xyz, same bytes as _half)

plus per-view FPS measurement (render.py:43-51: one warmup pass, then a
timed pass per view; here device-synchronized wall clock instead of CUDA
events).
"""

from __future__ import annotations

import json
import os
import sys
import time
from argparse import ArgumentParser
from functools import partial

import numpy as np

MODELS_CONFIG = {
    "baseline": {"quantised": False, "half_float": False},
    "quantised": {"quantised": True, "half_float": False},
    "quantised_half": {"quantised": True, "half_float": True},
    "quantised_pack": {"quantised": False, "half_float": False,
                       "pack_xyz": True},
}


def main():
    from reduced3dgs_tpu.platform import setup

    setup()

    from reduced3dgs_tpu import config as C

    parser = ArgumentParser(description="Testing script parameters")
    C.add_model_params(parser, fill_none=True)
    C.add_pipeline_params(parser)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--skip_measure_fps", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--variable_sh_bands", action="store_true",
                        help="render from the ragged degree-grouped SH "
                             "packing (models/variable_sh.py)")
    parser.add_argument("--models", nargs="+", type=str,
                        default=["baseline", "quantised_half"])
    args = C.get_combined_args(parser)
    print(f"Rendering {args.model_path}")

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from reduced3dgs_tpu.renderer import render
    from reduced3dgs_tpu.scene import Scene

    dataset = C.extract_model(args)
    pipe = C.extract_pipeline(args)
    scene = Scene(dataset, load_iteration=args.iteration, shuffle=False)
    background = jnp.asarray(
        [1.0, 1.0, 1.0] if dataset.white_background else [0.0, 0.0, 0.0])

    variable_sh = bool(getattr(args, "variable_sh_bands", False))
    fps_results = {}
    for model in args.models:
        conf = MODELS_CONFIG[model]
        pool = scene.load_model(quantised=conf["quantised"],
                                half_float=conf["half_float"],
                                pack_xyz=conf.get("pack_xyz", False))

        ragged = None
        if variable_sh:
            # ragged inference storage: pool reordered by SH band, one
            # packed static block per band (models/variable_sh.py — the
            # TPU equivalent of the reference's variable-SH inference
            # path, forward.cu:246-350)
            from reduced3dgs_tpu.models.variable_sh import (
                build_ragged, eval_colors,
            )

            pool, ragged = build_ragged(pool)

        def render_view(cam, budget=1 << 19):
            color_precomp = None
            feats = pool.features()
            if ragged is not None:
                color_precomp = eval_colors(
                    ragged, pool.params.xyz, cam.params().campos)
                feats = jnp.zeros(
                    (pool.params.xyz.shape[0], 1, 3), jnp.float32)
            out = render(
                pool.params.xyz, feats, pool.params.scaling,
                pool.params.rotation, pool.params.opacity[:, 0],
                pool.degrees, cam.params(), background,
                width=cam.width, height=cam.height, instance_budget=budget,
                alive_mask=pool.alive, backend=pipe.backend,
                color_precomp=color_precomp)
            if int(out.num_rendered) > budget:
                return render_view(cam, budget * 2)
            return out

        sets = []
        if not args.skip_train:
            sets.append(("train", scene.get_train_cameras()))
        if not args.skip_test:
            sets.append(("test", scene.get_test_cameras()))
        for split, cams in sets:
            base = os.path.join(args.model_path, split, model,
                                f"ours_{scene.loaded_iter}")
            os.makedirs(os.path.join(base, "renders"), exist_ok=True)
            os.makedirs(os.path.join(base, "gt"), exist_ok=True)
            for idx, cam in enumerate(cams):
                out = render_view(cam)
                img = np.clip(np.asarray(out.color), 0, 1)
                Image.fromarray((img * 255).astype(np.uint8)).save(
                    os.path.join(base, "renders", f"{idx:05d}.png"))
                if cam.image is not None:
                    Image.fromarray(
                        (np.clip(cam.image, 0, 1) * 255).astype(np.uint8)
                    ).save(os.path.join(base, "gt", f"{idx:05d}.png"))

        # FPS over the test (or train) set.  The reference times the
        # rasterizer per view with CUDA events — i.e. device time, not
        # host dispatch (render.py:43-51).  This sandbox's tunneled TPU
        # runtime costs ~30 ms host dispatch PER launch (PROFILE.md),
        # which would swamp the device time, so the equivalent here is
        # a value-chained lax.scan over the stacked views inside ONE
        # launch: wall clock then tracks device time + one dispatch.
        cams = (scene.get_test_cameras() or scene.get_train_cameras())[:50]
        if args.skip_measure_fps:
            cams = []
        if cams:
            w, h = cams[0].width, cams[0].height
            cams_f = [c for c in cams if (c.width, c.height) == (w, h)]
            # small view sets are repeated inside the ONE launch so the
            # timed window is >= ~0.25 s — a single pass over 4 views
            # (~35 ms) measured against the tunnel's ~1-30 ms dispatch
            # jitter produced +-15% FPS noise between runs
            n_views = len(cams_f)
            reps = max(1, -(-32 // n_views))
            cps = jax.tree.map(
                lambda *leaves: jnp.stack(
                    [jnp.asarray(x) for x in leaves] * reps),
                *[c.params() for c in cams_f])
            # start small and let the ladder find each model's TIGHT
            # bucket: every instance-sized cost (binning sort, expand,
            # kernels) scales with the budget, so a reduced model only
            # shows its rendering speedup if its budget fits its true
            # instance demand (a fixed oversized budget would erase it)
            budget = 1 << 15

            # The pool leaves are passed as ARGUMENTS, not closed over:
            # a closed-over device array is embedded in the MLIR module
            # by reading it back from the device — minutes per MB
            # through the sandbox's tunnel.  (`ragged` stays closed over:
            # its blocks are host-side numpy from build_ragged and its
            # band sizes are static.)
            @partial(jax.jit, static_argnums=(3,))
            def go(salt, pool_, cps, budget):
                ragged_ = ragged

                def body(carry, cp):
                    color_precomp = None
                    feats = pool_.features()
                    if ragged_ is not None:
                        color_precomp = eval_colors(
                            ragged_, pool_.params.xyz, cp.campos)
                        feats = jnp.zeros(
                            (pool_.params.xyz.shape[0], 1, 3), jnp.float32)
                    out = render(
                        pool_.params.xyz + 1e-30 * carry, feats,
                        pool_.params.scaling, pool_.params.rotation,
                        pool_.params.opacity[:, 0], pool_.degrees, cp,
                        background, width=w, height=h,
                        instance_budget=budget,
                        alive_mask=pool_.alive, backend=pipe.backend,
                        color_precomp=color_precomp)
                    return out.color.mean(), out.num_rendered

                return jax.lax.scan(body, salt, cps)

            while True:
                # compile + warmup pass
                last, nrs = go(jnp.float32(0.0), pool, cps, budget)
                jax.block_until_ready(last)
                needed = int(jnp.max(nrs))
                if needed <= budget:
                    break
                while budget < needed:  # {2^k, 3*2^(k-1)} ladder
                    budget = (budget // 2 * 3 if budget & (budget - 1) == 0
                              else budget // 3 * 4)
            # `salt` makes the timed call's arguments differ from the
            # warmup's: the tunneled runtime has served a CACHED result
            # for a repeated (executable, args) pair, which would read
            # as an impossibly high FPS (same guard as bench.py).
            t0 = time.perf_counter()
            last, _ = go(jnp.float32(1e-6), pool, cps, budget)
            jax.block_until_ready(last)
            dt = time.perf_counter() - t0
            total_views = n_views * reps
            if dt < 0.0002 * total_views:
                raise RuntimeError(
                    f"implausible FPS timing {dt:.4f}s for {total_views} "
                    "views: stale tunnel result suspected")
            fps_results[model] = float(total_views / dt)
            print(f"Model {model}: {fps_results[model]:.1f} FPS "
                  f"({n_views} views x {reps} reps in one launch)")

    with open(os.path.join(args.model_path, "fps_results.json"), "w") as f:
        json.dump(fps_results, f, indent=2)


if __name__ == "__main__":
    main()
