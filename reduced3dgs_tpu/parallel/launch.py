"""Multi-host runtime entry + scaling-efficiency harness.

The reference is strictly single-process/single-GPU (the device is
hard-pinned in utils/general_utils.py:133); the multi-host story here is
TPU-native: `jax.distributed.initialize` connects the per-host
processes, every host sees the global device set, and the
("data", "tile") mesh of parallel/sharded.py spans all of them — XLA
routes the all_gather/psum over ICI within a slice and DCN across
hosts.

Run one process per host, e.g.

  python -m reduced3dgs_tpu.parallel.launch --scaling        # local bench
  COORDINATOR=host0:8476 NPROC=4 PROC_ID=$i \
      python -m reduced3dgs_tpu.parallel.launch --scaling    # multi-host

On Cloud TPU the environment variables are auto-detected and
`initialize_distributed()` can be called with no arguments.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Connect this process to the multi-host JAX runtime.

    Arguments default to the COORDINATOR / NPROC / PROC_ID environment
    variables, and to full auto-detection (TPU metadata) when those are
    absent.  Safe to call on a single host: with no coordinator info it
    is a no-op.
    """
    import jax

    coordinator = coordinator or os.environ.get("COORDINATOR")
    num_processes = num_processes or _int_env("NPROC")
    process_id = process_id if process_id is not None else _int_env(
        "PROC_ID")
    if coordinator is None and num_processes is None:
        # single-host (or Cloud TPU auto-detect if the TPU runtime is up)
        try:
            jax.distributed.initialize()
        except Exception:  # noqa: BLE001 - not in a managed TPU pod: fine
            pass
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def _int_env(name):
    v = os.environ.get(name)
    return int(v) if v is not None else None


def scaling_bench(widths=(512,), n_prims=1 << 15, budget=1 << 18,
                  iters=5, mesh_shapes=None):
    """Measure pixels/s of the sharded train step at 1 device vs the full
    mesh; prints one JSON line per mesh shape with the parallel
    efficiency vs the 1-device run.  Works on a virtual CPU mesh
    (XLA_FLAGS=--xla_force_host_platform_device_count=8) and on real
    chips alike.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from reduced3dgs_tpu.cameras import Camera
    from reduced3dgs_tpu.config import OptimizationParams
    from reduced3dgs_tpu.models import gaussians as G
    from reduced3dgs_tpu.parallel.sharded import (
        make_mesh, sharded_train_step, stack_camera_params,
    )
    from reduced3dgs_tpu.train import adam
    from reduced3dgs_tpu.train.trainer import TrainState

    ndev = len(jax.devices())
    if mesh_shapes is None:
        mesh_shapes = [(1, 1)]
        if ndev >= 2:
            mesh_shapes.append((1, 2))
        if ndev >= 4:
            mesh_shapes.append((2, 2))
        if ndev >= 8:
            mesh_shapes.append((2, 4))

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.0, 1.0, (n_prims, 3)).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, (n_prims, 3)).astype(np.float32)
    results = []
    for w in widths:
        h = w
        base_this_width = None
        for (nd, nt) in mesh_shapes:
            pool = G.create_from_pcd(pts, cols, capacity=n_prims)
            state = TrainState(pool, adam.init(pool.params),
                               jax.random.PRNGKey(0))
            cams = [Camera.look_at(
                eye=(np.cos(i), 0.2, -3 + 0.1 * i), target=(0, 0, 0),
                width=w, height=h, uid=i) for i in range(nd)]
            cp = stack_camera_params(cams)
            gts = jnp.zeros((nd, h, w, 3), jnp.float32)
            mesh = make_mesh(nd, nt)
            cfg = OptimizationParams()

            def step(state, it):
                return sharded_train_step(
                    state, cp, gts, jnp.zeros(3), jnp.int32(it),
                    mesh=mesh, width=w, height=h, budget=budget,
                    opt_cfg=cfg, spatial_lr_scale=1.0)

            st, m = step(state, 0)
            jax.block_until_ready(m["loss"])
            t0 = time.perf_counter()
            for i in range(iters):
                st, m = step(st, i + 1)
            jax.block_until_ready(m["loss"])
            dt = (time.perf_counter() - t0) / iters
            pps = nd * w * h / dt  # pixels/s across the whole mesh
            if base_this_width is None:  # first shape of THIS width
                base_this_width = pps / (nd * nt)
            results.append(((nd, nt), pps))
            eff = pps / (base_this_width * nd * nt)
            print(json.dumps({
                "mesh": f"{nd}x{nt}", "width": w,
                "pixels_per_s": round(pps, 1),
                "efficiency_vs_1dev": round(eff, 4),
            }), flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true",
                    help="run the scaling-efficiency benchmark")
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--prims", type=int, default=1 << 15)
    args = ap.parse_args()
    initialize_distributed()
    if args.scaling:
        scaling_bench(widths=(args.width,), n_prims=args.prims)


if __name__ == "__main__":
    main()
