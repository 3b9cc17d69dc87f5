#!/usr/bin/env python
"""Batched multi-camera training step measurement (PROFILE.md item 4 /
VERDICT r4 item 9).

The reference trains exactly one random camera per step
(train.py:90-92).  Data parallelism over cameras is this framework's
extra axis: across chips it is the sharded step's "data" mesh axis; on
ONE chip a k-camera batched step renders k views inside one
differentiated graph and applies ONE combined Adam update.  Per-camera
rasterization work (preprocess, binning, kernels, reduction) scales
with k — what the batch amortizes is the step-level P-scale tail
(gradient combine + Adam update + LR schedule) and the launch.

Run: python experiments/multicam_step.py [width height n budget iters]
Prints ms/step for k=1 and k=2 and the per-camera amortization.
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from reduced3dgs_tpu.cameras import Camera
    from reduced3dgs_tpu.ops import binning as binning_ops
    from reduced3dgs_tpu.ops import preprocess as prep_ops
    from reduced3dgs_tpu.ops.tile_render import tile_render

    width, height, n, budget, iters = 1920, 1080, 1 << 19, 1 << 22, 10
    if len(sys.argv) > 1:
        vals = [int(x) for x in sys.argv[1:6]]
        width, height, n, budget, iters = (
            vals + [width, height, n, budget, iters][len(vals):])

    rng = np.random.default_rng(0)
    xyz = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    feats = np.zeros((n, 16, 3), np.float32)
    feats[:, 0] = rng.uniform(-1.5, 1.5, (n, 3))
    feats[:, 1:] = rng.normal(0, 0.2, (n, 15, 3)).astype(np.float32)
    scales = np.log(rng.uniform(0.00432, 0.0189, (n, 3))).astype(
        np.float32)
    rots = rng.normal(0, 1, (n, 4)).astype(np.float32)
    opac = rng.uniform(-2, 3, n).astype(np.float32)
    degrees = np.full(n, 3, np.int32)
    cams = [Camera.look_at(eye=(0.2 * k, 0, -3.6), target=(0, 0, 0),
                           width=width, height=height).params()
            for k in range(2)]
    bg = np.zeros(3, np.float32)
    target = np.zeros((height, width, 3), np.float32)

    def make_step(k):
        cps = cams[:k]

        def step(iters_n, salt, xyz, feats, scales, rots, opac, m, v):
            def loss(xyz, feats, scales, rots, opac):
                total = 0.0
                for cp in cps:
                    prep = prep_ops.preprocess(
                        xyz, scales, rots, opac, feats, degrees, cp)
                    b = binning_ops.bin_gaussians(
                        prep, width, height, budget)
                    color, _, _, _ = tile_render(
                        prep, b, bg, width, height,
                        grad_reduce="bf16x2")
                    total = total + jnp.abs(color - target).mean()
                return total / k

            def body(i, carry):
                xyz, feats, scales, rots, opac, m, v = carry
                l, grads = jax.value_and_grad(
                    loss, argnums=(0, 1, 2, 3, 4))(
                    xyz + salt * 1e-30 * i, feats, scales, rots, opac)
                # one combined Adam-style update (the amortized tail)
                params = (xyz, feats, scales, rots, opac)
                new_p, new_m, new_v = [], [], []
                for p, g, mm, vv in zip(params, grads, m, v):
                    mm = 0.9 * mm + 0.1 * g
                    vv = 0.999 * vv + 0.001 * g * g
                    new_p.append(p - 1e-4 * mm / (jnp.sqrt(vv) + 1e-8))
                    new_m.append(mm)
                    new_v.append(vv)
                return tuple(new_p) + (tuple(new_m), tuple(new_v))

            out = jax.lax.fori_loop(
                0, iters_n, body, (xyz, feats, scales, rots, opac, m, v))
            return out[0]

        return jax.jit(step, static_argnums=())

    args0 = tuple(jnp.asarray(a)
                  for a in (xyz, feats, scales, rots, opac))
    zeros = tuple(jnp.zeros_like(a) for a in args0)
    results = {}
    for k in (1, 2):
        step = make_step(k)
        out = step(1, 1.0, *args0, zeros, zeros)
        float(np.asarray(out)[0, 0])  # host readback drains the tunnel
        best = None
        for salt in (2.0, 3.0, 4.0):
            t0 = time.perf_counter()
            out = step(iters, salt, *args0, zeros, zeros)
            # the tunnel's block_until_ready does not reliably
            # synchronize; a host scalar readback does (PROFILE.md
            # round-4 finding #4)
            float(np.asarray(out)[0, 0])
            dt = (time.perf_counter() - t0) / iters
            if dt > 0.002 and (best is None or dt < best):
                best = dt
        if best is None:
            raise RuntimeError("implausible timing; stale tunnel result")
        results[k] = best
        print(f"k={k}: {best * 1e3:.1f} ms/step "
              f"({best * 1e3 / k:.1f} ms/camera)", flush=True)
    amort = results[1] - results[2] / 2
    print(f"per-camera amortization from 2-view batching: "
          f"{amort * 1e3:.1f} ms ({100 * amort / results[1]:.1f}% of a "
          f"1-camera step)", flush=True)


if __name__ == "__main__":
    main()
