"""Headline benchmark: rasterizer fwd+bwd throughput at 1080p, 1 chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Metric: pixels/s/chip through a full differentiable render (forward +
backward via the Pallas tile kernels + preprocess autodiff), the hot
path of training (SURVEY.md section 3.1).  `vs_baseline` compares
against REF_PIXELS_PER_S, an estimate of the reference CUDA
implementation's fwd+bwd throughput on its README hardware (A6000,
/root/reference/README.md:171): 1080p at ~15 ms/iteration for a
mid-training scene of ~0.5-1M primitives => ~1.4e8 pixels/s.
"""

from __future__ import annotations

import json
import time

import numpy as np

REF_PIXELS_PER_S = 1.4e8
W, H = 1920, 1080
N = 1 << 19  # primitives
BUDGET = 1 << 22  # instance budget


def main():
    import jax
    import jax.numpy as jnp

    from reduced3dgs_tpu.cameras import Camera
    from reduced3dgs_tpu.renderer import render

    rng = np.random.default_rng(0)
    xyz = rng.uniform(-1.5, 1.5, (N, 3)).astype(np.float32)
    feats = np.zeros((N, 16, 3), np.float32)
    feats[:, 0] = rng.uniform(-1.5, 1.5, (N, 3))
    feats[:, 1:] = rng.normal(0, 0.2, (N, 15, 3)).astype(np.float32)
    scales = np.log(rng.uniform(0.004, 0.02, (N, 3))).astype(np.float32)
    rots = rng.normal(0, 1, (N, 4)).astype(np.float32)
    opac = rng.uniform(-2, 3, N).astype(np.float32)
    degrees = np.full(N, 3, np.int32)

    cam = Camera.look_at(eye=(0, 0, -3.6), target=(0, 0, 0), width=W,
                         height=H)
    cp = cam.params()
    bg = jnp.zeros(3)
    target = jnp.zeros((H, W, 3), jnp.float32)

    args = tuple(jnp.asarray(a) for a in (xyz, feats, scales, rots, opac))
    degrees = jnp.asarray(degrees)

    @jax.jit
    def step(xyz, feats, scales, rots, opac):
        def loss(xyz, feats, scales, rots, opac):
            out = render(xyz, feats, scales, rots, opac, degrees, cp, bg,
                         width=W, height=H, instance_budget=BUDGET,
                         backend="pallas")
            return jnp.abs(out.color - target).mean(), out.num_rendered
        (l, nr), g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4),
                                        has_aux=True)(
            xyz, feats, scales, rots, opac)
        return l, nr, g

    # warmup/compile
    l, nr, g = step(*args)
    jax.block_until_ready(g)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        l, nr, g = step(*args)
    jax.block_until_ready(g)
    dt = time.perf_counter() - t0

    pixels_per_s = W * H * iters / dt
    print(json.dumps({
        "metric": "raster_fwd_bwd_1080p",
        "value": round(pixels_per_s, 1),
        "unit": "pixels/s/chip",
        "vs_baseline": round(pixels_per_s / REF_PIXELS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
