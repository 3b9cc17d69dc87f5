"""Headline benchmark: rasterizer fwd+bwd throughput, 1 chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Metric: pixels/s/chip through a full differentiable render (forward +
backward via the Pallas tile kernels + preprocess autodiff), the hot
path of training (SURVEY.md section 3.1).  `vs_baseline` compares
against REF_PIXELS_PER_S, an estimate of the reference CUDA
implementation's fwd+bwd throughput on its README hardware (A6000,
/root/reference/README.md:171): 1080p at ~15 ms/iteration for a
mid-training scene => ~1.4e8 pixels/s.

The sandbox's remote AOT compile service intermittently hangs on large
fresh programs, so the measurement runs in a watchdog subprocess with
one retry per configuration and a resolution fallback (the persistent
compilation cache in .jax_cache makes retries cheap once any attempt
got through).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REF_PIXELS_PER_S = 1.4e8

# (width, height, primitives, instance budget, metric suffix)
CONFIGS = [
    (1920, 1080, 1 << 19, 1 << 22, "1080p"),
    (1280, 720, 1 << 19, 1 << 21, "720p"),
    (512, 512, 1 << 17, 1 << 20, "512p"),
]


def _measure(width, height, n, budget):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from reduced3dgs_tpu.cameras import Camera
    from reduced3dgs_tpu.renderer import render

    rng = np.random.default_rng(0)
    xyz = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    feats = np.zeros((n, 16, 3), np.float32)
    feats[:, 0] = rng.uniform(-1.5, 1.5, (n, 3))
    feats[:, 1:] = rng.normal(0, 0.2, (n, 15, 3)).astype(np.float32)
    scales = np.log(rng.uniform(0.004, 0.02, (n, 3))).astype(np.float32)
    rots = rng.normal(0, 1, (n, 4)).astype(np.float32)
    opac = rng.uniform(-2, 3, n).astype(np.float32)
    degrees = np.full(n, 3, np.int32)

    cam = Camera.look_at(eye=(0, 0, -3.6), target=(0, 0, 0), width=width,
                         height=height)
    cp = cam.params()
    bg = jnp.zeros(3)
    target = jnp.zeros((height, width, 3), jnp.float32)
    args = tuple(jnp.asarray(a) for a in (xyz, feats, scales, rots, opac))
    degrees = jnp.asarray(degrees)

    @jax.jit
    def step(xyz, feats, scales, rots, opac):
        def loss(xyz, feats, scales, rots, opac):
            out = render(xyz, feats, scales, rots, opac, degrees, cp, bg,
                         width=width, height=height, instance_budget=budget,
                         backend="pallas")
            return jnp.abs(out.color - target).mean(), out.num_rendered
        (l, nr), g = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3, 4), has_aux=True)(
            xyz, feats, scales, rots, opac)
        return l, nr, g

    l, nr, g = step(*args)
    jax.block_until_ready(g)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        l, nr, g = step(*args)
    jax.block_until_ready(g)
    dt = time.perf_counter() - t0
    return width * height * iters / dt, int(nr)


def main():
    if os.environ.get("R3DGS_BENCH_CHILD"):
        w, h, n, b = (int(x) for x in
                      os.environ["R3DGS_BENCH_CHILD"].split(","))
        pps, nr = _measure(w, h, n, b)
        print(json.dumps({"pixels_per_s": pps, "num_rendered": nr}))
        return

    for width, height, n, budget, tag in CONFIGS:
        for attempt in range(2):
            env = dict(os.environ,
                       R3DGS_BENCH_CHILD=f"{width},{height},{n},{budget}")
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env=env, capture_output=True, text=True, timeout=1500)
            except subprocess.TimeoutExpired:
                continue
            if r.returncode == 0:
                try:
                    line = [ln for ln in r.stdout.strip().splitlines()
                            if ln.startswith("{")][-1]
                    data = json.loads(line)
                except (IndexError, json.JSONDecodeError):
                    continue
                pps = data["pixels_per_s"]
                print(json.dumps({
                    "metric": f"raster_fwd_bwd_{tag}",
                    "value": round(pps, 1),
                    "unit": "pixels/s/chip",
                    "vs_baseline": round(pps / REF_PIXELS_PER_S, 4),
                }))
                return
    print(json.dumps({
        "metric": "raster_fwd_bwd_1080p", "value": 0.0,
        "unit": "pixels/s/chip", "vs_baseline": 0.0,
    }))


if __name__ == "__main__":
    main()
