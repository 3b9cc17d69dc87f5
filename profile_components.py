"""Component-level timing of the render fwd+bwd path on the real chip.

Times preprocess / binning / pallas-forward / full fwd+bwd separately so
PROFILE.md can attribute the throughput gap (VERDICT round 1, item 3).
Run: python profile_components.py [width height n_prims budget]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from reduced3dgs_tpu.cameras import Camera
from reduced3dgs_tpu.ops import binning as binning_mod
from reduced3dgs_tpu.ops import preprocess as prep_mod
from reduced3dgs_tpu.ops.tile_render import tile_render
from reduced3dgs_tpu.renderer import render


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    width, height, n, budget = 512, 512, 1 << 17, 1 << 20
    if len(sys.argv) > 1:
        width, height, n, budget = (int(x) for x in sys.argv[1:5])

    rng = np.random.default_rng(0)
    xyz = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    feats = np.zeros((n, 16, 3), np.float32)
    feats[:, 0] = rng.uniform(-1.5, 1.5, (n, 3))
    feats[:, 1:] = rng.normal(0, 0.2, (n, 15, 3)).astype(np.float32)
    scales = np.log(rng.uniform(0.004, 0.02, (n, 3))).astype(np.float32)
    rots = rng.normal(0, 1, (n, 4)).astype(np.float32)
    opac = rng.uniform(-2, 3, n).astype(np.float32)
    degrees = np.full(n, 3, np.int32)
    cam = Camera.look_at(eye=(0, 0, -3.6), target=(0, 0, 0),
                         width=width, height=height)
    cp = cam.params()
    bg = jnp.zeros(3)
    target = jnp.zeros((height, width, 3), jnp.float32)
    args = tuple(jnp.asarray(a) for a in
                 (xyz, feats, scales, rots, opac, degrees))

    @jax.jit
    def do_prep(xyz, feats, scales, rots, opac, degrees):
        return prep_mod.preprocess(xyz, scales, rots, opac, feats, degrees,
                                   cp)

    @jax.jit
    def do_bin(xyz, feats, scales, rots, opac, degrees):
        prep = prep_mod.preprocess(xyz, scales, rots, opac, feats, degrees,
                                   cp)
        return binning_mod.bin_gaussians(prep, width, height, budget)

    @jax.jit
    def do_fwd(xyz, feats, scales, rots, opac, degrees):
        out = render(xyz, feats, scales, rots, opac, degrees, cp, bg,
                     width=width, height=height,
                     instance_budget=budget, backend="pallas")
        return out.color, out.num_rendered

    @jax.jit
    def do_step(xyz, feats, scales, rots, opac):
        def loss(*p):
            out = render(*p, degrees, cp, bg, width=width, height=height,
                         instance_budget=budget, backend="pallas")
            return jnp.abs(out.color - target).mean(), out.num_rendered
        (l, nr), g = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3, 4), has_aux=True)(
            xyz, feats, scales, rots, opac)
        return l, nr, g

    p5 = args[:5]
    px = width * height
    print(f"config {width}x{height} n={n} budget={budget}", flush=True)
    t_prep = timeit(do_prep, *args)
    print(f"preprocess        {t_prep:8.2f} ms", flush=True)
    t_bin = timeit(do_bin, *args)
    print(f"prep+binning      {t_bin:8.2f} ms  (binning ~{t_bin-t_prep:.2f})",
          flush=True)
    t_fwd = timeit(do_fwd, *args)
    _, nr = do_fwd(*args)
    nr = int(nr)
    print(f"full forward      {t_fwd:8.2f} ms  (pallas fwd ~{t_fwd-t_bin:.2f})"
          f"  num_rendered={nr} (trunc={nr > budget})", flush=True)
    t_step = timeit(do_step, *p5)
    print(f"fwd+bwd step      {t_step:8.2f} ms  (bwd ~{t_step-t_fwd:.2f})",
          flush=True)
    print(f"throughput        {px / (t_step/1e3):,.0f} px/s", flush=True)


if __name__ == "__main__":
    main()
