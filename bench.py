"""Headline benchmark: rasterizer fwd+bwd throughput, 1 chip.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"} per
measured configuration, headline (1080p) first, each flushed as soon as
it is measured (the driver records the tail even if the wall clock
kills the process mid-run).

Metric: pixels/s/chip through a full differentiable render (forward +
backward via the Pallas tile kernels + preprocess autodiff), the hot
path of training (SURVEY.md section 3.1).  `vs_baseline` compares
against REF_PIXELS_PER_S, an estimate of the reference CUDA
implementation's fwd+bwd throughput on its README hardware (A6000,
/root/reference/README.md:171): 1080p at ~15 ms/iteration for a
mid-training scene => ~1.4e8 pixels/s.  The synthetic scenes are tuned
to a mid-training depth complexity (~3-6 blended instances per pixel,
what the MipNeRF-360 scenes exhibit mid-run) and the instance budget
exceeds num_rendered, so the renders are complete, not truncated; an
instances/s line is also emitted since instance rate, not pixel rate,
is what the tile rasterizer actually bounds.

The sandbox's remote AOT compile service intermittently hangs on large
fresh programs, so each configuration runs in a watchdog subprocess
with one retry (the persistent compilation cache in .jax_cache makes
retries cheap once any attempt got through).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# Reference-throughput estimate, NOT a measurement (no CUDA hardware in
# this environment).  Derivation: the reference's full_eval wall clock
# (~7 h for 13 scenes x 30k iterations + renders + metrics on an A6000,
# /root/reference/README.md:386) bounds the mean train iteration at
# ~15-25 ms; a mid-training MipNeRF-360 camera is ~2-4 MP, giving
# 1-2.5e8 px/s through fwd+bwd.  1.4e8 is the center of that band;
# treat vs_baseline as having roughly +-40% error bars.
REF_PIXELS_PER_S = 1.4e8

# (width, height, primitives, splat scale range, instance budget, tag)
# HEADLINE (1080p) FIRST: if the wall clock kills the run mid-way, the
# number that matters is already out (round 3 ran smallest-first and a
# timeout left nothing).  Cold compiles now fit easily: host-side jit
# constants cut lowering from ~4 min of tunnel readback to ~3 s, and
# .jax_cache makes later runs compile-free.
# Scales are tuned so the REFERENCE's square-rect binning would emit
# ~2.5-3.1 instances/pixel (mid-training MipNeRF-360 depth complexity);
# our exact tight-rect binning (ops/preprocess.py:binning_extents) bins
# ~78% of that, and the budget is the {2^k, 3*2^(k-1)} ladder step the
# trainer would settle on (75-96% utilised, never truncating).
CONFIGS = [
    (1920, 1080, 1 << 19, (0.00432, 0.0189), 1 << 22, "1080p"),
    (1280, 720, 1 << 19, (0.00392, 0.01715), 1 << 21, "720p"),
    (512, 512, 1 << 17, (0.008, 0.040), 3 << 18, "512p"),
]


def _measure(width, height, n, smin, smax, budget):
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
    scales = np.log(rng.uniform(smin, smax, (n, 3))).astype(np.float32)
    rots = rng.normal(0, 1, (n, 4)).astype(np.float32)
    opac = rng.uniform(-2, 3, n).astype(np.float32)
    # Anything the jitted function CLOSES OVER must stay host-side
    # (numpy): a closed-over jax.Array is embedded as an MLIR constant by
    # READING IT BACK from the device, and the tunneled runtime serves
    # that readback at ~minutes per MB — it was the dominant cost of a
    # cold bench run (4+ of the 5.5 minutes at 512p).
    degrees = np.full(n, 3, np.int32)

    cam = Camera.look_at(eye=(0, 0, -3.6), target=(0, 0, 0), width=width,
                         height=height)
    cp = cam.params()
    bg = np.zeros(3, np.float32)
    target = np.zeros((height, width, 3), np.float32)
    args = tuple(jnp.asarray(a) for a in (xyz, feats, scales, rots, opac))

    def one_step(xyz, feats, scales, rots, opac):
        def loss(xyz, feats, scales, rots, opac):
            out = render(xyz, feats, scales, rots, opac, degrees, cp, bg,
                         width=width, height=height, instance_budget=budget,
                         backend="pallas",
                         grad_reduce="bf16x2")  # the training default
            return jnp.abs(out.color - target).mean(), out.num_rendered
        (l, nr), g = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3, 4), has_aux=True)(
            xyz, feats, scales, rots, opac)
        return l, nr, g

    # The timing loop runs INSIDE one jit: the sandbox's tunneled TPU
    # runtime costs ~30 ms of host dispatch per executable launch (a
    # local runtime costs ~50 us), which would otherwise swamp the
    # device time being measured.  Each iteration is value-chained
    # through the previous loss (numerically a no-op at f32) so XLA
    # cannot hoist the loop-invariant body.  `salt` makes every call's
    # argument contents unique: the tunnel has intermittently served a
    # cached earlier result for a repeated (executable, args) pair,
    # which reads as an impossibly instant timed run.
    @jax.jit
    def run(n_iters, salt, xyz, feats, scales, rots, opac):
        # the loop CARRY seeds the chain (zero grads, salt as the fake
        # previous loss) so the program contains the step exactly ONCE —
        # an `init = one_step(...)` outside the loop would duplicate the
        # whole step body in the executable (2x compile, ~1 ms/step of
        # amortized init-copy ops at 20 iters)
        zero_g = tuple(jnp.zeros_like(a) for a in
                       (xyz, feats, scales, rots, opac))

        def body(_, carry):
            l_prev, nr, g = carry
            x2 = xyz + 1e-30 * l_prev
            return one_step(x2, feats, scales, rots, opac)

        init = (salt.astype(jnp.float32) * 1e-6, jnp.int32(0), zero_g)
        return jax.lax.fori_loop(0, n_iters, body, init)

    # AOT compile with retries: the remote compile service intermittently
    # drops the connection mid-response; the persistent cache in
    # .jax_cache makes a successful compile free on every later run.
    lowered = run.lower(1, 1.0, *args)
    last_err = None
    for _ in range(3):
        try:
            compiled = lowered.compile()
            break
        except Exception as e:  # jax wraps the HTTP error opaquely
            last_err = e
            time.sleep(5)
    else:
        raise last_err

    # Tunnel synchronization quirk (diagnosed round 4): for the FIRST
    # call after an executable is loaded, jax.block_until_ready returns
    # without waiting for remote execution (measured 64 us/step "wall"
    # for a 156 ms/step program); a host READBACK is what actually
    # drains the remote queue.  So: warm up, force a scalar fetch, then
    # time with a readback inside the timed region (~1 ms, amortized
    # over the loop), still guarded against implausible timings.
    l, nr, g = compiled(1, 1.0, *args)
    float(l)  # drain the async remote queue
    iters = 20
    # BEST of 3 plausible timed loops: back-to-back runs of identical
    # code measure +-2.5% apart (tunnel/host jitter leaking into the
    # single long launch), so a single sample systematically
    # under-reports; the minimum is the standard estimator for the
    # machine's capability under one-sided noise.
    best = None
    for attempt in range(4):
        t0 = time.perf_counter()
        l, nr, g = compiled(iters, 2.0 + attempt, *args)
        jax.block_until_ready(g)
        float(l)
        dt = time.perf_counter() - t0
        if dt >= 0.0005 * iters and (best is None or dt < best):
            best = dt
    if best is None:
        raise RuntimeError("implausible timings persisted across "
                           "retries: stale tunnel results")
    return width * height * iters / best, int(nr), best / iters


def main():
    if os.environ.get("R3DGS_BENCH_CHILD"):
        parts = os.environ["R3DGS_BENCH_CHILD"].split(",")
        w, h, n, b = int(parts[0]), int(parts[1]), int(parts[2]), int(parts[3])
        smin = float(parts[4]) if len(parts) > 4 else 0.004
        smax = float(parts[5]) if len(parts) > 5 else 0.02
        pps, nr, step_s = _measure(w, h, n, smin, smax, b)
        print(json.dumps({"pixels_per_s": pps, "num_rendered": nr,
                          "step_s": step_s}))
        return

    results = []
    for width, height, n, (smin, smax), budget, tag in CONFIGS:
        for attempt in range(2):
            env = dict(
                os.environ,
                R3DGS_BENCH_CHILD=f"{width},{height},{n},{budget},"
                                  f"{smin},{smax}")
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env=env, capture_output=True, text=True, timeout=900)
            except subprocess.TimeoutExpired:
                continue
            if r.returncode != 0:
                continue
            try:
                line = [ln for ln in r.stdout.strip().splitlines()
                        if ln.startswith("{")][-1]
                data = json.loads(line)
            except (IndexError, json.JSONDecodeError):
                continue
            pps = data["pixels_per_s"]
            nr = data["num_rendered"]
            results.append((tag, pps, nr, data["step_s"]))
            # overdraw context + instance rate (what the kernel bounds)
            inst_per_s = nr / data["step_s"]
            print(json.dumps({
                "metric": f"raster_fwd_bwd_{tag}",
                "value": round(pps, 1),
                "unit": "pixels/s/chip",
                "vs_baseline": round(pps / REF_PIXELS_PER_S, 4),
                "num_rendered": nr,
                "instances_per_s": round(inst_per_s, 1),
            }), flush=True)
            break
    if not results:
        print(json.dumps({
            "metric": "raster_fwd_bwd_1080p", "value": 0.0,
            "unit": "pixels/s/chip", "vs_baseline": 0.0,
        }), flush=True)


if __name__ == "__main__":
    main()
