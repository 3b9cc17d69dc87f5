"""Device-time breakdown of the bench fwd+bwd loop from a profiler trace.

Runs the same value-chained `lax.fori_loop` of full differentiable
render steps that bench.py times, under `jax.profiler.trace`, then
parses the xplane protobuf and aggregates per-op device time.  This is
how PROFILE.md's numbers are produced: wall-clock through the sandbox's
tunneled TPU runtime includes ~30 ms/launch host dispatch, so only the
trace shows where device time actually goes.

Run: python profile_trace.py [width height n_prims budget iters]
"""

from __future__ import annotations

import glob
import gzip
import os
import sys
import time


def build_step(width, height, n, budget, smin=0.002, smax=0.010):
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
    # host-side (numpy) closure constants: a closed-over jax.Array is
    # embedded into the MLIR module by reading it back through the slow
    # tunnel (minutes per MB) — see bench.py
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
                         grad_reduce=os.environ.get(
                             "R3DGS_GRAD_REDUCE", "f32"))
            return jnp.abs(out.color - target).mean(), out.num_rendered
        (l, nr), g = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3, 4), has_aux=True)(
            xyz, feats, scales, rots, opac)
        return l, nr, g

    @jax.jit
    def run(n_iters, salt, xyz, feats, scales, rots, opac):
        # zero-carry init: the program contains the step exactly ONCE
        # (an init=one_step(...) would duplicate the whole step body)
        zero_g = tuple(jnp.zeros_like(a) for a in
                       (xyz, feats, scales, rots, opac))

        def body(_, carry):
            l_prev, nr, g = carry
            x2 = xyz + 1e-30 * l_prev
            return one_step(x2, feats, scales, rots, opac)

        # salt makes each call's args unique (the tunnel can serve a
        # cached result for a repeated (executable, args) pair)
        init = (salt.astype(jnp.float32) * 1e-6, jnp.int32(0), zero_g)
        return jax.lax.fori_loop(0, n_iters, body, init)

    return run, args


def parse_xspace(logdir, iters):
    """Aggregate device-plane op durations from the trace's xplane.pb."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane.pb found under", logdir)
        return
    raw = open(max(paths, key=os.path.getmtime), "rb").read()
    try:
        raw = gzip.decompress(raw)
    except gzip.BadGzipFile:
        pass
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(raw)
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        evmeta = {m.id: m.name for m in plane.event_metadata.values()}
        print(f"\n== plane: {plane.name} (lines={len(plane.lines)}) ==")
        for line in plane.lines:
            totals = {}
            span_lo, span_hi = None, None
            for ev in line.events:
                name = evmeta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] = totals.get(name, 0) + ev.duration_ps
                lo = ev.offset_ps
                hi = ev.offset_ps + ev.duration_ps
                span_lo = lo if span_lo is None else min(span_lo, lo)
                span_hi = hi if span_hi is None else max(span_hi, hi)
            if not totals:
                continue
            busy = sum(totals.values())
            print(f"\n-- line: {line.name!r} events={len(line.events)} "
                  f"busy={busy / 1e9 / iters:.3f} ms/iter "
                  f"span={(span_hi - span_lo) / 1e9 / iters:.3f} ms/iter --")
            items = sorted(totals.items(), key=lambda kv: -kv[1])
            top = items[:60]
            rest = sum(v for _, v in items[60:])
            for name, ps in top:
                print(f"  {ps / 1e9 / iters:9.3f} ms/iter  {name[:95]}")
            if rest:
                print(f"  {rest / 1e9 / iters:9.3f} ms/iter  (other "
                      f"{len(items) - 60} ops)")


def main():
    import jax

    width, height, n, budget, iters = 512, 512, 1 << 17, 3 << 18, 20
    smin, smax = 0.008, 0.040
    if len(sys.argv) > 1:
        vals = [int(x) for x in sys.argv[1:6]]
        width, height, n, budget, iters = (
            vals + [width, height, n, budget, iters][len(vals):])
    if len(sys.argv) > 6:
        smin, smax = float(sys.argv[6]), float(sys.argv[7])
    run, args = build_step(width, height, n, budget, smin, smax)
    # AOT compile with per-attempt timeouts: the remote compile service
    # intermittently hangs; a fresh request usually succeeds, and the
    # persistent .jax_cache makes later compiles instant.  (AOT also
    # keys the cache identically to bench.py's AOT path — the jit
    # __call__ path compiles under different options and misses.)
    import concurrent.futures as cf
    lowered = run.lower(1, 1.0, *args)
    comp = None
    with cf.ThreadPoolExecutor(max_workers=6) as ex:
        for att in range(5):
            fut = ex.submit(lowered.compile)
            try:
                comp = fut.result(timeout=420)
                break
            except cf.TimeoutError:
                print(f"compile attempt {att} hung; retrying", flush=True)
            except Exception as e:
                print(f"compile attempt {att} failed: {str(e)[:120]}",
                      flush=True)
                time.sleep(5)
    if comp is None:
        raise RuntimeError("remote compile failed/hung after 5 attempts")
    run = comp
    l, nr, g = run(1, 1.0, *args)
    jax.block_until_ready(g)
    # the tunnel can serve an instant stale result for a fresh
    # executable's early calls; burn salts until timings are physical
    for salt in (3.0, 4.0, 5.0, 6.0):
        t0 = time.perf_counter()
        l, nr, g = run(1, salt, *args)
        jax.block_until_ready(g)
        if time.perf_counter() - t0 > 0.005:
            break
    print(f"num_rendered={int(nr)} budget={budget}", flush=True)

    logdir = "/tmp/r3dgs_trace"
    os.system(f"rm -rf {logdir}")
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        l, nr, g = run(iters, 2.0, *args)
        jax.block_until_ready(g)
    dt = time.perf_counter() - t0
    print(f"wall: {dt / iters * 1e3:.2f} ms/iter "
          f"({width * height * iters / dt:,.0f} px/s)", flush=True)
    parse_xspace(logdir, iters)


if __name__ == "__main__":
    main()
