import time, sys, faulthandler
faulthandler.dump_traceback_later(300, repeat=True, file=sys.stderr)
T0=time.time()
def mark(s): print(f"[{time.time()-T0:8.1f}s] {s}", flush=True)
import jax, jax.numpy as jnp, numpy as np
from reduced3dgs_tpu.cameras import Camera
from reduced3dgs_tpu.renderer import render
w,h = 1920,1080; n=1<<19; budget=1<<22; smin,smax=0.00432,0.0189
rng = np.random.default_rng(0)
xyz = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
feats = np.zeros((n, 16, 3), np.float32)
feats[:, 0] = rng.uniform(-1.5, 1.5, (n, 3))
feats[:, 1:] = rng.normal(0, 0.2, (n, 15, 3)).astype(np.float32)
scales = np.log(rng.uniform(smin, smax, (n, 3))).astype(np.float32)
rots = rng.normal(0, 1, (n, 4)).astype(np.float32)
opac = rng.uniform(-2, 3, n).astype(np.float32)
degrees = np.full(n, 3, np.int32)
cam = Camera.look_at(eye=(0,0,-3.6), target=(0,0,0), width=w, height=h)
cp = cam.params(); bg = np.zeros(3, np.float32)
target = np.zeros((h, w, 3), np.float32)
args = tuple(jnp.asarray(a) for a in (xyz, feats, scales, rots, opac))
jax.block_until_ready(args); mark("data on device")
def one_step(xyz, feats, scales, rots, opac):
    def loss(xyz, feats, scales, rots, opac):
        out = render(xyz, feats, scales, rots, opac, degrees, cp, bg,
                     width=w, height=h, instance_budget=budget,
                     backend="pallas", grad_reduce="bf16x2")
        return jnp.abs(out.color - target).mean(), out.num_rendered
    (l, nr), g = jax.value_and_grad(loss, argnums=(0,1,2,3,4), has_aux=True)(
        xyz, feats, scales, rots, opac)
    return l, nr, g
@jax.jit
def run(n_iters, salt, xyz, feats, scales, rots, opac):
    def body(_, carry):
        l_prev, nr, g = carry
        x2 = xyz + 1e-30 * l_prev
        return one_step(x2, feats, scales, rots, opac)
    init = one_step(xyz + 1e-30 * salt, feats, scales, rots, opac)
    return jax.lax.fori_loop(1, n_iters, body, init)
lowered = run.lower(1, 1.0, *args); mark("lowered")
import concurrent.futures as cf
comp = None
with cf.ThreadPoolExecutor(max_workers=6) as ex:
    for att in range(6):
        t0 = time.time()
        fut = ex.submit(lowered.compile)
        try:
            comp = fut.result(timeout=420)
            mark(f"compiled (attempt {att})"); break
        except cf.TimeoutError:
            mark(f"compile attempt {att} HUNG past 420s; issuing a fresh request")
        except Exception as e:
            mark(f"compile attempt {att} failed after {time.time()-t0:.0f}s: {str(e)[:150]}")
            time.sleep(5)
if comp is None:
    sys.exit(1)
import os
os._exit_after = None
l, nr, g = comp(1, 1.0, *args); jax.block_until_ready(g); mark("warmup")
for salt in (3.0, 4.0, 5.0, 6.0):
    t0=time.perf_counter(); l, nr, g = comp(1, salt, *args); jax.block_until_ready(g)
    if time.perf_counter()-t0 > 0.005: break
for iters, salt in ((20, 9.0), (20, 10.5)):
    t0=time.perf_counter(); l, nr, g = comp(iters, salt, *args); jax.block_until_ready((l,nr,g))
    dt=time.perf_counter()-t0
    mark(f"timed: {dt/iters*1e3:.2f} ms/step, {w*h*iters/dt/1e6:.1f} Mpx/s, nr={int(nr)}")
