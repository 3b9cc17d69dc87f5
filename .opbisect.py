import time, sys
T0=time.time()
def mark(s): print(f"[{time.time()-T0:8.1f}s] {s}", flush=True)
import jax, jax.numpy as jnp, numpy as np
import concurrent.futures as cf

B = 4845568  # the hanging b_pad scale
P = 1 << 19

def build(tag, fn, args):
    lowered = jax.jit(fn).lower(*args)
    with cf.ThreadPoolExecutor(max_workers=3) as ex:
        fut = ex.submit(lowered.compile)
        try:
            t0=time.time(); fut.result(timeout=240)
            mark(f"{tag}: compiled in {time.time()-t0:.0f}s")
        except cf.TimeoutError:
            mark(f"{tag}: HUNG past 240s")
        except Exception as e:
            mark(f"{tag}: failed {str(e)[:120]}")

key = jnp.zeros(B, jnp.uint32)
cols = tuple(jnp.zeros(B, jnp.int32) for _ in range(5))
build("u32 key sort (binning)", lambda k: jax.lax.sort(k, is_stable=False), (key,))
build("key+5 payload sort (reduction)",
      lambda k, *c: jax.lax.sort((k,) + c, num_keys=1, is_stable=False),
      (key,) + cols)
tbl = jnp.zeros((P, 9), jnp.float32)
ids = jnp.zeros(B, jnp.int32)
build("row gather (B,9)", lambda t, i: t[i], (tbl, ids))
vals = jnp.zeros(P, jnp.int32)
pos = jnp.zeros(P, jnp.int32)
build("P scatter into B", lambda p_, v: jnp.zeros(B, jnp.int32).at[p_].add(v, mode="drop"), (pos, vals))
x = jnp.zeros(B, jnp.int32)
build("cumsum B", lambda x: jnp.cumsum(x), (x,))
build("assoc max scan B", lambda x: jax.lax.associative_scan(jnp.maximum, x), (x,))
