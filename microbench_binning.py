"""Microbenchmark binning ingredients on the real chip."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


B = 1 << 20
P = 1 << 17
rng = np.random.default_rng(0)
tile = jnp.asarray(rng.integers(0, 1024, B).astype(np.int32))
dkey = jnp.asarray(rng.integers(0, 2**30, B).astype(np.int32))
gid = jnp.asarray(rng.integers(0, P, B).astype(np.int32))
pad = jnp.asarray(rng.integers(0, 2, B).astype(np.int32))
rows5 = jnp.asarray(rng.normal(size=(P, 5)).astype(np.float32))
f32 = jnp.asarray(rng.normal(size=B).astype(np.float32))

key64 = (tile.astype(jnp.int64) << 32) | dkey.astype(jnp.int64)

tests = {
    "sort1key_1M": lambda: jax.lax.sort((dkey,), num_keys=1)[0],
    "sort1key_stable_1M": lambda: jax.lax.sort((dkey,), num_keys=1,
                                               is_stable=True)[0],
    "sort2key+1pay_1M": lambda: jax.lax.sort((tile, dkey, gid), num_keys=2,
                                             is_stable=True)[0],
    "sort2key+2pay_1M": lambda: jax.lax.sort((tile, dkey, gid, pad),
                                             num_keys=2, is_stable=True)[0],
    "sort1key+2pay_1M": lambda: jax.lax.sort((dkey, gid, pad), num_keys=1,
                                             is_stable=True)[0],
    "sort64key+2pay_1M": lambda: jax.lax.sort((key64, gid, pad), num_keys=1,
                                              is_stable=True)[0],
    "argsort_1M": lambda: jnp.argsort(dkey),
    "rowgather_1M_x5": lambda: rows5[gid],
    "gather1d_1M": lambda: f32[gid % B],
    "scatter_max_P": lambda: jnp.zeros((B,), jnp.int32).at[gid].max(
        jnp.arange(B, dtype=jnp.int32) % P, mode="drop"),
    "assoc_scan_max_1M": lambda: jax.lax.associative_scan(jnp.maximum, tile),
    "cumsum_1M": lambda: jnp.cumsum(tile),
    "searchsorted_1k_in_1M": lambda: jnp.searchsorted(
        dkey, jnp.arange(1024, dtype=jnp.int32)),
    "searchsorted_1M_in_1k": lambda: jnp.searchsorted(
        jnp.arange(1024, dtype=jnp.int32), tile),
}

for name, fn in tests.items():
    jfn = jax.jit(fn)
    try:
        t = timeit(jfn)
        print(f"{name:28s} {t:8.3f} ms")
    except Exception as e:
        print(f"{name:28s} FAILED {type(e).__name__}: {str(e)[:120]}")
