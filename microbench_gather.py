"""Microbench: big-gather ns/row vs table bytes/row (VMEM-residency knee).

B_pad-sized gather from a (P, w) table, 1080p bench geometry
(P=524288, B=4.2M), timed inside one fori_loop launch like bench.py.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

P = 524288
B = 4 * 1024 * 1024
ITERS = 30


def bench_gather(w, dtype):
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (P, w)).astype(dtype)
    if dtype == jnp.int32:
        table = jax.random.randint(key, (P, w), 0, 1 << 30, jnp.int32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, P, jnp.int32)

    def step(i, carry):
        t, s = carry
        g = t[(idx + i) % P]  # (B, w) gather
        return t, s + g.sum(dtype=jnp.float32 if dtype != jnp.int32 else jnp.int32).astype(jnp.float32)

    @jax.jit
    def run(t):
        _, s = jax.lax.fori_loop(0, ITERS, step, (t, jnp.float32(0)))
        return s

    run(table).block_until_ready()  # compile
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        run(table).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    per_iter = best / ITERS
    bytes_per_row = w * np.dtype(dtype).itemsize
    print(f"w={w:2d} {np.dtype(dtype).name:8s} table={P*bytes_per_row/1e6:6.1f} MB"
          f"  {per_iter*1e3:7.2f} ms/gather  {per_iter/B*1e9:5.2f} ns/row")


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}  P={P}  B={B}")
    for w, dt in [(9, jnp.float32), (8, jnp.float32), (6, jnp.float32),
                  (5, jnp.int32), (4, jnp.int32), (3, jnp.int32),
                  (2, jnp.int32), (9, jnp.bfloat16), (16, jnp.float32)]:
        bench_gather(w, dt)
