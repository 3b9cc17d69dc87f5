#!/usr/bin/env python
"""Is a complex64 scatter one descriptor-cost or two?  (round-4 probe)

The expand step scatters TWO s32 delta columns at the same P positions
into B-sized buffers (~4.3 ms each at 1080p; scatters are
descriptor-bound "regardless of width", PROFILE.md).  If a complex64
scatter (re/im = the two packed deltas, f32-exact for |v| < 2^24) costs
one descriptor, expand drops ~4 ms/step.

Run on the chip: python experiments/microbench_scatter_pack.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B = 5238784
P = 1 << 19


def timed(tag, fn, *args):
    comp = jax.jit(fn).lower(*args).compile()
    r = comp(*args)
    jax.block_until_ready(r)
    float(jnp.sum(jnp.real(r[0]) if jnp.iscomplexobj(r[0]) else r[0]))
    best = 1e9
    for i in range(3):
        t0 = time.perf_counter()
        r = comp(*args)
        jax.block_until_ready(r)
        s = jnp.real(r[0]) if jnp.iscomplexobj(r[0]) else r[0]
        float(jnp.sum(s))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: {best * 1e3:.2f} ms")


def main():
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.integers(0, B, P).astype(np.int32))
    v1 = jnp.asarray(rng.integers(-1000, 1000, P).astype(np.int32))
    v2 = jnp.asarray(rng.integers(-1000, 1000, P).astype(np.int32))

    def two_s32(pos, v1, v2):
        a = jnp.zeros(B, jnp.int32).at[pos].add(v1, mode="drop")
        b = jnp.zeros(B, jnp.int32).at[pos].add(v2, mode="drop")
        return a, b

    def one_c64(pos, v1, v2):
        z = v1.astype(jnp.float32) + 1j * v2.astype(jnp.float32)
        return (jnp.zeros(B, jnp.complex64).at[pos].add(
            z.astype(jnp.complex64), mode="drop"),)

    def one_s32(pos, v1):
        return (jnp.zeros(B, jnp.int32).at[pos].add(v1, mode="drop"),)

    timed("one s32 scatter ", one_s32, pos, v1)
    timed("two s32 scatters", two_s32, pos, v1, v2)
    timed("one c64 scatter ", one_c64, pos, v1, v2)


if __name__ == "__main__":
    main()
