"""Microbench: per-Gaussian gradient reduction formulations on the chip.

The backward's segment reduction sorts 9 f32 gradient columns by an s32
primitive-id key (~13.5 ms/step at the 512p bench config, the single
largest device-time item, profile_trace.py).  Candidates:

  a) multi-payload sort: lax.sort(key + 9 cols)          [current]
  b) permutation sort (key, iota) + ONE (B,9) row gather
  c) permutation sort + gather of a (B,16) row matrix (the backward
     kernel's native feature width; avoids slicing to 9 first)
  d) sort only the key (lower bound for any sort-based scheme)

Each timed inside one jit'd fori_loop (the tunneled runtime costs
~30 ms per launch).  Run: python experiments/microbench_sort.py [B_pad]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, iters=10):
    out = fn(1)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(iters)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 2228224
    p = 1 << 17
    rng = np.random.default_rng(0)
    key0 = jnp.asarray(rng.integers(0, p, b, dtype=np.int32))
    cols = jnp.asarray(rng.normal(0, 1, (b, 16)).astype(np.float32))

    def chain(l, x):
        return x + (l * 1e-30).astype(x.dtype)

    def loop(body):
        @jax.jit
        def run(n):
            def f(_, carry):
                return body(carry)
            return jax.lax.fori_loop(0, n, f, body(jnp.float32(0)))
        return run

    def body_a(l):
        cs = tuple(chain(l, cols[:, i]) for i in range(9))
        srt = jax.lax.sort((chain(l, key0).astype(jnp.int32),) + cs,
                           num_keys=1, is_stable=False)
        return sum(c.sum() for c in srt[1:])

    def body_b(l):
        iota = jnp.arange(b, dtype=jnp.int32)
        k, perm = jax.lax.sort(
            (chain(l, key0).astype(jnp.int32), iota), num_keys=1,
            is_stable=False)
        g = chain(l, cols[:, :9])[perm]
        return g.sum()

    def body_c(l):
        iota = jnp.arange(b, dtype=jnp.int32)
        k, perm = jax.lax.sort(
            (chain(l, key0).astype(jnp.int32), iota), num_keys=1,
            is_stable=False)
        g = chain(l, cols)[perm]
        return g[:, :9].sum()

    def body_d(l):
        srt = jax.lax.sort(chain(l, key0).astype(jnp.int32))
        return srt.sum().astype(jnp.float32)

    for name, body in [("a_multi_payload_sort", body_a),
                       ("b_perm_sort+gather9", body_b),
                       ("c_perm_sort+gather16", body_c),
                       ("d_key_only_sort", body_d)]:
        ms = timeit(loop(body))
        print(f"{name:24s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
