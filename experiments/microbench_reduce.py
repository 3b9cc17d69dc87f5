"""Microbench: per-Gaussian reduction tail formulations on the chip.

After the reduction sort, the tail is: 9 prefix sums over B_pad + a
boundary pick at the P+1 segment bounds + diffs.  Candidates:

  a) 9 separate (B,) cumsums + stack + row gather from (B+1, 9) [current]
  b) ONE (9, B) axis-1 cumsum + column pick (take axis=1) at bounds
  c) ONE (9, B) axis-1 cumsum + transpose-free diff via two takes
  d) sort cost scaling: one 10-col sort at B vs 17 strip sorts at B/17

Run: python experiments/microbench_reduce.py [B]
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


def loop(body):
    @jax.jit
    def run(n):
        def f(_, carry):
            return body(carry)
        return jax.lax.fori_loop(0, n, f, body(jnp.float32(0)))
    return run


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 2228224
    p = 1 << 17
    rng = np.random.default_rng(0)
    cols = jnp.asarray(rng.normal(0, 1, (9, b)).astype(np.float32))
    zb = jnp.asarray(np.sort(rng.integers(0, b, p + 1)).astype(np.int32))

    def chain(l, x):
        return x + (l * 1e-30).astype(x.dtype)

    def body_a(l):
        cs = [chain(l, cols[i]) for i in range(9)]
        ps = jnp.stack(
            [jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(c)])
             for c in cs], axis=1)  # (B+1, 9)
        v = ps[zb]
        d = v[1:] - v[:-1]
        return d.sum()

    def body_b(l):
        ps = jnp.cumsum(chain(l, cols), axis=1)  # (9, B)
        ps = jnp.concatenate([jnp.zeros((9, 1), jnp.float32), ps], axis=1)
        v = jnp.take(ps, zb, axis=1)  # (9, P+1)
        d = v[:, 1:] - v[:, :-1]
        return d.sum()

    def body_c(l):
        ps = jnp.cumsum(chain(l, cols), axis=1)  # (9, B) inclusive
        hi = jnp.take(ps, jnp.maximum(zb[1:] - 1, 0), axis=1)
        lo = jnp.take(ps, jnp.maximum(zb[:-1] - 1, 0), axis=1)
        d = jnp.where(zb[1:] > 0, hi, 0.0) - jnp.where(zb[:-1] > 0, lo, 0.0)
        return d.sum()

    key0 = jnp.asarray(rng.integers(0, p, b, dtype=np.int32))

    def body_d(l):
        cs = tuple(chain(l, cols[i]) for i in range(9))
        srt = jax.lax.sort((chain(l, key0),) + cs, num_keys=1,
                           is_stable=False)
        return sum(c.sum() for c in srt[1:])

    ns = 17
    bs = b // ns

    def body_e(l):
        tot = jnp.float32(0)
        for s in range(ns):
            cs = tuple(chain(l, cols[i, s * bs:(s + 1) * bs])
                       for i in range(9))
            srt = jax.lax.sort((chain(l, key0[s * bs:(s + 1) * bs]),) + cs,
                               num_keys=1, is_stable=False)
            tot = tot + sum(c.sum() for c in srt[1:])
        return tot

    for name, body in [("a_9cumsum_rowgather", body_a),
                       ("b_1cumsum_take1", body_b),
                       ("c_1cumsum_take2", body_c),
                       ("d_one_big_sort", body_d),
                       ("e_17_strip_sorts", body_e)]:
        ms = timeit(loop(body))
        print(f"{name:24s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
