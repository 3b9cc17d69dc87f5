"""How does lax.sort cost scale with row count on the chip?

If the cost is superlinear (merge levels ~ log n), splitting the
per-Gaussian reduction sort into independent tile-row-strip sorts wins
the log factor; if linear, strips are pointless.  Each size runs in its
own process (the remote AOT service hangs on large many-op programs).

Run: python experiments/microbench_sortscale.py
"""

import json
import os
import subprocess
import sys
import time


def child(b, ncols):
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    key0 = jnp.asarray(rng.integers(0, 1 << 17, b, dtype=np.int32))
    cols = jnp.asarray(rng.normal(0, 1, (ncols, b)).astype(np.float32))

    def chain(l, x):
        return x + (l * 1e-30).astype(x.dtype)

    def body(l):
        cs = tuple(chain(l, cols[i]) for i in range(ncols))
        srt = jax.lax.sort((chain(l, key0),) + cs, num_keys=1,
                           is_stable=False)
        return sum(c.sum() for c in srt[1:]) if ncols else srt[0].sum() * 1.0

    @jax.jit
    def run(n):
        def f(_, carry):
            return body(carry)
        return jax.lax.fori_loop(0, n, f, body(jnp.float32(0)))

    jax.block_until_ready(run(1))
    t0 = time.perf_counter()
    jax.block_until_ready(run(10))
    print(json.dumps({"b": b, "ncols": ncols,
                      "ms": (time.perf_counter() - t0) / 10 * 1e3}))


def main():
    if os.environ.get("SORTSCALE_CHILD"):
        b, ncols = map(int, os.environ["SORTSCALE_CHILD"].split(","))
        child(b, ncols)
        return
    for b in (139264, 278528, 557056, 1114112, 2228224):
        for ncols in (9,):
            env = dict(os.environ, SORTSCALE_CHILD=f"{b},{ncols}")
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, capture_output=True, text=True,
                               timeout=600)
            line = [ln for ln in r.stdout.splitlines()
                    if ln.startswith("{")]
            print(line[-1] if line else f"b={b} FAILED rc={r.returncode}",
                  flush=True)


if __name__ == "__main__":
    main()
