"""Platform selection helper for the CLIs.

The sandboxed environments register a hardware JAX backend in
sitecustomize and set jax_platforms before user code runs, ignoring the
JAX_PLATFORMS env var; `setup()` honours R3DGS_PLATFORM (e.g. "cpu" for
tests) via jax.config.  If some import already initialized the backend
registry (any module-level device array does), the config update alone
is a no-op against jax's cached backends — clear them so the selection
takes effect; arrays created before the clear stay readable.
"""

from __future__ import annotations

import os


def setup():
    plat = os.environ.get("R3DGS_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
        from jax._src import xla_bridge

        if xla_bridge.backends_are_initialized():
            from jax.extend.backend import clear_backends

            clear_backends()
