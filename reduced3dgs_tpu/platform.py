"""Platform selection helper for the CLIs.

The sandboxed environments pin a default JAX backend before user code
runs, ignoring JAX_PLATFORMS; `setup()` honours R3DGS_PLATFORM (e.g.
"cpu" for tests) via jax.config, which still works after import as long
as no backend has been initialized.
"""

from __future__ import annotations

import os


def setup():
    plat = os.environ.get("R3DGS_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
