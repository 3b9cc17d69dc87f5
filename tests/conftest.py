"""Test configuration: force an 8-device virtual CPU mesh.

The environment's axon sitecustomize imports jax at interpreter startup
with JAX_PLATFORMS=axon (real TPU tunnel), so setting the env var here is
too late — use jax.config.update instead, which works post-import as long
as no backend has been initialized yet.  XLA_FLAGS must still be set
before the CPU client is created (it is created lazily at first use).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
