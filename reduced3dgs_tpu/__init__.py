"""reduced3dgs_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of graphdeco-inria/reduced-3dgs.

Memory-efficient 3D Gaussian Splatting: a differentiable tile-based
rasterizer (Pallas kernels + jax.custom_vjp), resolution-aware redundancy
pruning, adaptive per-primitive SH-band culling, and codebook vector
quantization — designed TPU-first rather than translated from the
reference CUDA implementation (see SURVEY.md).
"""

__version__ = "0.1.0"

import os as _os

# Persistent compilation cache: the sandboxed remote AOT compile service is
# slow and occasionally flaky; caching compiled executables across
# processes makes reruns instant.  NOTE: this jax build does NOT read the
# JAX_COMPILATION_CACHE_DIR environment variable (optional_string_state
# has no env hook), so the directory must be set through jax.config —
# env-only configuration silently leaves the cache uninitialised.
if not _os.environ.get("R3DGS_NO_COMPILE_CACHE"):
    import jax as _jax

    if _jax.config.jax_compilation_cache_dir is None:
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.join(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__))), ".jax_cache"),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        # Cache even small entries: the tunneled AOT service's latency, not
        # executable size, is what reruns pay for.
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from reduced3dgs_tpu.cameras import Camera  # noqa: F401
