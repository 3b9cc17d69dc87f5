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
# processes makes reruns instant.
_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), ".jax_cache"),
)
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

from reduced3dgs_tpu.cameras import Camera  # noqa: F401
