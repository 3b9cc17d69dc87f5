"""reduced3dgs_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of graphdeco-inria/reduced-3dgs.

Memory-efficient 3D Gaussian Splatting: a differentiable tile-based
rasterizer (Pallas kernels + jax.custom_vjp), resolution-aware redundancy
pruning, adaptive per-primitive SH-band culling, and codebook vector
quantization — designed TPU-first rather than translated from the
reference CUDA implementation (see SURVEY.md).
"""

__version__ = "0.1.0"

from reduced3dgs_tpu.cameras import Camera  # noqa: F401
