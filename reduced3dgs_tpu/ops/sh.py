"""Spherical-harmonics evaluation (JAX).

Implements real SH bands 0..3 with the constants used by 3D Gaussian
Splatting (reference: /root/reference/utils/sh_utils.py:26-50 and
cuda_rasterizer/auxiliary.h:22-39).  On TPU we always evaluate all 16
coefficients densely and mask by the per-primitive degree — branching per
primitive (as the CUDA kernel does) would defeat the vector unit, whereas
a (P, 16) banded mask is a single fused multiply.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)

# Number of coefficients at degree d (inclusive): (d+1)^2
NUM_COEFFS = {0: 1, 1: 4, 2: 9, 3: 16}

# For coefficient index c (0..15), the band it belongs to.  numpy, not
# jnp: a module-level device array would initialize the JAX backend at
# import time, before the CLIs' platform.setup() can pin jax_platforms
# (the sandbox registers a hardware backend in sitecustomize).
_COEFF_BAND = np.array([0] + [1] * 3 + [2] * 5 + [3] * 7, dtype=np.int32)


def rgb_to_sh(rgb):
    """RGB in [0,1] -> DC SH coefficient (reference utils/sh_utils.py:115)."""
    return (rgb - 0.5) / SH_C0


def sh_to_rgb(sh):
    return sh * SH_C0 + 0.5


def sh_basis(dirs):
    """Evaluate the 16 SH basis functions at unit directions.

    Args:
      dirs: (..., 3) unit direction vectors.
    Returns:
      (..., 16) basis values, ordered as in the reference
      (auxiliary.h constants / forward.cu:105-151).
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    one = jnp.ones_like(x)
    return jnp.stack(
        [
            SH_C0 * one,
            -SH_C1 * y,
            SH_C1 * z,
            -SH_C1 * x,
            SH_C2[0] * xy,
            SH_C2[1] * yz,
            SH_C2[2] * (2.0 * zz - xx - yy),
            SH_C2[3] * xz,
            SH_C2[4] * (xx - yy),
            SH_C3[0] * y * (3.0 * xx - yy),
            SH_C3[1] * xy * z,
            SH_C3[2] * y * (4.0 * zz - xx - yy),
            SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SH_C3[4] * x * (4.0 * zz - xx - yy),
            SH_C3[5] * z * (xx - yy),
            SH_C3[6] * x * (xx - 3.0 * yy),
        ],
        axis=-1,
    )


def degree_mask(degrees, num_coeffs=16):
    """(P,) int degrees -> (P, num_coeffs) float mask enabling coefficients
    whose band <= degree (the TPU replacement for per-primitive branching in
    forward.cu:118-150)."""
    return (_COEFF_BAND[None, :num_coeffs] <= degrees[:, None]).astype(jnp.float32)


def eval_sh_color(sh, dirs, degrees):
    """SH -> raw RGB (before +0.5 offset and clamping).

    Args:
      sh: (P, 16, 3) SH coefficients (band-major, matching the reference's
          (N, max_coeffs, 3) layout of features = cat(f_dc, f_rest)).
      dirs: (P, 3) unit view directions (mean - campos, normalized).
      degrees: (P,) int32 per-primitive active SH degree (0..3).
    Returns:
      (P, 3) color before the 0.5 shift (reference forward.cu:105-151).
    """
    c = sh.shape[-2]  # may be < 16 for a packed ragged band (variable_sh)
    basis = sh_basis(dirs)[..., :c]  # (P, C)
    masked = basis * degree_mask(degrees, c)  # (P, C)
    # Elementwise multiply + reduce (VPU, full f32) rather than a 16-wide
    # batched matmul that would hit the MXU at bf16 default precision.
    return (masked[..., None] * sh).sum(axis=-2)


def eval_sh_color_clamped(sh, dirs, degrees):
    """Full forward color: + 0.5 shift and clamp to >= 0.

    The clamp's autodiff (zero gradient where clamped) matches the
    reference's explicit `clamped` bookkeeping (forward.cu:153-158,
    backward.cu:30-34).
    """
    rgb = eval_sh_color(sh, dirs, degrees) + 0.5
    return jnp.maximum(rgb, 0.0)


def eval_sh_color_per_degree(sh, dirs, degrees, max_degree=3):
    """Colors at each cumulative degree 0..max_degree, clamped at each stage.

    Used by adaptive SH-band culling (reference reduced_3dgs/sh_culling.cu:6-57):
    the running `result` is NOT clamped between stages; only each emitted
    color is.  Entries above a primitive's own degree stay 0, matching the
    CUDA kernel's early return into a zero-initialized buffer.

    Returns: (P, max_degree+1, 3).
    """
    basis = sh_basis(dirs)  # (P, 16)
    terms = basis[..., None] * sh  # (P, 16, 3) per-coeff terms
    outs = []
    running = terms[:, 0, :] + 0.5
    outs.append(jnp.maximum(running, 0.0))
    bounds = [1, 4, 9, 16]
    for d in range(1, max_degree + 1):
        running = running + terms[:, bounds[d - 1] : bounds[d], :].sum(axis=1)
        outs.append(jnp.maximum(running, 0.0))
    stacked = jnp.stack(outs, axis=1)  # (P, D+1, 3)
    deg_ok = (
        jnp.arange(max_degree + 1, dtype=jnp.int32)[None, :] <= degrees[:, None]
    )
    return stacked * deg_ok[..., None].astype(stacked.dtype)
