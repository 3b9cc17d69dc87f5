"""Camera / covariance geometry (JAX).

All matrices follow the reference's row-vector convention: a homogeneous
point transforms as ``p_out = p_hom @ M`` where ``M`` is the transposed
world-view / full-projection matrix stored by the reference Camera
(scene/cameras.py:54-57).  Keeping the convention means PLY/JSON/ckpt
interchange and the EWA math line up bit-for-bit with the CUDA kernels.

Everything here is pure jnp and differentiable; JAX autodiff through these
functions reproduces the hand-written CUDA backward (backward.cu:177-434),
including the zero-gradient clamp masks, via jnp.clip/maximum semantics.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Host-side (numpy) camera matrix construction
# ---------------------------------------------------------------------------

def world_to_view(R, t, translate=(0.0, 0.0, 0.0), scale=1.0):
    """World->view 4x4 (numpy), reference utils/graphics_utils.py:38-49.

    R is the camera-to-world rotation (COLMAP convention), t the
    world-to-camera translation.
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = np.asarray(R).T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    C2W = np.linalg.inv(Rt)
    C2W[:3, 3] = (C2W[:3, 3] + np.asarray(translate)) * scale
    return np.linalg.inv(C2W).astype(np.float32)


def projection_matrix(znear, zfar, fov_x, fov_y):
    """OpenGL-style projection with z in [0,1] (graphics_utils.py:51-71)."""
    tan_y = math.tan(fov_y / 2)
    tan_x = math.tan(fov_x / 2)
    top = tan_y * znear
    right = tan_x * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def fov2focal(fov, pixels):
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal, pixels):
    return 2 * math.atan(pixels / (2 * focal))


# ---------------------------------------------------------------------------
# Device-side (jnp) transforms
# ---------------------------------------------------------------------------

def transform_points(xyz, M):
    """(P,3) @ transposed 4x4 -> homogeneous (P,4). p_hom = (p,1) @ M,
    the jnp equivalent of transformPoint4x4 (auxiliary.h:68-77)."""
    return xyz @ M[:3, :] + M[3, :]


def transform_points_3x3(xyz, M):
    """Affine part only: (p,1) @ M[:, :3] (auxiliary.h:58-66)."""
    return xyz @ M[:3, :3] + M[3, :3]


def quat_to_rotmat(q):
    """Batched quaternion (r, x, y, z) -> (.., 3, 3) rotation matrices.

    Row/column layout matches the reference build_rotation
    (utils/general_utils.py:78-100).  NOTE: does NOT normalize; callers
    normalize (the reference always feeds unit quaternions — its CUDA
    computeCov3D receives pre-normalized get_rotation, forward.cu:216).
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
            2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
            2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def normalize(v, axis=-1, eps=0.0):
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    if eps:
        n = jnp.maximum(n, eps)
    return v / n


def build_cov3d(scales, rotations, scale_modifier=1.0):
    """Per-primitive 3D covariance, packed symmetric (P, 6).

    Sigma = R diag(s^2) R^T, matching computeCov3D (forward.cu:207-241):
    the glm code's ``transpose(S*R) * (S*R)`` with glm's column-major
    constructor resolves to exactly this (verified against a literal glm
    transcription in tests/test_transforms.py), and it equals the Python
    activation ``L = R @ S; Sigma = L L^T`` (utils/general_utils.py:102-110,
    scene/gaussian_model.py:50-54).  `rotations` are NORMALIZED here:
    the reference normalizes everywhere upstream of its kernels
    (get_rotation / build_rotation, gaussian_model.py:93,
    general_utils.py:78-87), and every PLY consumer (quantisation,
    SIBR viewers) assumes the raw stored quaternion only matters up to
    scale.  Rendering the raw quaternion unnormalized lets training
    exploit non-unit quats as extra shape freedom, which silently
    breaks that contract (a normalized re-encode of the same model
    then renders differently).

    Packing order: (xx, xy, xz, yy, yz, zz).
    """
    rotations = normalize(rotations, eps=1e-12)
    R = quat_to_rotmat(rotations)  # (P,3,3)
    s = scale_modifier * scales  # (P,3)
    M = R * s[..., None, :]  # R @ diag(s): column j scaled by s_j
    # Explicit elementwise products: stays on the VPU in full f32 (a
    # 3-wide einsum would hit the MXU at bf16 default precision).
    m0, m1, m2 = M[:, 0, :], M[:, 1, :], M[:, 2, :]
    return jnp.stack(
        [
            (m0 * m0).sum(-1), (m0 * m1).sum(-1), (m0 * m2).sum(-1),
            (m1 * m1).sum(-1), (m1 * m2).sum(-1), (m2 * m2).sum(-1),
        ],
        axis=-1,
    )


def unpack_cov3d(cov6):
    """(P,6) packed symmetric -> (P,3,3)."""
    c = cov6
    row0 = jnp.stack([c[:, 0], c[:, 1], c[:, 2]], axis=-1)
    row1 = jnp.stack([c[:, 1], c[:, 3], c[:, 4]], axis=-1)
    row2 = jnp.stack([c[:, 2], c[:, 4], c[:, 5]], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def compute_cov2d(t, focal_x, focal_y, tan_fovx, tan_fovy, cov3d6, viewmatrix):
    """EWA 2D covariance (P, 3) = (cov_xx, cov_xy, cov_yy).

    Follows computeCov2D (forward.cu:162-202): view-space clamp of t.x/t.y
    to +-1.3*tan_fov (whose autodiff zeroes the gradient outside — the
    x_grad_mul/y_grad_mul masks of backward.cu:208-209), the perspective
    Jacobian, and the +0.3 screen-space low-pass.

    In the glm code ``cov = T^t Vrk T`` with ``T = W J`` computed in glm's
    column-major storage; unrolled to math-major layout that is equivalent to
      U = J_p @ W_p,   cov2d = U @ Sigma @ U^T
    with J_p the 2x3 perspective Jacobian and W_p the world->view rotation
    (viewmatrix[:3,:3]^T in our row-vector convention); verified against a
    literal glm re-implementation in tests/test_transforms.py.

    Takes the view-space point `t = transform_points_3x3(mean, view)` so the
    caller can substitute a safe value for culled primitives (t.z near zero
    would otherwise emit NaNs that poison gradients through jnp.where).
    """
    tz = t[:, 2]
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tx = jnp.clip(t[:, 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[:, 1] / tz, -limy, limy) * tz

    # J_p: 2x3 perspective Jacobian rows (per primitive)
    inv_tz = 1.0 / tz
    inv_tz2 = inv_tz * inv_tz
    J00 = focal_x * inv_tz
    J02 = -focal_x * tx * inv_tz2
    J11 = focal_y * inv_tz
    J12 = -focal_y * ty * inv_tz2

    W = viewmatrix[:3, :3]  # rows of W are world->view rotation rows^T; see note
    # U = J_p @ W_p where W_p = viewmatrix[:3,:3]^T read in math layout.
    # Row 0 of U: J00 * W_p[0,:] + J02 * W_p[2,:]
    Wp = W.T  # (3,3)
    U0 = J00[:, None] * Wp[0][None, :] + J02[:, None] * Wp[2][None, :]  # (P,3)
    U1 = J11[:, None] * Wp[1][None, :] + J12[:, None] * Wp[2][None, :]  # (P,3)

    # Quadratic forms as explicit elementwise ops (VPU, full f32).
    Sigma = unpack_cov3d(cov3d6)  # (P,3,3)
    S_U0 = (Sigma * U0[:, None, :]).sum(-1)  # (P,3)
    S_U1 = (Sigma * U1[:, None, :]).sum(-1)
    cov_xx = (U0 * S_U0).sum(-1) + 0.3
    cov_xy = (U0 * S_U1).sum(-1)
    cov_yy = (U1 * S_U1).sum(-1) + 0.3
    return jnp.stack([cov_xx, cov_xy, cov_yy], axis=-1)


def ndc2pix(v, size):
    """NDC [-1,1] -> continuous pixel coordinate (auxiliary.h:41-44)."""
    return ((v + 1.0) * size - 1.0) * 0.5
