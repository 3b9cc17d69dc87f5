"""Golden tests for the geometry core.

The key test re-implements the CUDA/glm math *literally* (column-major
glm matrices, scalar loops — a transcription of forward.cu:162-241 into
numpy) and checks our vectorized jnp versions against it.  This is the
dual-implementation cross-check strategy the reference itself uses
(SURVEY.md section 4).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from reduced3dgs_tpu.ops import transforms as tf
from reduced3dgs_tpu.cameras import Camera


# ---------------------------------------------------------------------------
# Literal glm simulation (column-major 3x3 matrices as numpy [col][row])
# ---------------------------------------------------------------------------

class Glm3:
    """glm::mat3 — stored column-major: m[j] is column j."""

    def __init__(self, cols):
        self.m = np.asarray(cols, dtype=np.float64)  # (3 cols, 3 rows)

    @classmethod
    def from_args(cls, *a):
        assert len(a) == 9
        return cls([a[0:3], a[3:6], a[6:9]])

    def math(self):
        """Return the conventional math matrix M[i][j]."""
        return self.m.T

    def __matmul__(self, other):  # glm operator*: proper math composition
        return Glm3((self.math() @ other.math()).T)

    def T_(self):
        return Glm3(self.math().T.T.T)  # transpose of math matrix, stored back


def glm_compute_cov2d(mean, focal_x, focal_y, tan_fovx, tan_fovy, cov3d, view_flat):
    """Transcription of computeCov2D (forward.cu:162-202)."""
    m = view_flat  # flattened row-major python matrix
    t = np.array([
        m[0] * mean[0] + m[4] * mean[1] + m[8] * mean[2] + m[12],
        m[1] * mean[0] + m[5] * mean[1] + m[9] * mean[2] + m[13],
        m[2] * mean[0] + m[6] * mean[1] + m[10] * mean[2] + m[14],
    ])
    limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
    txtz, tytz = t[0] / t[2], t[1] / t[2]
    t[0] = min(limx, max(-limx, txtz)) * t[2]
    t[1] = min(limy, max(-limy, tytz)) * t[2]

    J = Glm3.from_args(
        focal_x / t[2], 0.0, -(focal_x * t[0]) / (t[2] * t[2]),
        0.0, focal_y / t[2], -(focal_y * t[1]) / (t[2] * t[2]),
        0.0, 0.0, 0.0,
    )
    W = Glm3.from_args(m[0], m[4], m[8], m[1], m[5], m[9], m[2], m[6], m[10])
    T = Glm3(((W.math() @ J.math())).T)
    Vrk = Glm3.from_args(
        cov3d[0], cov3d[1], cov3d[2],
        cov3d[1], cov3d[3], cov3d[4],
        cov3d[2], cov3d[4], cov3d[5],
    )
    cov = Glm3(((T.math().T @ Vrk.math() @ T.math())).T)
    c = cov.math()
    return np.array([c[0, 0] + 0.3, c[1, 0], c[1, 1] + 0.3])


def glm_compute_cov3d(scale, mod, rot):
    """Transcription of computeCov3D (forward.cu:207-241)."""
    r, x, y, z = rot
    # glm::mat3 R constructed column-major from the listed args
    R = Glm3.from_args(
        1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
        2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
        2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
    )
    S = Glm3.from_args(mod * scale[0], 0, 0, 0, mod * scale[1], 0, 0, 0, mod * scale[2])
    M = Glm3((S.math() @ R.math()).T)
    Sigma = M.math().T @ M.math()
    return np.array([Sigma[0, 0], Sigma[0, 1], Sigma[0, 2],
                     Sigma[1, 1], Sigma[1, 2], Sigma[2, 2]])


def random_camera(rng, width=64, height=48):
    eye = rng.normal(size=3) * 3
    eye = eye / max(np.linalg.norm(eye), 0.5) * 3
    return Camera.look_at(eye=eye, target=(0, 0, 0), width=width, height=height)


def test_cov3d_matches_glm():
    rng = np.random.default_rng(0)
    scales = np.abs(rng.normal(size=(32, 3))) * 0.5 + 0.05
    quats = rng.normal(size=(32, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    ours = np.asarray(tf.build_cov3d(jnp.array(scales), jnp.array(quats), 1.0))
    for i in range(32):
        golden = glm_compute_cov3d(scales[i], 1.0, quats[i])
        np.testing.assert_allclose(ours[i], golden, rtol=1e-5, atol=1e-6)


def test_cov2d_matches_glm():
    rng = np.random.default_rng(1)
    cam = random_camera(rng)
    view = cam.world_view_transform
    view_flat = view.flatten()
    focal_x = cam.width / (2 * cam.tan_fovx)
    focal_y = cam.height / (2 * cam.tan_fovy)

    means = rng.normal(size=(64, 3))
    scales = np.abs(rng.normal(size=(64, 3))) * 0.3 + 0.02
    quats = rng.normal(size=(64, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    cov3d = np.asarray(tf.build_cov3d(jnp.array(scales), jnp.array(quats), 1.0))

    t = np.asarray(tf.transform_points_3x3(jnp.array(means, np.float32), jnp.array(view)))
    keep = t[:, 2] > 0.2
    ours = np.asarray(
        tf.compute_cov2d(
            jnp.array(t), focal_x, focal_y, cam.tan_fovx, cam.tan_fovy,
            jnp.array(cov3d), jnp.array(view),
        )
    )
    checked = 0
    for i in range(64):
        if not keep[i]:
            continue
        golden = glm_compute_cov2d(
            means[i], focal_x, focal_y, cam.tan_fovx, cam.tan_fovy,
            cov3d[i], view_flat,
        )
        np.testing.assert_allclose(ours[i], golden, rtol=2e-4, atol=2e-4)
        checked += 1
    assert checked > 10


def test_projection_roundtrip():
    """Project a point at the image center: must land mid-image with
    view-space depth equal to distance along the view axis."""
    cam = Camera.look_at(eye=(0, 0, -5), target=(0, 0, 0), width=100, height=80)
    p = jnp.array([[0.0, 0.0, 0.0]])
    p_hom = tf.transform_points(p, jnp.array(cam.full_proj_transform))
    ndc = p_hom[0, :3] / p_hom[0, 3]
    assert abs(float(ndc[0])) < 1e-5
    assert abs(float(ndc[1])) < 1e-5
    px = tf.ndc2pix(ndc[0], 100)
    assert abs(float(px) - 49.5) < 1e-3
    pv = tf.transform_points_3x3(p, jnp.array(cam.world_view_transform))
    assert abs(float(pv[0, 2]) - 5.0) < 1e-5


def test_quat_rotmat_orthonormal():
    rng = np.random.default_rng(2)
    q = rng.normal(size=(8, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    R = np.asarray(tf.quat_to_rotmat(jnp.array(q)))
    for i in range(8):
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.linalg.det(R[i]), 1.0, atol=1e-6)


def test_world_to_view_inverse():
    rng = np.random.default_rng(3)
    cam = random_camera(rng)
    # camera_center must be the camera position: transforming it to view
    # space gives the origin
    c = cam.camera_center
    v = tf.transform_points_3x3(jnp.array(c[None, :]), jnp.array(cam.world_view_transform))
    np.testing.assert_allclose(np.asarray(v), 0.0, atol=1e-4)


def test_ssim_band_decomposition():
    """ssim_band_sum over a disjoint row cover reproduces ssim exactly
    (the tile-parallel SSIM of parallel/sharded.py)."""
    import jax.numpy as jnp

    from reduced3dgs_tpu.ops.losses import ssim, ssim_band_sum

    rng = np.random.default_rng(3)
    h, w = 37, 29  # deliberately not multiples of the band size
    a = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
    full = float(ssim(a, b))
    for ntile in (1, 2, 3, 4):
        band = -(-h // ntile)
        total = sum(float(ssim_band_sum(a, b, jnp.int32(i * band), band))
                    for i in range(ntile))
        np.testing.assert_allclose(total / (h * w * 3), full, rtol=2e-6)


def test_cov3d_invariant_to_quaternion_scale():
    """The stored quaternion only matters up to scale (the reference
    normalizes in get_rotation/build_rotation before any covariance is
    built); rendering must not treat non-unit quats as extra shape
    freedom — that silently breaks the PLY/quantisation contract."""
    rng = np.random.default_rng(5)
    scales = np.abs(rng.normal(size=(16, 3))) * 0.5 + 0.05
    quats = rng.normal(size=(16, 4))
    a = np.asarray(tf.build_cov3d(jnp.array(scales), jnp.array(quats), 1.0))
    b = np.asarray(tf.build_cov3d(jnp.array(scales),
                                  jnp.array(quats * 2.7), 1.0))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
