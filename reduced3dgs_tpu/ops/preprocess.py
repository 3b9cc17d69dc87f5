"""Per-Gaussian preprocessing (JAX, fully differentiable).

The TPU replacement for preprocessCUDA (reference forward.cu:353-456) and —
via JAX autodiff — for BACKWARD::preprocess / computeCov2DCUDA
(backward.cu:177-434).  Everything is vectorized over the primitive axis;
culled primitives are masked (radius 0 / 0 tiles touched) instead of
early-returning, which keeps shapes static for XLA.

Activation placement: the reference rasterizer applies sigmoid(opacity_raw)
inside the kernel (forward.cu:414) and its chain rule in the backward
(backward.cu:433); here the sigmoid lives in this differentiable jnp layer —
mathematically identical, and autodiff provides the s*(1-s) factor.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from reduced3dgs_tpu.ops import sh as sh_ops
from reduced3dgs_tpu.ops import transforms as tf

TILE_X = 16
TILE_Y = 16


class CameraParams(NamedTuple):
    """Static-shape camera bundle (all jnp arrays / floats)."""

    viewmatrix: jnp.ndarray  # (4,4) transposed world->view
    projmatrix: jnp.ndarray  # (4,4) transposed full (view @ proj)
    campos: jnp.ndarray  # (3,)
    tan_fovx: jnp.ndarray  # scalar
    tan_fovy: jnp.ndarray  # scalar
    width: int  # static
    height: int  # static


class PreprocessOut(NamedTuple):
    means2d: jnp.ndarray  # (P,2) pixel-space centers
    depths: jnp.ndarray  # (P,) view-space z
    conic: jnp.ndarray  # (P,3) inverse 2D covariance (xx, xy, yy)
    opacity: jnp.ndarray  # (P,) activated opacity
    color: jnp.ndarray  # (P,3) RGB from SH
    radii: jnp.ndarray  # (P,) int32 pixel radius (0 = culled)
    rect_min: jnp.ndarray  # (P,2) int32 tile rect (x,y) inclusive
    rect_max: jnp.ndarray  # (P,2) int32 tile rect (x,y) exclusive
    tiles_touched: jnp.ndarray  # (P,) int32


def tile_grid(width: int, height: int):
    return ( (width + TILE_X - 1) // TILE_X, (height + TILE_Y - 1) // TILE_Y )


def get_rect(point_image, radius, grid_x: int, grid_y: int):
    """Tile rectangle covered by a splat (auxiliary.h:46-56).

    radius may be float (ceil already applied); casts truncate toward zero
    exactly as the CUDA int casts do for the non-negative clamped operands.
    """
    rmin_x = jnp.clip(((point_image[:, 0] - radius) / TILE_X).astype(jnp.int32), 0, grid_x)
    rmin_y = jnp.clip(((point_image[:, 1] - radius) / TILE_Y).astype(jnp.int32), 0, grid_y)
    rmax_x = jnp.clip(((point_image[:, 0] + radius + TILE_X - 1) / TILE_X).astype(jnp.int32), 0, grid_x)
    rmax_y = jnp.clip(((point_image[:, 1] + radius + TILE_Y - 1) / TILE_Y).astype(jnp.int32), 0, grid_y)
    return jnp.stack([rmin_x, rmin_y], axis=-1), jnp.stack([rmax_x, rmax_y], axis=-1)


def preprocess(
    means3d,
    scales_raw,
    rotations_raw,
    opacities_raw,
    sh,
    degrees,
    cam: CameraParams,
    *,
    alive_mask=None,
    scale_modifier=1.0,
    color_precomp=None,
    cov3d_precomp=None,
    activate_scales=True,
    screen_offset=None,
):
    """Project + cull + shade all primitives.

    Args mirror the reference rasterizer inputs (rasterize_points.cu:136-222)
    but take RAW parameters; activations (exp scales, sigmoid opacity,
    normalized quats for cov — the reference normalizes in the Python
    activation and the kernel uses the quat as-is, forward.cu:216) happen
    here inside the differentiable graph.

    degrees: (P,) int32 per-primitive SH degree.
    alive_mask: optional (P,) bool; dead pool slots are culled.
    """
    P = means3d.shape[0]
    grid_x, grid_y = tile_grid(cam.width, cam.height)
    focal_x = cam.width / (2.0 * cam.tan_fovx)
    focal_y = cam.height / (2.0 * cam.tan_fovy)

    # --- frustum cull (auxiliary.h:139-159): view z > 0.2
    p_view = tf.transform_points_3x3(means3d, cam.viewmatrix)
    depths = p_view[:, 2]
    in_front = depths > 0.2
    live = in_front if alive_mask is None else (in_front & alive_mask)

    # Masked lanes get a harmless substitute point: prevents NaNs (0/0,
    # 1/tz) in culled lanes from poisoning gradients via jnp.where.
    safe = live[:, None]
    t_safe = jnp.where(safe, p_view, jnp.array([0.0, 0.0, 1.0], p_view.dtype))

    # --- project to NDC then pixels (forward.cu:395-398)
    p_hom = tf.transform_points(means3d, cam.projmatrix)
    p_w = 1.0 / jnp.where(live, p_hom[:, 3] + 1e-7, 1.0)
    p_proj = p_hom[:, :3] * p_w[:, None]
    mean2d = jnp.stack(
        [tf.ndc2pix(p_proj[:, 0], cam.width), tf.ndc2pix(p_proj[:, 1], cam.height)],
        axis=-1,
    )
    if screen_offset is not None:
        # Zero-valued hook whose cotangent is dL/dmean2d — the JAX
        # equivalent of the reference's screenspace_points grad capture
        # (gaussian_renderer/__init__.py:27-31) used for densification.
        mean2d = mean2d + screen_offset

    # --- covariances
    if activate_scales:
        scales = jnp.exp(scales_raw)
    else:
        scales = scales_raw
    if cov3d_precomp is None:
        cov3d = tf.build_cov3d(scales, rotations_raw, scale_modifier)
    else:
        cov3d = cov3d_precomp
    cov2d = tf.compute_cov2d(
        t_safe, focal_x, focal_y, cam.tan_fovx, cam.tan_fovy, cov3d, cam.viewmatrix
    )

    # --- invert to conic; det==0 culled (forward.cu:419-423)
    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] * cov2d[:, 1]
    det_ok = det != 0.0
    det_inv = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    conic = jnp.stack(
        [cov2d[:, 2] * det_inv, -cov2d[:, 1] * det_inv, cov2d[:, 0] * det_inv],
        axis=-1,
    )

    # --- screen-space radius (forward.cu:429-432); lambda1 >= 0.3 for any
    # PSD cov (the +0.3 low-pass), the max(0) only shields garbage lanes.
    mid = 0.5 * (cov2d[:, 0] + cov2d[:, 2])
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(mid + disc, 0.0)))
    radius_f = jnp.where(live & det_ok, radius_f, 0.0)

    rect_min, rect_max = get_rect(mean2d, radius_f, grid_x, grid_y)
    rect_w = rect_max[:, 0] - rect_min[:, 0]
    rect_h = rect_max[:, 1] - rect_min[:, 1]
    tiles = rect_w * rect_h

    valid = live & det_ok & (tiles > 0)

    # --- color from SH (or precomputed)
    if color_precomp is None:
        dirs = tf.normalize(means3d - cam.campos[None, :], eps=1e-12)
        color = sh_ops.eval_sh_color_clamped(sh, dirs, degrees)
    else:
        color = color_precomp

    opacity = jnp.where(
        valid, 1.0 / (1.0 + jnp.exp(-opacities_raw)), 0.0
    )

    validf = valid.astype(jnp.float32)
    radii = jnp.where(valid, radius_f.astype(jnp.int32), 0)
    tiles_touched = jnp.where(valid, tiles, 0)
    return PreprocessOut(
        means2d=mean2d,
        depths=depths,
        conic=conic * validf[:, None],
        opacity=opacity,
        color=color * validf[:, None],
        radii=radii,
        rect_min=rect_min,
        rect_max=rect_max,
        tiles_touched=tiles_touched,
    )
