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


def get_rect(point_image, radius_x, grid_x: int, grid_y: int, radius_y=None):
    """Tile rectangle covered by a splat (auxiliary.h:46-56).

    radius may be float (ceil already applied); casts truncate toward zero
    exactly as the CUDA int casts do for the non-negative clamped operands.
    The reference uses one square radius; per-axis extents are accepted so
    the binning rect can be the ellipse's tight bounding box (see
    `binning_extents`) — the square form is radius_y = radius_x.
    """
    if radius_y is None:
        radius_y = radius_x
    rmin_x = jnp.clip(((point_image[:, 0] - radius_x) / TILE_X).astype(jnp.int32), 0, grid_x)
    rmin_y = jnp.clip(((point_image[:, 1] - radius_y) / TILE_Y).astype(jnp.int32), 0, grid_y)
    rmax_x = jnp.clip(((point_image[:, 0] + radius_x + TILE_X - 1) / TILE_X).astype(jnp.int32), 0, grid_x)
    rmax_y = jnp.clip(((point_image[:, 1] + radius_y + TILE_Y - 1) / TILE_Y).astype(jnp.int32), 0, grid_y)
    return jnp.stack([rmin_x, rmin_y], axis=-1), jnp.stack([rmax_x, rmax_y], axis=-1)


# Binning cutoff: a pixel with alpha = op*exp(-q/2) below the kernels'
# 1/255 skip (ALPHA_MIN, forward.cu:496) contributes nothing to the image
# or gradients, so tiles entirely beyond the level set q = 2*ln(CUT*op)
# can be exactly dropped from binning.  CUT uses a 300 > 255 margin so the
# kernels' ~1e-4 absolute error in evaluating q (tile_render.py:90) can
# never resurrect a culled pixel above the 1/255 skip.
BIN_ALPHA_CUT = 300.0


def binning_extents(cov2d, opacity):
    """Per-axis pixel extents of the alpha >= 1/BIN_ALPHA_CUT level set.

    The reference bins the square of half-width 3*sqrt(lambda_max)
    (forward.cu:429-446); the tight per-axis bounding box of the ellipse
    {d : d^T conic d = r2} is +-r*sqrt(cov_xx) x +-r*sqrt(cov_yy)
    (min over the other coordinate of the quadratic is d_a^2 / cov_aa),
    and the opacity-aware r2 = 2*ln(CUT*op) <= 9 shrinks low-opacity
    splats further.  Always a subset of the reference's rect, and every
    dropped (tile, splat) pair is alpha-skipped by the reference kernel
    at all of its pixels — binning-exact, smaller num_rendered.
    """
    r2 = jnp.clip(2.0 * jnp.log(BIN_ALPHA_CUT * jnp.maximum(opacity, 1e-30)),
                  0.0, 9.0)
    ext_x = jnp.sqrt(r2 * jnp.maximum(cov2d[:, 0], 0.0))
    ext_y = jnp.sqrt(r2 * jnp.maximum(cov2d[:, 2], 0.0))
    dead = opacity * BIN_ALPHA_CUT < 1.0  # alpha < 1/CUT everywhere
    return ext_x, ext_y, dead


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

    # Reference-parity square rect: defines `radii` (the visibility filter
    # that drives densification stats, train.py:131-138) exactly as
    # forward.cu:434-446 does.
    ref_min, ref_max = get_rect(mean2d, radius_f, grid_x, grid_y)
    ref_tiles = ((ref_max[:, 0] - ref_min[:, 0])
                 * (ref_max[:, 1] - ref_min[:, 1]))
    valid = live & det_ok & (ref_tiles > 0)

    op_act = 1.0 / (1.0 + jnp.exp(-opacities_raw))

    # Tight binning rect (subset of the square rect): per-axis,
    # opacity-aware extents of the level set below which the render
    # kernels alpha-skip every pixel — exact, smaller num_rendered.
    ext_x, ext_y, op_dead = binning_extents(cov2d, op_act)
    rect_min, rect_max = get_rect(
        mean2d, jnp.minimum(ext_x, radius_f), grid_x, grid_y,
        radius_y=jnp.minimum(ext_y, radius_f))
    tiles = jnp.where(
        valid & ~op_dead,
        (rect_max[:, 0] - rect_min[:, 0]) * (rect_max[:, 1] - rect_min[:, 1]),
        0)

    # --- color from SH (or precomputed)
    if color_precomp is None:
        dirs = tf.normalize(means3d - cam.campos[None, :], eps=1e-12)
        color = sh_ops.eval_sh_color_clamped(sh, dirs, degrees)
    else:
        color = color_precomp

    opacity = jnp.where(valid, op_act, 0.0)

    validf = valid.astype(jnp.float32)
    radii = jnp.where(valid, radius_f.astype(jnp.int32), 0)
    tiles_touched = tiles
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
