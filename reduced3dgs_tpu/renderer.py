"""Renderer facade: the TPU equivalent of gaussian_renderer/__init__.py.

`render()` mirrors the reference's render(viewpoint, pc, pipe, bg)
(gaussian_renderer/__init__.py:19-148): it takes raw Gaussian parameters +
a camera, runs preprocess -> tile binning -> alpha compositing, and returns
a dict with the rendered image, radii and visibility filter.  Unlike the
reference there is no autograd.Function bridge — everything downstream of
the raw parameters is one differentiable JAX graph, so `jax.grad` of a
scalar loss of the output gives exactly the gradients the hand-written
CUDA backward produces (incl. the clamp masks and the sigmoid chain rule).

Backends:
  * "xla"    — pure-jnp oracle compositor (ops/render_ref.py), O(pixels*B);
               runs everywhere, used as ground truth.
  * "pallas" — tiled Pallas kernels (ops/tile_render.py) with a custom VJP;
               the production TPU path.

Static-shape note: the per-frame instance count is data-dependent in the
reference (num_rendered); here callers pass a static `instance_budget`
(bucketed powers of two) and `out.num_rendered` reports the true count so
the host can grow the bucket when it overflows.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from reduced3dgs_tpu.ops import binning as binning_ops
from reduced3dgs_tpu.ops import preprocess as prep_ops
from reduced3dgs_tpu.ops.preprocess import CameraParams


@jax.jit
def mark_visible(xyz, cam: CameraParams):
    """(P,) bool frustum visibility — the GaussianRasterizer.markVisible
    API (diff_gaussian_rasterization/__init__.py:188-196, rasterize_points
    .cu:307-326): view-space z > 0.2, same test the preprocess cull uses."""
    from reduced3dgs_tpu.ops import transforms as tf

    return tf.transform_points_3x3(xyz, cam.viewmatrix)[:, 2] > 0.2


class RenderOut(NamedTuple):
    color: jnp.ndarray  # (H,W,3)
    final_t: jnp.ndarray  # (H,W)
    radii: jnp.ndarray  # (P,) int32
    visibility: jnp.ndarray  # (P,) bool (radii > 0)
    means2d: jnp.ndarray  # (P,2) pixel centers (for densification grads)
    num_rendered: jnp.ndarray  # () int32
    transmittance_sum: jnp.ndarray | None = None  # (P,) optional
    pixels_touched: jnp.ndarray | None = None  # (P,) optional


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "instance_budget", "backend", "want_transmittance",
        "strip_rows", "grad_reduce",
    ),
)
def render(
    xyz,
    features,  # (P, 16, 3) SH coefficients (dc + rest)
    scaling_raw,  # (P, 3) log-scales
    rotation_raw,  # (P, 4) unnormalized quaternions
    opacity_raw,  # (P,) raw (pre-sigmoid)
    degrees,  # (P,) int32
    cam: CameraParams,
    background,  # (3,)
    *,
    width: int,
    height: int,
    instance_budget: int,
    alive_mask=None,
    scale_modifier: float = 1.0,
    backend: str = "xla",
    want_transmittance: bool = False,
    screen_offset=None,
    strip_r0=None,
    strip_rows: int | None = None,
    color_precomp=None,
    grad_reduce: str = "f32",  # "bf16x2": packed-payload reduction sort
) -> RenderOut:
    """color_precomp: optional (P, 3) precomputed per-primitive colors —
    the variable-SH ragged inference path (models/variable_sh.py) and
    the reference's convert_SHs_python dual path both enter here; when
    given, `features` may be a minimal dummy (it is not read)."""
    prep = prep_ops.preprocess(
        xyz, scaling_raw, rotation_raw, opacity_raw, features, degrees, cam,
        alive_mask=alive_mask, scale_modifier=scale_modifier,
        screen_offset=screen_offset, color_precomp=color_precomp,
    )
    tile_rows = None if strip_rows is None else (strip_r0, strip_rows)
    b = binning_ops.bin_gaussians(prep, width, height, instance_budget,
                                  tile_rows=tile_rows)
    # Overflow report: num_rendered > budget means truncation, AND
    # total_padded > b_pad means the statistical alignment slack pool
    # (binning._slack_pool, folded into the padded size that
    # bin_gaussians allocates) ran out — binning clamped the layout, so
    # the image is incomplete.  Both fold into one number every
    # existing regrow loop already understands: grow the budget (which
    # also grows the slack pool) and redo the step.
    b_pad = b.gauss_aligned.shape[0]
    nr_report = jnp.where(
        b.total_padded > b_pad,
        jnp.maximum(b.num_rendered, jnp.int32(instance_budget + 1)),
        b.num_rendered)

    if backend == "xla":
        if tile_rows is not None:
            raise NotImplementedError("strip rendering is pallas-only")
        from reduced3dgs_tpu.ops.render_ref import render_ref

        out = render_ref(
            prep, b, background, width, height,
            want_transmittance=want_transmittance,
        )
        if want_transmittance:
            color, final_t, g_trans, g_touch = out
        else:
            color, final_t = out
            g_trans = g_touch = None
    elif backend == "pallas":
        from reduced3dgs_tpu.ops.tile_render import tile_render

        color, final_t, g_trans, g_touch = tile_render(
            prep, b, background, width, height,
            want_transmittance=want_transmittance, tile_rows=tile_rows,
            grad_reduce=grad_reduce,
        )
    else:
        raise ValueError(f"unknown backend {backend!r}")

    return RenderOut(
        color=color,
        final_t=final_t,
        radii=prep.radii,
        visibility=prep.radii > 0,
        means2d=prep.means2d,
        num_rendered=nr_report,
        transmittance_sum=g_trans,
        pixels_touched=g_touch,
    )
