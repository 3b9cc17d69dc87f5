"""Reference (oracle) renderer in pure jnp — the "slow truth".

Semantics identical to the CUDA tile renderer (forward.cu:461-582):
front-to-back alpha compositing in (tile, depth-bits, primitive) order with

  alpha   = min(0.99, opacity * exp(power)),      power <= 0 else skip
  skip    if alpha < 1/255
  stop    before blending a primitive that would push T below 1e-4
  color  += c_i * alpha_i * T;  T *= (1 - alpha_i)
  out     = color + T_final * bg

expressed with masked cumulative products instead of a sequential loop, so
it is differentiable end-to-end with jax.grad — this replaces the
hand-written BACKWARD::render (backward.cu:437-595).  O(pixels * B); used
as the numerical oracle for the Pallas kernels and for CPU-only tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from reduced3dgs_tpu.ops.binning import BinningOut
from reduced3dgs_tpu.ops.preprocess import TILE_X, TILE_Y, PreprocessOut, tile_grid

ALPHA_CLAMP = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1.0e-4


def _composite_chunk(pix_xy, pix_tile, inst_tile, inst_xy, inst_conic,
                     inst_opac, inst_color, background):
    """Composite one chunk of pixels against ALL B instances.

    Returns (color (N,3), t_final (N,), t_prev (N,B), contrib (N,B)).
    """
    d = inst_xy[None, :, :] - pix_xy[:, None, :]  # (N,B,2)
    power = (
        -0.5 * (inst_conic[None, :, 0] * d[..., 0] ** 2
                + inst_conic[None, :, 2] * d[..., 1] ** 2)
        - inst_conic[None, :, 1] * d[..., 0] * d[..., 1]
    )  # (N,B)
    alpha = jnp.minimum(ALPHA_CLAMP, inst_opac[None, :] * jnp.exp(power))
    hit = (
        (pix_tile[:, None] == inst_tile[None, :])
        & (power <= 0.0)
        & (alpha >= ALPHA_MIN)
    )
    eff = jnp.where(hit, alpha, 0.0)

    one_m = 1.0 - eff
    t_incl = jnp.cumprod(one_m, axis=1)  # T after instance i
    t_prev = t_incl / one_m  # exclusive; safe: eff <= 0.99 < 1
    contrib = hit & (t_incl >= T_EPS)
    w = jnp.where(contrib, eff * t_prev, 0.0)  # blend weights (N,B)

    color = w @ inst_color  # (N,3)
    # final T = T after the last contributing instance (monotone decreasing)
    t_final = jnp.min(jnp.where(contrib, t_incl, 1.0), axis=1)
    out = color + t_final[:, None] * background[None, :]
    return out, t_final, t_prev, contrib


def render_ref(
    prep: PreprocessOut,
    binning: BinningOut,
    background,
    width: int,
    height: int,
    pixel_chunk: int = 4096,
    want_transmittance: bool = False,
):
    """Render the full image.

    Returns (color (H,W,3), final_T (H,W)) — plus, when want_transmittance,
    per-primitive summed blend-time transmittance and touched-pixel counts
    (the calculate_mean_transmittance outputs of forward.cu:560-565, used by
    SH culling).
    """
    grid_x, _ = tile_grid(width, height)
    # binning ids are depth ranks; translate to original primitive ids
    gauss_id = binning.prim_order[binning.gauss_id()]
    # alignment-slack slots carry a real tile id; mask them to num_tiles
    # so they never match a pixel tile
    inst_xy = prep.means2d[gauss_id]
    inst_conic = prep.conic[gauss_id]
    inst_opac = prep.opacity[gauss_id]
    inst_color = prep.color[gauss_id]
    inst_tile = jnp.where(binning.pad_mask, grid_x * 10**6,
                          binning.tile_id)
    bg = jnp.asarray(background, jnp.float32)

    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    pix_xy = jnp.stack([xs.ravel(), ys.ravel()], axis=-1)  # (HW,2)
    pix_tile = (
        (ys.astype(jnp.int32) // TILE_Y) * grid_x + xs.astype(jnp.int32) // TILE_X
    ).ravel()

    n = pix_xy.shape[0]
    chunk = min(pixel_chunk, n)
    pad = (-n) % chunk
    pix_xy_p = jnp.pad(pix_xy, ((0, pad), (0, 0)))
    pix_tile_p = jnp.pad(pix_tile, (0, pad), constant_values=-1)

    B = inst_tile.shape[0]
    outs, ts = [], []
    trans_sum = jnp.zeros((B,), jnp.float32)
    touch_sum = jnp.zeros((B,), jnp.int32)
    for i in range(0, n + pad, chunk):
        xy = jax.lax.dynamic_slice_in_dim(pix_xy_p, i, chunk, 0)
        tile = jax.lax.dynamic_slice_in_dim(pix_tile_p, i, chunk, 0)
        out, t, t_prev, contrib = _composite_chunk(
            xy, tile, inst_tile, inst_xy, inst_conic, inst_opac, inst_color, bg
        )
        if want_transmittance:
            trans_sum = trans_sum + jnp.where(contrib, t_prev, 0.0).sum(axis=0)
            touch_sum = touch_sum + contrib.sum(axis=0).astype(jnp.int32)
        outs.append(out)
        ts.append(t)
    color = jnp.concatenate(outs, axis=0)[:n].reshape(height, width, 3)
    t_final = jnp.concatenate(ts, axis=0)[:n].reshape(height, width)
    if want_transmittance:
        P = prep.means2d.shape[0]
        g_trans = jax.ops.segment_sum(trans_sum, gauss_id, num_segments=P)
        g_touch = jax.ops.segment_sum(touch_sum, gauss_id, num_segments=P)
        return color, t_final, g_trans, g_touch
    return color, t_final
