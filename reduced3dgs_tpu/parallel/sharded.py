"""Multi-chip training step: shard_map over a ("data", "tile") mesh.

The reference is strictly single-GPU (utils/general_utils.py:133 pins
cuda:0); the distributed story here is designed TPU-first per SURVEY.md
section 2.3:

  * "data" axis — data parallelism over cameras: each data group trains
    its own random view per step (a batched generalization of the
    reference's one-camera step, train.py:90-92),
  * "tile" axis — image/primitive parallelism inside a data group:
      - preprocess (projection + SH shading, the per-Gaussian kernel) runs
        on a 1/ntile shard of the primitive pool, then `all_gather`s the
        compact screen-space attributes over ICI (tensor-parallel style),
      - rasterization is sharded by horizontal *tile-row strips*: each
        device bins + renders only its strip (the sequence-parallel
        analogue for a rasterizer — pixels are the long axis),
  * parameters and optimizer state are replicated; gradients come back
    via a single `psum` over both axes (the backward of all_gather is a
    reduce-scatter, so per-strip/per-shard partials combine exactly once).

Loss assembly avoids double counting: L1 decomposes per pixel and is
summed from each strip; the 11x11 SSIM conv is band-parallel over the
tile axis (each member computes its row band of the ssim map on the
gathered image); the constant and the visible-set regularizers enter
once via tile-member 0 — so every term enters the psum exactly once.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from reduced3dgs_tpu.config import OptimizationParams
from reduced3dgs_tpu.models.gaussians import GaussianPool
from reduced3dgs_tpu.ops import binning as binning_ops
from reduced3dgs_tpu.ops import preprocess as prep_ops
from reduced3dgs_tpu.ops.losses import ssim_band_sum
from reduced3dgs_tpu.ops.preprocess import CameraParams, tile_grid
from reduced3dgs_tpu.ops.tile_render import TILE_Y, tile_render
from reduced3dgs_tpu.train import adam
from reduced3dgs_tpu.train.trainer import TrainState, make_lr_tree


def make_mesh(n_data: int, n_tile: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_tile
    dev = np.asarray(devices[: n_data * n_tile]).reshape(n_data, n_tile)
    return Mesh(dev, ("data", "tile"))


def stack_camera_params(cams) -> CameraParams:
    """Stack host cameras into a batched CameraParams (leading data axis)."""
    cps = [c.params() if hasattr(c, "params") else c for c in cams]
    return CameraParams(
        viewmatrix=jnp.stack([jnp.asarray(c.viewmatrix) for c in cps]),
        projmatrix=jnp.stack([jnp.asarray(c.projmatrix) for c in cps]),
        campos=jnp.stack([jnp.asarray(c.campos) for c in cps]),
        tan_fovx=jnp.stack([jnp.asarray(c.tan_fovx) for c in cps]),
        tan_fovy=jnp.stack([jnp.asarray(c.tan_fovy) for c in cps]),
        width=cps[0].width,
        height=cps[0].height,
    )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "width", "height", "budget", "opt_cfg",
                     "spatial_lr_scale"),
)
def sharded_train_step(state: TrainState, cams: CameraParams, gts,
                       background, iteration, *, mesh: Mesh, width, height,
                       budget, opt_cfg: OptimizationParams,
                       spatial_lr_scale: float):
    """One data+tile-parallel training iteration.

    cams: batched CameraParams with leading axis n_data; gts
    (n_data, H, W, 3).  Returns (new_state, metrics).
    """
    pool, opt, key = state
    ndata = mesh.shape["data"]
    ntile = mesh.shape["tile"]
    cap = pool.capacity
    assert cap % ntile == 0, "pool capacity must divide the tile axis"
    cs = cap // ntile
    grid_x, grid_y = tile_grid(width, height)
    rows_per = -(-grid_y // ntile)  # cdiv: strip rows per device
    hw3 = height * width * 3

    lam = opt_cfg.lambda_dssim

    def local(params, degrees, alive, cam_leaves, gt, screen_offset):
        t_idx = jax.lax.axis_index("tile")
        cam = CameraParams(*[x[0] for x in cam_leaves],
                           width=width, height=height)
        gt = gt[0]  # (H, W, 3)
        so = screen_offset[0]  # (C, 2)

        def loss_fn(params, so):
            # --- primitive-sharded preprocess (tp-style) -----------------
            def shard_rows(x):
                return jax.lax.dynamic_slice_in_dim(x, t_idx * cs, cs, 0)

            feats = jnp.concatenate(
                [params.features_dc, params.features_rest], axis=1)
            prep_local = prep_ops.preprocess(
                shard_rows(params.xyz), shard_rows(params.scaling),
                shard_rows(params.rotation),
                shard_rows(params.opacity)[:, 0], shard_rows(feats),
                shard_rows(degrees), cam,
                alive_mask=shard_rows(alive),
                screen_offset=shard_rows(so),
            )
            prep = jax.tree.map(
                lambda x: jax.lax.all_gather(x, "tile", axis=0, tiled=True),
                prep_local,
            )

            # --- strip rasterization (sp-style) --------------------------
            r0 = t_idx * rows_per
            b = binning_ops.bin_gaussians(prep, width, height, budget,
                                          tile_rows=(r0, rows_per))
            strip, strip_t, _, _ = tile_render(
                prep, b, background, width, height,
                tile_rows=(r0, rows_per),
            )  # (rows_per*16, W, 3)
            num_rendered = b.num_rendered  # this strip's true demand

            # local L1 over valid strip pixels
            y0 = r0 * TILE_Y
            row = y0 + jnp.arange(rows_per * TILE_Y)
            row_ok = (row < height)[:, None, None]
            gt_pad = jnp.pad(gt, ((0, ntile * rows_per * TILE_Y - height),
                                  (0, 0), (0, 0)))
            gt_strip = jax.lax.dynamic_slice_in_dim(
                gt_pad, y0, rows_per * TILE_Y, 0)
            l1_sum = jnp.where(row_ok, jnp.abs(strip - gt_strip), 0.0).sum()
            l1_term = (1.0 - lam) * l1_sum / (ndata * hw3)

            # gathered full image; the 11x11 SSIM conv is band-parallel
            # over the tile axis (each member computes its row band of
            # the ssim map, ops/losses.py:ssim_band_sum; the constant 1
            # and the regularizers enter once via member 0)
            img = jax.lax.all_gather(strip, "tile", axis=0,
                                     tiled=True)[:height]
            band = -(-height // ntile)
            s_sum = ssim_band_sum(img, gt, t_idx * band, band)
            hw3f = float(height * width * 3)
            gated = lam * (-s_sum / hw3f)
            vis = prep.radii > 0
            nvis = jnp.maximum(vis.sum(), 1)
            reg = jnp.float32(lam)  # the "1 -" of (1 - SSIM), once
            if opt_cfg.lambda_alpha_regul > 0:
                op = jax.nn.sigmoid(params.opacity[:, 0])
                reg += opt_cfg.lambda_alpha_regul * (
                    jnp.where(vis, jnp.abs(op), 0.0).sum() / nvis)
            if opt_cfg.lambda_sh_sparsity > 0:
                reg += opt_cfg.lambda_sh_sparsity * (
                    jnp.where(vis[:, None, None],
                              jnp.abs(params.features_rest), 0.0).sum()
                    / (nvis * 45))
            gated = (gated + jnp.where(t_idx == 0, reg, 0.0)) / ndata
            # local contribution only — the cross-device psum happens on
            # the VALUE and on the GRADS outside the differentiated
            # function (differentiating through psum with check_vma=False
            # uses the legacy psum-transpose and inflates replicated-input
            # cotangents by the axis size).
            return l1_term + gated, (vis, prep.radii, l1_sum, num_rendered)

        (loss_local, (vis, radii, l1_sum, num_rendered)), (g_params, g_so) = (
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                params, so))
        loss = jax.lax.psum(loss_local, ("data", "tile"))
        g_params = jax.lax.psum(g_params, ("data", "tile"))
        g_so = jax.lax.psum(g_so, "tile")  # per-camera screen grads
        l1_mean = jax.lax.psum(l1_sum, ("data", "tile")) / (ndata * hw3)
        # overflow contract: the largest per-strip instance demand across
        # the whole mesh — the host grows `budget` past it and redoes the
        # step, mirroring the single-chip path (train/trainer.py)
        nr_max = jax.lax.pmax(num_rendered, ("data", "tile"))
        return (loss[None], g_params, g_so[None], vis[None], radii[None],
                l1_mean[None], nr_max[None])

    # width/height are static; only the 5 array fields cross shard_map
    cam_leaves = (cams.viewmatrix, cams.projmatrix, cams.campos,
                  cams.tan_fovx, cams.tan_fovy)
    screen_offset = jnp.zeros((ndata, cap, 2), jnp.float32)
    repl = P()
    data_first = P("data")
    out = jax.shard_map(
        local, mesh=mesh,
        in_specs=(repl, repl, repl, data_first, data_first, data_first),
        out_specs=(repl, repl, data_first, data_first, data_first, repl,
                   repl),
        check_vma=False,
    )(pool.params, pool.degrees, pool.alive,
      cam_leaves, gts, screen_offset)
    loss, grads, g_so, vis_dc, radii_dc, l1_mean, nr_max = out
    loss = loss[0]

    # --- densification statistics, summed over the camera batch ----------
    g_ndc = g_so * jnp.array([0.5 * width, 0.5 * height], jnp.float32)
    gnorm = jnp.linalg.norm(g_ndc, axis=-1)  # (D, C)
    pool = pool._replace(
        xyz_grad_accum=pool.xyz_grad_accum
        + jnp.where(vis_dc, gnorm, 0.0).sum(axis=0),
        denom=pool.denom + vis_dc.sum(axis=0).astype(jnp.float32),
        max_radii2d=jnp.maximum(
            pool.max_radii2d,
            jnp.where(vis_dc, radii_dc, 0).max(axis=0).astype(jnp.float32),
        ),
    )

    xyz_lr = adam.expon_lr(
        iteration.astype(jnp.float32),
        opt_cfg.position_lr_init * spatial_lr_scale,
        opt_cfg.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt_cfg.position_lr_delay_mult,
        max_steps=opt_cfg.position_lr_max_steps,
    )
    lr_tree = make_lr_tree(grads, opt_cfg, xyz_lr)
    new_params, new_opt = adam.update(pool.params, grads, opt, lr_tree)
    pool = pool._replace(params=new_params)
    metrics = {"loss": loss, "l1": l1_mean[0], "num_alive": pool.num_alive,
               "num_rendered_max": nr_max[0]}
    return TrainState(pool, new_opt, key), metrics


def run_sharded_step_with_regrow(state, cams, gts, background, iteration, *,
                                 mesh, width, height, budget, opt_cfg,
                                 spatial_lr_scale, growth=2):
    """Host wrapper replicating the single-chip overflow contract
    (train/trainer.py): if any strip's true instance demand exceeded the
    static budget, double the budget (recompile at the next power) and
    redo the step on the pre-step state.  Returns
    (state, metrics, budget)."""
    while True:
        new_state, metrics = sharded_train_step(
            state, cams, gts, background, iteration, mesh=mesh,
            width=width, height=height, budget=budget, opt_cfg=opt_cfg,
            spatial_lr_scale=spatial_lr_scale)
        needed = int(metrics["num_rendered_max"])
        if needed <= budget:
            return new_state, metrics, budget
        while budget < needed:
            budget *= growth
