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
  * two parameter layouts (static `param_shard` flag):
      - replicated (default): params + Adam state replicated, gradients
        come back via a single `psum` over both axes;
      - sharded (`param_shard=True`, the designed scaling story of
        SURVEY.md section 2.3): params, optimizer moments and every
        capacity-sized pool leaf are SHARDED over the "tile" axis.  Each
        member differentiates w.r.t. only its own primitive rows; the
        backward of the preprocess `all_gather` IS the reduce-scatter of
        the attribute gradients back to their owner shard, overlapped
        with the rest of the backward by XLA's scheduler — no full-size
        gradient ever materializes, and Adam runs on 1/ntile of the
        state per device (a rasterizer-shaped ZeRO).

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
from reduced3dgs_tpu.train import trainer as trainer_mod
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
                     "spatial_lr_scale", "param_shard", "skip_update",
                     "grad_reduce"),
)
def sharded_train_step(state: TrainState, cams: CameraParams, gts,
                       background, iteration, *, mesh: Mesh, width, height,
                       budget, opt_cfg: OptimizationParams,
                       spatial_lr_scale: float, param_shard: bool = False,
                       skip_update: bool = False, grad_reduce: str = "f32"):
    """One data+tile-parallel training iteration.

    cams: batched CameraParams with leading axis n_data; gts
    (n_data, H, W, 3).  Returns (new_state, metrics), or
    (new_state, metrics, grads) with skip_update=True (a surgery
    iteration: the pending grads are replayed by the host after the
    pool surgery, exactly like the single-chip Trainer).

    param_shard=True expects every capacity-sized leaf of `state`
    (params, Adam moments, degrees/alive/accumulators) laid out with
    NamedSharding P("tile") on its leading axis — see shard_state().
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
        so = screen_offset[0]  # (C, 2) replicated / (C/ntile, 2) sharded

        def loss_fn(params, so):
            # --- primitive-sharded preprocess (tp-style) -----------------
            # param_shard: `params` IS the local row shard already; the
            # backward of this all_gather is the reduce-scatter that
            # returns every attribute gradient to its owner shard.
            if param_shard:
                def shard_rows(x):
                    return x
            else:
                def shard_rows(x):
                    return jax.lax.dynamic_slice_in_dim(
                        x, t_idx * cs, cs, 0)

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
                tile_rows=(r0, rows_per), grad_reduce=grad_reduce,
            )  # (rows_per*16, W, 3)
            # This strip's true demand, with the slack-pool overflow
            # folded in exactly like renderer.render(): when
            # total_padded > b_pad the statistical alignment slack
            # (binning._slack_pool) ran out and binning clamped the
            # layout — the strip image/grads are silently truncated, so
            # force num_rendered past the budget to trip the pmax/
            # regrow contract (run_sharded_step_with_regrow).
            num_rendered = jnp.where(
                b.total_padded > b.gauss_aligned.shape[0],
                jnp.maximum(b.num_rendered, jnp.int32(budget + 1)),
                b.num_rendered)

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
            # enters once via member 0)
            img = jax.lax.all_gather(strip, "tile", axis=0,
                                     tiled=True)[:height]
            band = -(-height // ntile)
            s_sum = ssim_band_sum(img, gt, t_idx * band, band)
            hw3f = float(height * width * 3)
            gated = lam * (-s_sum / hw3f)
            if param_shard:
                # every member owns a disjoint row shard: the visible
                # count is global (stop_gradient: it is a denominator of
                # integer origin, and differentiating through psum with
                # check_vma=False mis-transposes), the |.| sums enter
                # once per row via the natural over-members psum.
                vis = prep_local.radii > 0
                nvis = jnp.maximum(jax.lax.stop_gradient(
                    jax.lax.psum(vis.sum(), "tile")), 1)
                gate_rows = 1.0
            else:
                vis = prep.radii > 0
                nvis = jnp.maximum(vis.sum(), 1)
                # replicated rows: regularizers enter once via member 0
                gate_rows = (t_idx == 0).astype(jnp.float32)
            reg = jnp.float32(0.0)
            if opt_cfg.lambda_alpha_regul > 0:
                op = jax.nn.sigmoid(params.opacity[:, 0])
                reg += opt_cfg.lambda_alpha_regul * (
                    jnp.where(vis, jnp.abs(op), 0.0).sum() / nvis)
            if opt_cfg.lambda_sh_sparsity > 0:
                reg += opt_cfg.lambda_sh_sparsity * (
                    jnp.where(vis[:, None, None],
                              jnp.abs(params.features_rest), 0.0).sum()
                    / (nvis * 45))
            const = jnp.where(t_idx == 0, jnp.float32(lam), 0.0)
            gated = (gated + const + gate_rows * reg) / ndata
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
        if param_shard:
            # grads already live on their owner shard (the all_gather
            # transpose reduce-scattered them); only the camera-batch
            # axis still needs combining.
            g_params = jax.lax.psum(g_params, "data")
            # g_so: per-(camera, owner-shard) screen grads, no psum needed
            # per-member radii of OWN rows for densification stats
            radii_out = jax.lax.dynamic_slice_in_dim(
                radii, t_idx * cs, cs, 0)
        else:
            g_params = jax.lax.psum(g_params, ("data", "tile"))
            g_so = jax.lax.psum(g_so, "tile")  # per-camera screen grads
            radii_out = radii
        l1_mean = jax.lax.psum(l1_sum, ("data", "tile")) / (ndata * hw3)
        # overflow contract: the largest per-strip instance demand across
        # the whole mesh — the host grows `budget` past it and redoes the
        # step, mirroring the single-chip path (train/trainer.py)
        nr_max = jax.lax.pmax(num_rendered, ("data", "tile"))
        return (loss[None], g_params, g_so[None], vis[None], radii_out[None],
                l1_mean[None], nr_max[None])

    # width/height are static; only the 5 array fields cross shard_map
    cam_leaves = (cams.viewmatrix, cams.projmatrix, cams.campos,
                  cams.tan_fovx, cams.tan_fovy)
    screen_offset = jnp.zeros((ndata, cap, 2), jnp.float32)
    repl = P()
    data_first = P("data")
    if param_shard:
        row_shard = P("tile")
        in_specs = (row_shard, row_shard, row_shard, data_first,
                    data_first, P("data", "tile"))
        out_specs = (repl, row_shard, P("data", "tile"),
                     P("data", "tile"), P("data", "tile"), repl, repl)
    else:
        in_specs = (repl, repl, repl, data_first, data_first, data_first)
        out_specs = (repl, repl, data_first, data_first, data_first, repl,
                     repl)
    out = jax.shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
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

    if skip_update:
        new_params, new_opt = pool.params, opt
    else:
        xyz_lr = adam.expon_lr(
            iteration.astype(jnp.float32),
            opt_cfg.position_lr_init * spatial_lr_scale,
            opt_cfg.position_lr_final * spatial_lr_scale,
            lr_delay_mult=opt_cfg.position_lr_delay_mult,
            max_steps=opt_cfg.position_lr_max_steps,
        )
        lr_tree = make_lr_tree(grads, opt_cfg, xyz_lr)
        # param_shard: params/moments/grads all carry P("tile") row
        # shardings, so this elementwise update partitions — each device
        # steps 1/ntile of the optimizer state, no gradient or moment
        # ever materializes at full size.
        new_params, new_opt = adam.update(pool.params, grads, opt, lr_tree)
    pool = pool._replace(params=new_params)
    metrics = {"loss": loss, "l1": l1_mean[0], "num_alive": pool.num_alive,
               "num_rendered_max": nr_max[0]}
    state = TrainState(pool, new_opt, key)
    if skip_update:
        return state, metrics, grads
    return state, metrics


def run_sharded_step_with_regrow(state, cams, gts, background, iteration, *,
                                 mesh, width, height, budget, opt_cfg,
                                 spatial_lr_scale, growth=2,
                                 param_shard=False, skip_update=False,
                                 grad_reduce="f32", max_doublings=24):
    """Host wrapper replicating the single-chip overflow contract
    (train/trainer.py): if any strip's true instance demand exceeded the
    static budget, double the budget (recompile at the next power) and
    redo the step on the pre-step state.  Returns
    (state, metrics, budget) (+ grads with skip_update=True).

    Bounded: at most `max_doublings` budget growths — if demand still
    exceeds the budget after that (e.g. the reported demand itself keeps
    growing because the slack-pool overflow forces num_rendered past
    every budget we try), raise instead of looping forever."""
    for _ in range(max_doublings + 1):
        out = sharded_train_step(
            state, cams, gts, background, iteration, mesh=mesh,
            width=width, height=height, budget=budget, opt_cfg=opt_cfg,
            spatial_lr_scale=spatial_lr_scale, param_shard=param_shard,
            skip_update=skip_update, grad_reduce=grad_reduce)
        new_state, metrics = out[0], out[1]
        needed = int(metrics["num_rendered_max"])
        if needed <= budget:
            if skip_update:
                return new_state, metrics, budget, out[2]
            return new_state, metrics, budget
        while budget < needed:
            budget *= growth
    raise RuntimeError(
        f"instance-budget regrowth did not converge after "
        f"{max_doublings} growths (budget={budget}, demand={needed})")


# ---------------------------------------------------------------------------
# state layout helpers + mesh trainer
# ---------------------------------------------------------------------------

def state_shardings(mesh: Mesh, state: TrainState,
                    param_shard: bool = True):
    """A TrainState-shaped pytree of NamedShardings: every leaf whose
    leading axis is the pool capacity gets P("tile") (params, Adam
    moments, degrees/alive/accumulators); scalars stay replicated."""
    from jax.sharding import NamedSharding

    cap = state.pool.capacity
    repl = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P("tile")) if param_shard else repl

    def pick(x):
        arr = jnp.asarray(x)
        if arr.ndim >= 1 and arr.shape[0] == cap:
            return row
        return repl

    return jax.tree.map(pick, state)


def shard_state(state: TrainState, mesh: Mesh,
                param_shard: bool = True) -> TrainState:
    """device_put the train state into the mesh layout (row-sharded
    capacity leaves when param_shard, else fully replicated)."""
    return jax.device_put(state, state_shardings(mesh, state, param_shard))


class ShardedTrainer(trainer_mod.Trainer):
    """Mesh-parallel Trainer: the single-chip Trainer's exact event
    cadence (SH schedule, densify/prune/mercy/opacity-reset,
    store_grads deferred step) driven over a ("data", "tile") mesh.

    Plain iterations run `sharded_train_step` (data-parallel camera
    batch x tile/primitive parallelism; param_shard=True additionally
    shards params + Adam state over "tile" with reduce-scattered
    gradients).  Surgery iterations run the SAME module-level jitted
    surgery steps as the single-chip Trainer on the sharded state —
    XLA/GSPMD partitions the capacity-sized masked writes and inserts
    the (cheap, P-sized) collectives for the few global reductions
    (top-k thresholds, alive counts); the state layout is re-pinned
    after any surgery that rebuilt leaves.

    With n_data=1 and the same seed, the training trace is numerically
    equivalent to the single-chip Trainer (verified by
    tests/test_sharded.py::test_sharded_trainer_surgery_parity).
    """

    def __init__(self, pool, opt_cfg, cameras, *, mesh: Mesh,
                 param_shard: bool = True, **kw):
        super().__init__(pool, opt_cfg, cameras, **kw)
        self.mesh = mesh
        self.param_shard = param_shard
        self.n_data = mesh.shape["data"]
        self.state = shard_state(self.state, mesh, param_shard)

    def _repin(self):
        """Re-apply the mesh layout after surgery rebuilt state leaves."""
        self.state = shard_state(self.state, self.mesh, self.param_shard)

    def step(self, iteration: int):
        """One sharded training iteration (one camera per data group).

        Mirrors Trainer.step's reference ordering exactly:
        backward -> densify/prune/mercy surgery -> deferred
        optimizer.step (train.py:116-155)."""
        cfg = self.opt_cfg
        self.iteration = iteration
        if iteration % 1000 == 0:
            self.state = self.state._replace(
                pool=trainer_mod.one_up_sh_degree(
                    self.state.pool, self.max_sh_degree))
        will_densify, will_reset, will_prune_dead, will_mercy = (
            self._events(iteration))
        surgery = (will_densify or will_reset or will_prune_dead
                   or will_mercy)
        final = iteration >= cfg.iterations

        cams = [self.next_camera() for _ in range(self.n_data)]
        if cfg.random_background:
            bg = jnp.asarray(self.rng.uniform(0.0, 1.0, 3), jnp.float32)
        else:
            bg = self.background
        cps = stack_camera_params(cams)
        gts = jnp.stack([jnp.asarray(c.image) for c in cams])
        budget = max(self._budget_for(c.uid) for c in cams)
        out = run_sharded_step_with_regrow(
            self.state, cps, gts, bg, jnp.int32(iteration),
            mesh=self.mesh, width=cams[0].width, height=cams[0].height,
            budget=budget, opt_cfg=cfg,
            spatial_lr_scale=self.spatial_lr_scale,
            param_shard=self.param_shard,
            skip_update=surgery or final,
            grad_reduce=self.grad_reduce)
        self.state, metrics, new_budget = out[0], out[1], out[2]
        pending = out[3] if len(out) > 3 else None
        for c in cams:
            if new_budget > self._budget_for(c.uid):
                self._budget_for(c.uid, new_budget)

        # surgery + deferred step: identical helpers to Trainer.step
        if will_densify:
            pending = self.maybe_grow_pool(pending)
            self._repin()
            if cfg.store_grads and pending is not None:
                self.state, dstats, pending = trainer_mod.densify_step(
                    self.state, jnp.float32(self.extent), pending,
                    opt_cfg=cfg,
                    use_size_threshold=iteration > cfg.opacity_reset_interval,
                    with_grads=True)
            else:
                self.state, dstats = trainer_mod.densify_step(
                    self.state, jnp.float32(self.extent), opt_cfg=cfg,
                    use_size_threshold=iteration > cfg.opacity_reset_interval)
                pending = None
            self.stats.update({k: int(v) for k, v in dstats.items()})
            self._repin()
        if will_reset:
            self.state = trainer_mod.opacity_reset_step(self.state)
        if will_prune_dead:
            self.state, n = trainer_mod.prune_dead_step(
                self.state, jnp.float32(self.extent))
            self.stats["n_points_pruned"] = int(n)
            pending = None
            self._repin()
        if will_mercy:
            self.scene.pool = self.state.pool
            red, _ = self.scene.calculate_redundancy_metric(
                pixel_scale=cfg.box_size)
            self.state, mstats = trainer_mod.mercy_step(
                self.state, red, lambda_mercy=cfg.lambda_mercy,
                mercy_minimum=cfg.mercy_minimum,
                mercy_type=cfg.mercy_type)
            self.stats["n_points_mercied"] = int(
                mstats["n_points_mercied"])
            pending = None
            self._repin()
        if pending is not None and not final:
            self.state = trainer_mod.apply_update_step(
                self.state, pending, jnp.int32(iteration), opt_cfg=cfg,
                spatial_lr_scale=self.spatial_lr_scale,
                skip_opacity=will_reset)
        if iteration in self.cull_sh_iterations:
            from reduced3dgs_tpu.ops.sh_culling import cull_sh_bands

            pool = cull_sh_bands(
                self.state.pool, self.cameras,
                threshold=cfg.cdist_threshold * np.sqrt(3) / 255.0,
                std_threshold=cfg.std_threshold,
                budget=max(self.budgets.values(),
                           default=self.initial_budget),
                backend=self.backend, max_sh_degree=self.max_sh_degree,
                active_sh_degree=int(self.state.pool.active_sh_degree))
            self.state = self.state._replace(pool=pool)
            self._repin()
        return metrics
