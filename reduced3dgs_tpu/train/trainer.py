"""Training driver — the TPU-native train.py core.

`train_step` is one fully-jitted iteration of the reference hot loop
(train.py:80-155): render -> loss -> grads -> densification-stat
accumulation -> Adam.  The host-side `Trainer` owns everything the
reference does between iterations: random camera order, SH-degree
schedule, densify/prune/mercy cadence, opacity resets, pool-capacity and
instance-budget growth (the only recompile triggers), checkpoints.

Loss (train.py:102-115):
  (1-lambda_dssim) L1 + lambda_dssim (1-SSIM)
  + lambda_alpha_regul * mean(|sigmoid(opacity)| over visible)
  + lambda_sh_sparsity * mean(|f_rest| over visible)
The SH-sparsity term reproduces the gradient the reference injects
inside its backward kernel (backward.cu:56-131 with the multiplier
lambda/(num_visible*15*3), rasterizer_impl.cu:549-571) as an explicit,
mathematically-identical regularizer.
"""

from __future__ import annotations

import functools
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from reduced3dgs_tpu.config import OptimizationParams
from reduced3dgs_tpu.models.gaussians import (
    GaussianPool, grow, one_up_sh_degree, reset_opacity, round_capacity,
)
from reduced3dgs_tpu.ops.losses import l1_loss, ssim
from reduced3dgs_tpu.ops.preprocess import CameraParams
from reduced3dgs_tpu.renderer import render
from reduced3dgs_tpu.train import adam, densify
from reduced3dgs_tpu.train.adam import AdamState


class TrainState(NamedTuple):
    pool: GaussianPool
    opt: AdamState
    key: jnp.ndarray


def make_lr_tree(params_like, opt_cfg: OptimizationParams, xyz_lr):
    """Per-leaf LR pytree (reference's six param groups,
    gaussian_model.py:207-214)."""
    return params_like._replace(
        xyz=xyz_lr,
        features_dc=jnp.float32(opt_cfg.feature_lr),
        features_rest=jnp.float32(opt_cfg.feature_lr / 20.0),
        opacity=jnp.float32(opt_cfg.opacity_lr),
        scaling=jnp.float32(opt_cfg.scaling_lr),
        rotation=jnp.float32(opt_cfg.rotation_lr),
    )


def _step_core(state: TrainState, cam: CameraParams, gt_image, background,
               iteration, *, width, height, budget, backend,
               opt_cfg: OptimizationParams, spatial_lr_scale: float,
               skip_update: bool = False, grad_reduce: str = "f32"):
    pool, opt, key = state
    c = pool.capacity

    def loss_fn(params, screen_offset):
        out = render(
            params.xyz, jnp.concatenate(
                [params.features_dc, params.features_rest], axis=1),
            params.scaling, params.rotation, params.opacity[:, 0],
            pool.degrees, cam, background,
            width=width, height=height, instance_budget=budget,
            alive_mask=pool.alive, backend=backend,
            grad_reduce=grad_reduce,
            screen_offset=screen_offset,
        )
        gt = gt_image
        ll1 = l1_loss(out.color, gt)
        lssim = 1.0 - ssim(out.color, gt)
        vis = out.visibility
        nvis = jnp.maximum(vis.sum(), 1)
        loss = (1.0 - opt_cfg.lambda_dssim) * ll1 + opt_cfg.lambda_dssim * lssim
        lalpha = jnp.float32(0.0)
        lsh = jnp.float32(0.0)
        if opt_cfg.lambda_alpha_regul > 0:
            op = jax.nn.sigmoid(params.opacity[:, 0])
            lalpha = jnp.where(vis, jnp.abs(op), 0.0).sum() / nvis
            loss = loss + opt_cfg.lambda_alpha_regul * lalpha
        if opt_cfg.lambda_sh_sparsity > 0:
            lsh = jnp.where(
                vis[:, None, None], jnp.abs(params.features_rest), 0.0
            ).sum() / (nvis * 45)
            loss = loss + opt_cfg.lambda_sh_sparsity * lsh
        return loss, (out, ll1, lssim, lalpha, lsh)

    screen_offset = jnp.zeros((c, 2), jnp.float32)
    (loss, (out, ll1, lssim, lalpha, lsh)), (grads, g_screen) = (
        jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
        (pool.params, screen_offset))

    # densification statistics (train.py:133-135): viewspace grads are
    # accumulated in NDC units — g_pixel * (0.5 W, 0.5 H)
    vis = out.visibility
    g_ndc = g_screen * jnp.array([0.5 * width, 0.5 * height], jnp.float32)
    gnorm = jnp.linalg.norm(g_ndc, axis=-1)
    pool = pool._replace(
        xyz_grad_accum=pool.xyz_grad_accum + jnp.where(vis, gnorm, 0.0),
        denom=pool.denom + vis.astype(jnp.float32),
        max_radii2d=jnp.where(
            vis, jnp.maximum(pool.max_radii2d, out.radii.astype(jnp.float32)),
            pool.max_radii2d,
        ),
    )

    if skip_update:
        new_params, new_opt = pool.params, opt
    else:
        lr_tree = make_lr_tree(
            grads, opt_cfg,
            _xyz_lr(iteration, opt_cfg, spatial_lr_scale))
        new_params, new_opt = adam.update(pool.params, grads, opt, lr_tree)

    pool = pool._replace(params=new_params)
    metrics = {
        "loss": loss, "l1": ll1, "ssim_loss": lssim,
        "alpha_regul": lalpha, "sh_sparsity_loss": lsh,
        "num_rendered": out.num_rendered,
        "num_alive": pool.num_alive,
    }
    state = TrainState(pool, new_opt, key)
    if skip_update:
        # surgery iteration: the pending grads go back to the host so the
        # reference ordering backward -> densify -> step can be replayed
        # (train.py:116-155 with --store_grads)
        return state, metrics, grads
    return state, metrics


train_step = functools.partial(
    jax.jit,
    static_argnames=("width", "height", "budget", "backend", "opt_cfg",
                     "spatial_lr_scale", "skip_update", "grad_reduce"),
)(_step_core)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "budget", "backend", "opt_cfg",
                     "spatial_lr_scale", "grad_reduce"),
)
def train_steps_fused(state: TrainState, cams: CameraParams, gt_images,
                      backgrounds, iterations, *, width, height, budget,
                      backend, opt_cfg: OptimizationParams,
                      spatial_lr_scale: float, grad_reduce: str = "f32"):
    """A `lax.scan` of k ordinary (non-surgery) train steps in ONE
    executable launch.

    The semantics are identical to k sequential `train_step` calls —
    the host only fuses runs with no surgery / SH-schedule / eval
    boundary inside (Trainer.step_group).  The win is dispatch: this
    environment's tunneled runtime costs ~30 ms per launch (PROFILE.md),
    which otherwise dominates small-scene training; production runtimes
    pay a smaller but still per-launch price.

    cams/gt_images/backgrounds/iterations carry a leading (k,) axis.
    """

    def body(st, xs):
        cam, gt, bg, it = xs
        st, metrics = _step_core(
            st, cam, gt, bg, it, width=width, height=height, budget=budget,
            backend=backend, opt_cfg=opt_cfg,
            spatial_lr_scale=spatial_lr_scale, skip_update=False,
            grad_reduce=grad_reduce)
        return st, metrics

    state, metrics = jax.lax.scan(
        body, state, (cams, gt_images, backgrounds, iterations))
    return state, metrics  # metric leaves stacked (k,)


def _xyz_lr(iteration, opt_cfg: OptimizationParams, spatial_lr_scale):
    return adam.expon_lr(
        iteration.astype(jnp.float32),
        opt_cfg.position_lr_init * spatial_lr_scale,
        opt_cfg.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt_cfg.position_lr_delay_mult,
        max_steps=opt_cfg.position_lr_max_steps,
    )


@functools.partial(
    jax.jit,
    static_argnames=("opt_cfg", "spatial_lr_scale", "skip_opacity"))
def apply_update_step(state: TrainState, grads, iteration, *,
                      opt_cfg: OptimizationParams, spatial_lr_scale: float,
                      skip_opacity: bool = False):
    """The deferred optimizer.step() of a store_grads surgery iteration
    (reference train.py:153-155 applied AFTER densify/prune rearranged
    the pending .grad tensors).  skip_opacity replays the reference's
    reset_opacity: replace_tensor_to_optimizer leaves the new opacity
    tensor with .grad None, so torch skips exactly that param."""
    pool, opt, key = state
    lr_tree = make_lr_tree(
        grads, opt_cfg, _xyz_lr(iteration, opt_cfg, spatial_lr_scale))
    skip_tree = None
    if skip_opacity:
        skip_tree = jax.tree.map(lambda _: False, grads)._replace(
            opacity=True)
    new_params, new_opt = adam.update(pool.params, grads, opt, lr_tree,
                                      skip_tree=skip_tree)
    return TrainState(pool._replace(params=new_params), new_opt, key)


@functools.partial(jax.jit, static_argnames=("opt_cfg", "use_size_threshold",
                                              "with_grads"))
def densify_step(state: TrainState, extent, grads=None, *,
                 opt_cfg: OptimizationParams, use_size_threshold: bool,
                 with_grads: bool = False):
    """densify_and_prune; with_grads threads the pending gradient tree
    through the surgery (the reference's store_grads=True path,
    gaussian_model.py:502-598: new rows zero, pruned rows dropped)."""
    pool, opt, key = state
    key, sub = jax.random.split(key)
    max_screen = 20.0 if use_size_threshold else 0.0
    pool, opt, grads, stats = densify.densify_and_prune(
        pool, opt, sub, opt_cfg.densify_grad_threshold, 0.005, extent,
        max_screen, opt_cfg.percent_dense,
        grads_tree=grads if with_grads else None,
    )
    if with_grads:
        return TrainState(pool, opt, key), stats, grads
    return TrainState(pool, opt, key), stats


@functools.partial(jax.jit, static_argnames=("mercy_type",))
def mercy_step(state: TrainState, splat_counts, *, lambda_mercy,
               mercy_minimum, mercy_type):
    pool, opt, key = state
    key, sub = jax.random.split(key)
    pool, opt, stats = densify.mercy_points(
        pool, opt, sub, splat_counts, lambda_mercy=lambda_mercy,
        mercy_minimum=mercy_minimum, mercy_type=mercy_type)
    return TrainState(pool, opt, key), stats


@jax.jit
def prune_dead_step(state: TrainState, extent):
    """prune(1/255) of dead points (train.py:143-144, 164-166)."""
    pool, opt, key = state
    pool, opt, n = densify.prune(pool, opt, 1.0 / 255.0, extent, 0.0)
    return TrainState(pool, opt, key), n


@jax.jit
def opacity_reset_step(state: TrainState):
    """reset_opacity + replace_tensor_to_optimizer semantics: zero the
    opacity Adam moments (gaussian_model.py:313-316, 487-500)."""
    pool, opt, key = state
    pool = reset_opacity(pool)
    opt = opt._replace(
        mu=opt.mu._replace(opacity=jnp.zeros_like(opt.mu.opacity)),
        nu=opt.nu._replace(opacity=jnp.zeros_like(opt.nu.opacity)),
    )
    return TrainState(pool, opt, key)


class Trainer:
    """Host-side loop controller (reference training(), train.py:36-175)."""

    def __init__(self, pool: GaussianPool, opt_cfg: OptimizationParams,
                 cameras, *, spatial_lr_scale: float, background,
                 backend: str = "pallas", max_sh_degree: int = 3,
                 seed: int = 0, initial_budget: int = 1 << 17,
                 cull_sh_iterations=(), scene=None,
                 white_background: bool = False, grad_reduce: str = "f32"):
        self.opt_cfg = opt_cfg
        # drives the extra opacity reset at densify_from_iter
        # (reference train.py:141-142)
        self.white_background = white_background
        self.cameras = list(cameras)
        self.spatial_lr_scale = float(spatial_lr_scale)
        self.background = jnp.asarray(background, jnp.float32)
        self.backend = backend
        self.grad_reduce = grad_reduce
        self.max_sh_degree = max_sh_degree
        self.state = TrainState(pool, adam.init(pool.params),
                                jax.random.PRNGKey(seed))
        self.rng = np.random.default_rng(seed)
        self.initial_budget = initial_budget
        self.cull_sh_iterations = tuple(cull_sh_iterations)
        self.scene = scene  # needed for the redundancy metric (mercy)
        # compression fine-tune phase start (train.py:59-61)
        self.fine_tune_start = opt_cfg.iterations
        if self.cull_sh_iterations or opt_cfg.mercy_points:
            self.fine_tune_start = opt_cfg.iterations - 3000
        self._stack: list[int] = []
        self.budgets: dict[int, int] = {}  # camera uid -> instance budget
        self.extent = None  # set by caller (scene cameras_extent)
        self.stats = {}
        self.iteration = 0

    # -- camera sampling (train.py:90-92: shuffle-without-replacement) ----
    def _next_camera_idx(self):
        if not self._stack:
            self._stack = list(self.rng.permutation(len(self.cameras)))
        return self._stack.pop()

    def next_camera(self):
        return self.cameras[self._next_camera_idx()]

    def _events(self, iteration):
        """The reference's densification-cadence booleans for one
        iteration (train.py:131-150)."""
        cfg = self.opt_cfg
        will_densify = (iteration < cfg.densify_until_iter
                        and iteration > cfg.densify_from_iter
                        and iteration % cfg.densification_interval == 0)
        will_reset = (iteration < cfg.densify_until_iter
                      and (iteration % cfg.opacity_reset_interval == 0
                           or (self.white_background
                               and iteration == cfg.densify_from_iter)))
        will_prune_dead = (iteration >= cfg.densify_until_iter
                           and cfg.prune_dead_points
                           and iteration % cfg.densification_interval == 0)
        will_mercy = (cfg.mercy_points and self.scene is not None
                      and iteration % (cfg.mercy_interval
                                       * cfg.densification_interval) == 0
                      and iteration <= self.fine_tune_start
                      and (iteration >= cfg.densify_until_iter
                           or iteration % cfg.opacity_reset_interval != 0))
        return will_densify, will_reset, will_prune_dead, will_mercy

    def fusible(self, iteration):
        """True when `iteration` has no trainer-internal host boundary:
        such iterations may run inside a fused `lax.scan` launch with
        semantics identical to sequential step() calls."""
        if iteration % 1000 == 0 or iteration in self.cull_sh_iterations:
            return False
        if iteration >= self.opt_cfg.iterations:  # final never steps
            return False
        return not any(self._events(iteration))

    def step_group(self, iterations):
        """Run consecutive boundary-free iterations in ONE fused launch
        (train_steps_fused).  Returns a list of per-iteration metrics
        dicts (device scalars).  Semantics match sequential step():
        same camera sampling order, same random backgrounds, same
        overflow-regrow-redo contract (the whole group re-runs from the
        same state, same cameras, same backgrounds)."""
        cfg = self.opt_cfg
        assert all(self.fusible(i) for i in iterations)
        # pop cameras / draw random backgrounds in EXACTLY the sequential
        # step() order (host-RNG parity); fuse only a same-resolution
        # prefix — a resolution change un-pops the camera and ends the
        # group before its background would have been drawn
        cams, bg_list = [], []
        w = h = None
        for _ in iterations:
            i = self._next_camera_idx()
            c = self.cameras[i]
            if w is None:
                w, h = c.width, c.height
            elif (c.width, c.height) != (w, h):
                self._stack.append(i)
                break
            cams.append(c)
            if cfg.random_background:  # reference train.py:98
                bg_list.append(self.rng.uniform(0.0, 1.0, 3))
        k = len(cams)
        iterations = list(iterations)[:k]
        self.iteration = iterations[-1]  # after resolution truncation
        if cfg.random_background:
            bgs = jnp.asarray(np.stack(bg_list), jnp.float32)
        else:
            bgs = jnp.tile(self.background[None], (k, 1))
        cps = [c.params() for c in cams]
        cams_stacked = jax.tree.map(
            lambda *leaves: jnp.stack([jnp.asarray(x) for x in leaves]),
            *cps)
        gts = jnp.stack([jnp.asarray(c.image) for c in cams])
        its = jnp.asarray(iterations, jnp.int32)

        while True:
            budget = max(self._budget_for(c.uid) for c in cams)
            st, metrics = train_steps_fused(
                self.state, cams_stacked, gts, bgs, its,
                width=w, height=h, budget=budget, backend=self.backend,
                opt_cfg=cfg, spatial_lr_scale=self.spatial_lr_scale,
                grad_reduce=self.grad_reduce)
            needed = np.asarray(metrics["num_rendered"])
            if int(needed.max()) <= budget:
                break
            for c, n in zip(cams, needed):
                if int(n) > self._budget_for(c.uid):
                    self._budget_for(c.uid, int(n))
        self.state = st
        return [
            {key: v[j] for key, v in metrics.items()} for j in range(k)
        ]

    def _budget_for(self, cam_uid, needed=None):
        # {2^k, 3*2^(k-1)} ladder: every B-sized op (binning sort,
        # expand, backward reduction) scales with the budget, so the
        # finer ladder caps slack at 25% (vs 50% for doubling) for ~2x
        # the worst-case compile-variant count
        b = self.budgets.get(cam_uid, self.initial_budget)
        while needed is not None and needed > b:
            b = b // 2 * 3 if b & (b - 1) == 0 else b // 3 * 4
        self.budgets[cam_uid] = b
        return b

    def maybe_grow_pool(self, pending=None):
        n = int(self.state.pool.num_alive)
        cap = self.state.pool.capacity
        if n > 0.9 * cap:
            new_cap = round_capacity(cap * 2)
            pool = grow(self.state.pool, new_cap)
            opt = jax.tree.map(
                lambda m: grow_leaf(m, cap, new_cap), self.state.opt
            )
            self.state = TrainState(pool, opt, self.state.key)
            if pending is not None:
                pending = jax.tree.map(
                    lambda g: grow_leaf(g, cap, new_cap), pending)
        return pending

    def step(self, iteration: int):
        """One training iteration; returns the metrics dict (device
        arrays — only sync what you read).

        Ordering matches the reference exactly (train.py:116-155):
        backward -> densify/prune/mercy surgery -> optimizer.step.  On a
        surgery iteration torch's step() only updates params that kept a
        .grad through the surgery: all of them with --store_grads on a
        densify iteration, none on a mercy/dead-prune iteration (those
        rebuild every param without store_grads), everything except
        opacity on a reset-only iteration.  The final iteration never
        steps (train.py:153).
        """
        cfg = self.opt_cfg
        self.iteration = iteration
        if iteration % 1000 == 0:
            self.state = self.state._replace(
                pool=one_up_sh_degree(self.state.pool, self.max_sh_degree)
            )
        will_densify, will_reset, will_prune_dead, will_mercy = (
            self._events(iteration))
        surgery = will_densify or will_reset or will_prune_dead or will_mercy
        final = iteration >= cfg.iterations

        camera = self.next_camera()
        cp = camera.params()
        background = self.background
        if cfg.random_background:  # reference train.py:98
            background = jnp.asarray(
                self.rng.uniform(0.0, 1.0, 3), jnp.float32)
        while True:
            budget = self._budget_for(camera.uid)
            out = train_step(
                self.state, cp, jnp.asarray(camera.image), background,
                jnp.int32(iteration), width=camera.width,
                height=camera.height,
                budget=budget, backend=self.backend, opt_cfg=cfg,
                spatial_lr_scale=self.spatial_lr_scale,
                skip_update=surgery or final,
                grad_reduce=self.grad_reduce,
            )
            st, metrics = out[0], out[1]
            grads = out[2] if len(out) == 3 else None
            needed = int(metrics["num_rendered"])
            if needed <= budget:
                break
            # overflow: grow the bucket and redo this step exactly
            # (same camera, same background)
            self._budget_for(camera.uid, needed)
        self.state = st

        # pending gradients survive the surgery only where the reference
        # keeps .grad alive through it
        pending = grads

        # densification cadence (train.py:131-150)
        if will_densify:
            pending = self.maybe_grow_pool(pending)
            if cfg.store_grads and pending is not None:
                self.state, dstats, pending = densify_step(
                    self.state, jnp.float32(self.extent), pending,
                    opt_cfg=cfg,
                    use_size_threshold=iteration > cfg.opacity_reset_interval,
                    with_grads=True,
                )
            else:
                self.state, dstats = densify_step(
                    self.state, jnp.float32(self.extent), opt_cfg=cfg,
                    use_size_threshold=iteration > cfg.opacity_reset_interval,
                )
                pending = None  # params rebuilt without store_grads
            self.stats.update({k: int(v) for k, v in dstats.items()})
        if will_reset:
            self.state = opacity_reset_step(self.state)
        if will_prune_dead:
            self.state, n = prune_dead_step(
                self.state, jnp.float32(self.extent))
            self.stats["n_points_pruned"] = int(n)
            pending = None  # prune() is called without store_grads

        # mercy culling cadence (train.py:146-150)
        if will_mercy:
            self.scene.pool = self.state.pool
            red, _ = self.scene.calculate_redundancy_metric(
                pixel_scale=cfg.box_size)
            self.state, mstats = mercy_step(
                self.state, red, lambda_mercy=cfg.lambda_mercy,
                mercy_minimum=cfg.mercy_minimum, mercy_type=cfg.mercy_type)
            self.stats["n_points_mercied"] = int(mstats["n_points_mercied"])
            self.stats["redundancy_threshold"] = float(
                mstats["redundancy_threshold"])
            self.stats["opacity_threshold"] = float(
                mstats["opacity_threshold"])
            pending = None  # mercy_points prunes without store_grads

        # deferred optimizer.step() (train.py:153-155)
        if pending is not None and not final:
            self.state = apply_update_step(
                self.state, pending, jnp.int32(iteration), opt_cfg=cfg,
                spatial_lr_scale=self.spatial_lr_scale,
                skip_opacity=will_reset)

        # adaptive SH-band culling (train.py:168-170)
        if iteration in self.cull_sh_iterations:
            from reduced3dgs_tpu.ops.sh_culling import cull_sh_bands

            pool = cull_sh_bands(
                self.state.pool, self.cameras,
                threshold=cfg.cdist_threshold * np.sqrt(3) / 255.0,
                std_threshold=cfg.std_threshold,
                budget=max(self.budgets.values(),
                           default=self.initial_budget),
                backend=self.backend, max_sh_degree=self.max_sh_degree,
                active_sh_degree=int(self.state.pool.active_sh_degree),
            )
            self.state = self.state._replace(pool=pool)
        return metrics


def grow_leaf(x, old_cap, new_cap):
    if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == old_cap:
        pad = new_cap - old_cap
        return jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]
        )
    return x
