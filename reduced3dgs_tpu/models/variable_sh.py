"""Ragged variable-SH inference storage (the TPU take on N2).

The reference's inference path stores SH coefficients ragged — primitives
grouped by band, packed buffer indexed via getSHOffset
(forward.cu:19-36, variableSHPreprocessCUDA forward.cu:246-350) — so a
band-0 primitive costs 1 coefficient instead of 16.  Dynamic per-lane
offsets are the wrong shape for the TPU, but after SH culling the
degrees are FROZEN, so the ragged structure becomes *static*: reorder
the pool by degree once at load time and keep one dense (N_d, C_d, 3)
coefficient block per band.  SH shading is then 4 dense batched
evaluations with static shapes — no masking waste, no (P, 16, 3) dense
buffer — and everything downstream (preprocess/binning/rasterize) takes
the per-primitive colors via color_precomp.

Memory at inference: sum_d N_d * (d+1)^2 * 3 floats for SH instead of
P * 48 — identical to the reference's ragged buffer (and to the PLY's
on-disk layout, models/ply_io.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from reduced3dgs_tpu.ops import sh as sh_ops


class RaggedSH(NamedTuple):
    """Static-shape ragged SH: one packed block per band (may be empty)."""

    blocks: tuple  # per degree d: (N_d, (d+1)^2, 3) jnp array
    sizes: tuple  # static (N_0, N_1, N_2, N_3)


def build_ragged(pool):
    """Reorder the pool's ALIVE primitives by SH degree and pack coeffs.

    Returns (pool_sorted, ragged): pool_sorted has alive rows first,
    grouped by degree (stable), features_rest rows beyond each band's
    coefficient count dropped from the packed blocks.  Host-side (numpy)
    — runs once per model load.
    """
    alive = np.asarray(pool.alive)
    degrees = np.asarray(pool.degrees)
    # alive rows grouped by degree, stable (dead rows go last, untouched)
    key = np.where(alive, degrees, 99)
    order = np.argsort(key, kind="stable")
    reorder = lambda x: jnp.asarray(np.asarray(x)[order])  # noqa: E731
    pool = pool._replace(
        params=jax.tree.map(reorder, pool.params),
        degrees=reorder(pool.degrees),
        alive=reorder(pool.alive),
        max_radii2d=reorder(pool.max_radii2d),
        xyz_grad_accum=reorder(pool.xyz_grad_accum),
        denom=reorder(pool.denom),
    )
    deg_sorted = np.asarray(pool.degrees)
    alive_sorted = np.asarray(pool.alive)
    feats = np.concatenate(
        [np.asarray(pool.params.features_dc),
         np.asarray(pool.params.features_rest)], axis=1)  # (P, 16, 3)
    blocks, sizes = [], []
    start = 0
    for d in range(4):
        n = int(((deg_sorted == d) & alive_sorted).sum())
        c = (d + 1) ** 2
        blocks.append(jnp.asarray(feats[start:start + n, :c]))
        sizes.append(n)
        start += n
    return pool, RaggedSH(blocks=tuple(blocks), sizes=tuple(sizes))


def eval_colors(ragged: RaggedSH, xyz, campos):
    """Per-primitive clamped RGB for the first sum(sizes) (alive, degree-
    sorted) rows; rows past that get zeros.  4 static dense batches."""
    p = xyz.shape[0]
    dirs_all = xyz - campos[None, :]
    dirs_all = dirs_all / jnp.maximum(
        jnp.linalg.norm(dirs_all, axis=-1, keepdims=True), 1e-12)
    outs = []
    start = 0
    for d, (blk, n) in enumerate(zip(ragged.blocks, ragged.sizes)):
        if n == 0:
            continue
        dirs = jax.lax.dynamic_slice_in_dim(dirs_all, start, n, 0)
        deg = jnp.full((n,), d, jnp.int32)
        outs.append(sh_ops.eval_sh_color_clamped(blk, dirs, deg))
        start += n
    total = sum(ragged.sizes)
    if outs:
        colors = jnp.concatenate(outs, axis=0)
    else:
        colors = jnp.zeros((0, 3), jnp.float32)
    return jnp.concatenate(
        [colors, jnp.zeros((p - total, 3), jnp.float32)], axis=0)
