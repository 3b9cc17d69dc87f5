"""Training losses / image metrics (JAX).

Mirrors reference utils/loss_utils.py (L1, windowed SSIM with an 11x11
sigma-1.5 Gaussian window) and utils/image_utils.py (PSNR).  Images are
(..., H, W, C) channels-last (TPU-friendly); the reference uses CHW.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2


def l1_loss(pred, target):
    return jnp.abs(pred - target).mean()


def l2_loss(pred, target):
    return ((pred - target) ** 2).mean()


def psnr(pred, target):
    """Per-image PSNR, inputs (..., H, W, C) in [0,1]."""
    mse = ((pred - target) ** 2).reshape(pred.shape[:-3] + (-1,)).mean(axis=-1)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    g = np.exp(
        -((np.arange(window_size) - window_size // 2) ** 2) / (2.0 * sigma ** 2)
    )
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


@partial(jax.jit, static_argnames=("window_size",))
def ssim(img1, img2, window_size: int = 11):
    """Mean SSIM over an (H,W,C) image pair, matching the reference's
    per-channel grouped conv with same-padding (loss_utils.py:23-66)."""
    if img1.ndim == 3:
        img1 = img1[None]
        img2 = img2[None]
    n, h, w, c = img1.shape
    win = jnp.asarray(_gaussian_window(window_size, 1.5))
    # depthwise conv: kernel (H,W,1,C) with feature_group_count=C
    kernel = jnp.tile(win[:, :, None, None], (1, 1, 1, c))
    pad = window_size // 2
    dn = jax.lax.conv_dimension_numbers(img1.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))

    def f(x):
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=dn, feature_group_count=c,
        )

    mu1, mu2 = f(img1), f(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = f(img1 * img1) - mu1_sq
    sigma2_sq = f(img2 * img2) - mu2_sq
    sigma12 = f(img1 * img2) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + _C1) * (2 * sigma12 + _C2)) / (
        (mu1_sq + mu2_sq + _C1) * (sigma1_sq + sigma2_sq + _C2)
    )
    return ssim_map.mean()


def ssim_band_sum(img1, img2, band_start, band_rows: int,
                  window_size: int = 11):
    """Sum of the same-padded SSIM map over image rows
    [band_start, band_start + band_rows) intersected with [0, H).

    The band decomposition of `ssim`: a valid conv over a slab of the
    zero-padded image equals the same-padded conv's map rows for that
    band, so tile-parallel devices can each compute one band and psum —
    instead of serializing the full 11x11 conv on one member
    (parallel/sharded.py).  band_start may be traced; band_rows is
    static.  sum(ssim_band_sum over a disjoint row cover) / (H*W*C)
    == ssim(img1, img2) exactly.
    """
    h, w, c = img1.shape
    pad = window_size // 2
    win = jnp.asarray(_gaussian_window(window_size, 1.5))
    kernel = jnp.tile(win[:, :, None, None], (1, 1, 1, c))
    # pad so the slab slice never clamps (jax clamps dynamic_slice starts)
    extra = band_rows
    p1 = jnp.pad(img1, ((pad, pad + extra), (0, 0), (0, 0)))[None]
    p2 = jnp.pad(img2, ((pad, pad + extra), (0, 0), (0, 0)))[None]
    slab_rows = band_rows + 2 * pad

    def slab(x):
        return jax.lax.dynamic_slice_in_dim(x, band_start, slab_rows, 1)

    s1, s2 = slab(p1), slab(p2)
    dn = jax.lax.conv_dimension_numbers(
        s1.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))

    def f(x):
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), [(0, 0), (pad, pad)],
            dimension_numbers=dn, feature_group_count=c,
        )

    mu1, mu2 = f(s1), f(s2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = f(s1 * s1) - mu1_sq
    sigma2_sq = f(s2 * s2) - mu2_sq
    sigma12 = f(s1 * s2) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + _C1) * (2 * sigma12 + _C2)) / (
        (mu1_sq + mu2_sq + _C1) * (sigma1_sq + sigma2_sq + _C2)
    )  # (1, band_rows, W, C)
    row = band_start + jnp.arange(band_rows)
    ok = (row < h).astype(ssim_map.dtype)[None, :, None, None]
    return (ssim_map * ok).sum()
