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


def _gaussian_1d(window_size: int, sigma: float) -> np.ndarray:
    g = np.exp(
        -((np.arange(window_size) - window_size // 2) ** 2) / (2.0 * sigma ** 2)
    )
    return (g / g.sum()).astype(np.float32)


def _moments(img1, img2):
    """Stack the 5 windowed-moment integrands on the batch axis so one
    depthwise conv covers them all: [i1, i2, i1*i1, i2*i2, i1*i2]."""
    return jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=0)


def _sep_conv(x, win, c, h_pad, v_pad):
    """Separable depthwise Gaussian blur: horizontal pass then vertical.

    The reference's 11x11 window (loss_utils.py:23-66) is an outer
    product of a 1-D Gaussian, so two 11-tap passes are exact and ~5x
    cheaper.  Horizontal runs FIRST in both `ssim` and `ssim_band_sum`
    so the band decomposition stays numerically identical per row.
    v_pad=None means a valid vertical conv (used by the band variant).
    """
    kh = jnp.tile(win[None, :, None, None], (1, 1, 1, c))
    kv = jnp.tile(win[:, None, None, None], (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    # f32 taps (not TPU-default bf16): the reference computes SSIM in
    # f32 (loss_utils.py) and bf16 costs ~2e-3 in the map; these 11-tap
    # depthwise passes are negligible FLOPs either way.
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [(0, 0), (h_pad, h_pad)],
        dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    vp = (0, 0) if v_pad is None else (v_pad, v_pad)
    return jax.lax.conv_general_dilated(
        x, kv, (1, 1), [vp, (0, 0)],
        dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)


def _ssim_map(m, n):
    """SSIM map from the blurred moment stack (5n, ...) -> (n, ...)."""
    mu1, mu2, e11, e22, e12 = (m[i * n:(i + 1) * n] for i in range(5))
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = e11 - mu1_sq
    sigma2_sq = e22 - mu2_sq
    sigma12 = e12 - mu1_mu2
    return ((2 * mu1_mu2 + _C1) * (2 * sigma12 + _C2)) / (
        (mu1_sq + mu2_sq + _C1) * (sigma1_sq + sigma2_sq + _C2)
    )


@partial(jax.jit, static_argnames=("window_size",))
def ssim(img1, img2, window_size: int = 11):
    """Mean SSIM over an (H,W,C) image pair, matching the reference's
    per-channel grouped conv with same-padding (loss_utils.py:23-66)."""
    if img1.ndim == 3:
        img1 = img1[None]
        img2 = img2[None]
    n, h, w, c = img1.shape
    win = jnp.asarray(_gaussian_1d(window_size, 1.5))
    pad = window_size // 2
    m = _sep_conv(_moments(img1, img2), win, c, pad, pad)
    return _ssim_map(m, n).mean()


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
    win = jnp.asarray(_gaussian_1d(window_size, 1.5))
    # pad so the slab slice never clamps (jax clamps dynamic_slice starts)
    extra = band_rows
    p1 = jnp.pad(img1, ((pad, pad + extra), (0, 0), (0, 0)))[None]
    p2 = jnp.pad(img2, ((pad, pad + extra), (0, 0), (0, 0)))[None]
    slab_rows = band_rows + 2 * pad

    def slab(x):
        return jax.lax.dynamic_slice_in_dim(x, band_start, slab_rows, 1)

    # horizontal (same-padded) first, then vertical VALID over the slab:
    # slab_rows -> band_rows, identical arithmetic to `ssim`'s rows
    m = _sep_conv(_moments(slab(p1), slab(p2)), win, c, pad, None)
    ssim_map = _ssim_map(m, 1)  # (1, band_rows, W, C)
    row = band_start + jnp.arange(band_rows)
    ok = (row < h).astype(ssim_map.dtype)[None, :, None, None]
    return (ssim_map * ok).sum()
