"""LPIPS (VGG16) perceptual metric in JAX.

Mirror of the reference lpipsPyTorch/ (modules/lpips.py:8-36,
networks.py, utils.py): scaled inputs, VGG16 feature stacks at the 5
relu blocks, unit-normalized channels, learned 1x1 linear heads, mean
over space and layers.

The reference downloads torchvision/lpips weights at runtime; this
environment has no network access, so weights must be provided as an
.npz at $R3DGS_LPIPS_WEIGHTS or <repo>/weights/lpips_vgg.npz with keys
  conv{i}_weight / conv{i}_bias   (13 VGG convs, OIHW)
  lin{k}_weight                   (5 LPIPS heads, (1, C, 1, 1))
`lpips_fn()` returns None when unavailable (metrics.py then reports
LPIPS as n/a) — the graceful-degradation path.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

# VGG16 conv plan: (out_channels, pool_before)
_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512]
# relu indices (after which conv, 0-based) that feed LPIPS
_TAPS = (1, 3, 6, 9, 12)  # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _weights_path():
    return os.environ.get(
        "R3DGS_LPIPS_WEIGHTS",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))),
            "weights", "lpips_vgg.npz"),
    )


def load_weights(path=None):
    path = path or _weights_path()
    if not os.path.exists(path):
        return None
    data = np.load(path)
    convs = []
    i = 0
    while f"conv{i}_weight" in data:
        convs.append((data[f"conv{i}_weight"], data[f"conv{i}_bias"]))
        i += 1
    lins = [data[f"lin{k}_weight"] for k in range(5)]
    return convs, lins


def lpips_fn(path=None):
    """Returns lpips(img1, img2) over (H,W,3) [0,1] images, or None if
    weights are unavailable."""
    w = load_weights(path)
    if w is None:
        return None
    convs, lins = w

    import jax
    import jax.numpy as jnp

    convs = [(jnp.asarray(k), jnp.asarray(b)) for k, b in convs]
    lins = [jnp.asarray(l) for l in lins]

    def features(x):  # x: (1, 3, H, W) normalized
        feats = []
        ci = 0
        for spec in _VGG_CFG:
            if spec == "M":
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                    "VALID")
                continue
            k, b = convs[ci]
            x = jax.lax.conv_general_dilated(
                x, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            x = jax.nn.relu(x + b[None, :, None, None])
            if ci in _TAPS:
                feats.append(x)
            ci += 1
        return feats

    @jax.jit
    def lpips(img1, img2):
        def prep(img):
            x = img.transpose(2, 0, 1)[None] * 2.0 - 1.0  # [-1, 1] NCHW
            return (x - _SHIFT[None, :, None, None]) / _SCALE[
                None, :, None, None]

        f1, f2 = features(prep(img1)), features(prep(img2))
        total = 0.0
        for a, b, lin in zip(f1, f2, lins):
            a = a / jnp.maximum(
                jnp.linalg.norm(a, axis=1, keepdims=True), 1e-10)
            b = b / jnp.maximum(
                jnp.linalg.norm(b, axis=1, keepdims=True), 1e-10)
            d = (a - b) ** 2
            total = total + (d * lin[None, :, :, 0:1] if lin.ndim == 3
                             else d * lin.reshape(1, -1, 1, 1)).sum(
                                 axis=1).mean()
        return total

    return lpips


def export_weights_from_torch(out_path=None):
    """Developer utility: convert torchvision VGG16 + lpips linear heads
    (when available in some environment) into the npz format above."""
    import torch
    import torchvision

    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features
    arrays = {}
    ci = 0
    for m in vgg:
        if isinstance(m, torch.nn.Conv2d):
            arrays[f"conv{ci}_weight"] = m.weight.detach().numpy()
            arrays[f"conv{ci}_bias"] = m.bias.detach().numpy()
            ci += 1
    import lpips as lpips_pkg  # the pip package, for the linear heads

    net = lpips_pkg.LPIPS(net="vgg")
    for k, lin in enumerate(net.lins):
        arrays[f"lin{k}_weight"] = (
            lin.model[-1].weight.detach().numpy())
    out_path = out_path or _weights_path()
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez(out_path, **arrays)
    return out_path
