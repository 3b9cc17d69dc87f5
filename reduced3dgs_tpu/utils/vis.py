"""Visualisation / debugging utilities (developer tools).

Counterpart of utils/visualisation_utils.py: loss-image dumps with a
colormap, tensor viewers, and an ellipsoid shape classifier.
"""

from __future__ import annotations

import numpy as np


def save_image(path, array):
    """(H,W,3) or (H,W) float [0,1] -> PNG."""
    from PIL import Image

    a = np.asarray(array)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, 2)
    Image.fromarray((np.clip(a, 0, 1) * 255).astype(np.uint8)).save(path)


def colormap_turbo(values):
    """Map [0,1] scalars to turbo-like RGB via matplotlib."""
    import matplotlib.cm as cm

    return cm.get_cmap("turbo")(np.clip(np.asarray(values), 0, 1))[..., :3]


def save_loss_image(path, pred, gt):
    """|pred - gt| per pixel with colormap (visualisation_utils.py gif
    dumps)."""
    err = np.abs(np.asarray(pred) - np.asarray(gt)).mean(axis=-1)
    save_image(path, colormap_turbo(err / max(err.max(), 1e-8)))


def classify_ellipsoids(scales, eps=2.0):
    """Shape classifier (visualisation_utils.py): for each primitive's
    sorted scales s1<=s2<=s3 return 0=sphere-ish, 1=disc, 2=needle."""
    s = np.sort(np.exp(np.asarray(scales)), axis=1)
    needle = s[:, 2] > eps * s[:, 1]
    disc = ~needle & (s[:, 1] > eps * s[:, 0])
    return np.where(needle, 2, np.where(disc, 1, 0))
