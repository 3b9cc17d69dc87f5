"""Visualisation / debugging utilities (developer tools).

Counterpart of the reference's utils/visualisation_utils.py (387 LoC):
loss-image GIF dumps with the turbo colormap, tensor viewers, the
ellipsoid shape classifier, and the COLMAP-text camera-path reader.
Arrays are channel-LAST (H, W, C) numpy/jax (this framework's image
convention) where the torch reference is channel-first.
"""

from __future__ import annotations

import os
from collections import namedtuple
from pathlib import Path

import numpy as np


def normalise_tensor(a):
    """Min-max normalise to [0, 1] (visualisation_utils.py:27-28)."""
    a = np.asarray(a, np.float32)
    span = a.max() - a.min()
    return (a - a.min()) / (span if span > 0 else 1.0)


def colormap_turbo(values):
    """Map [0,1] scalars to turbo RGB.  matplotlib's 'turbo' is the
    same Google colormap the reference embeds as a 256-entry tensor
    (visualisation_utils.py:129-387)."""
    import matplotlib

    cmap = matplotlib.colormaps["turbo"]
    return np.asarray(cmap(np.clip(np.asarray(values), 0, 1)))[..., :3]


def save_image(path, array):
    """(H,W,3) or (H,W) float [0,1] -> image file."""
    from PIL import Image

    a = np.asarray(array)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, 2)
    Image.fromarray((np.clip(a, 0, 1) * 255).astype(np.uint8)).save(path)


def save_loss_image(path, pred, gt):
    """|pred - gt| per pixel with the turbo colormap."""
    err = np.abs(np.asarray(pred) - np.asarray(gt)).mean(axis=-1)
    save_image(path, colormap_turbo(err / max(err.max(), 1e-8)))


def save_gif_images(path, loss_img, image, index, iteration, loss_name,
                    normalise=False):
    """One GIF frame: [colormapped loss | rendered image] side by side
    (visualisation_utils.py:8-14).  loss_img: (H, W) or (H, W, C)
    per-pixel loss; image: (H, W, 3) in [0, 1]."""
    loss_img = np.asarray(loss_img, np.float32)
    if loss_img.ndim == 3:
        loss_img = loss_img.mean(axis=-1)
    if normalise:
        loss_img = normalise_tensor(loss_img)
    lhs = colormap_turbo(loss_img)
    combined = np.concatenate(
        [lhs, np.clip(np.asarray(image), 0, 1)], axis=1)
    save_image(os.path.join(path, f"{loss_name}_{index}_{iteration}.jpg"),
               combined)


def generate_gif(path, index):
    """Assemble the frames save_gif_images wrote for view `index` into
    gif_<index>.gif, ordered by iteration
    (visualisation_utils.py:16-25)."""
    from PIL import Image

    def get_iteration(name):
        return int(name[:-4].split("_")[-1])

    names = sorted(
        (n for n in os.listdir(path)
         if f"_{index}_" in n and n.endswith(".jpg")),
        key=get_iteration)
    images = [Image.open(os.path.join(path, n)) for n in names]
    if not images:
        raise FileNotFoundError(f"no frames for index {index} in {path}")
    out = os.path.join(path, f"gif_{index}.gif")
    images[0].save(out, save_all=True, append_images=images[1:], loop=0,
                   duration=200)
    return out


def save_tensor(path, a, use_colormap=False):
    """Dump any (H,W[,3]) tensor as an image, optionally colormapped —
    the headless counterpart of the reference's show_tensor
    (visualisation_utils.py:30-38; this environment has no display)."""
    a = np.asarray(a, np.float32)
    if use_colormap:
        a = colormap_turbo(normalise_tensor(a))
    else:
        a = normalise_tensor(a)
    save_image(path, a)


def compute_shape(scale):
    """Ellipsoid shape classifier with the reference's exact thresholds
    (visualisation_utils.py:67-77): ACTIVATED scales (N, 3) ->
    0 = blob, 1 = disc/pancake, 2 = needle.  With s_max/s_min > 5:
    needle when the middle axis stays small relative to the elongation
    (rest/min < (max/min)/3), disc when it tracks it
    (rest/min > (max/min)/2)."""
    scale = np.asarray(scale, np.float32)
    max_scale = scale.max(axis=1)
    min_scale = scale.min(axis=1)
    rest_scale = scale.sum(axis=1) - min_scale - max_scale
    shape = np.zeros(scale.shape[0], dtype=np.int64)
    elong = max_scale / min_scale
    rest = rest_scale / min_scale
    shape[np.logical_and(elong > 5, rest < elong / 3)] = 2
    shape[np.logical_and(elong > 5, rest > elong / 2)] = 1
    return shape


def classify_ellipsoids(scales_raw):
    """compute_shape over RAW (log-space) pool scales."""
    return compute_shape(np.exp(np.asarray(scales_raw)))


VisCamera = namedtuple("VisCamera",
                       ["position", "direction", "up", "fov", "aspect"])


def read_camera_path(path: str):
    """COLMAP-text camera path -> list of VisCamera (position, forward,
    up, vertical fov, aspect) for fly-through rendering
    (visualisation_utils.py:79-127).  Reads cameras.txt (PINHOLE-style
    rows: id model w h fx fy cx cy) and images.txt (qvec wxyz, tvec)."""
    from reduced3dgs_tpu.data.colmap import qvec2rotmat

    cameras_file = Path(path) / "cameras.txt"
    images_file = Path(path) / "images.txt"
    if not cameras_file.exists() or not images_file.exists():
        raise FileNotFoundError(f"cameras.txt/images.txt not in {path}")

    params = {}
    with open(cameras_file) as f:
        for line in f:
            if not line.strip() or line[0] == "#":
                continue
            t = line.split()
            params[int(t[0])] = (int(t[2]), int(t[3]), float(t[4]),
                                 float(t[5]))

    # the reference flips into its viewer convention: y/z negated
    conv = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float64)
    cams = []
    with open(images_file) as f:
        for line in f:
            if not line.strip() or line[0] == "#":
                continue
            t = line.split()
            if len(t) < 9:
                continue  # 2D-point lines
            q = np.array([float(x) for x in t[1:5]])
            tvec = np.array([float(x) for x in t[5:8]])
            w, h, fx, fy = params[int(t[8])]
            rot = qvec2rotmat(q)
            orientation = rot.T @ conv
            position = -(orientation @ conv @ tvec)
            fov = 2.0 * np.arctan(0.5 * h / fy)
            cams.append(VisCamera(position, -orientation[:, -1],
                                  orientation[:, 1], fov, w / h))
    return cams
