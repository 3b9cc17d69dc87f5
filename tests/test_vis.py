"""Visualisation dev tools (utils/vis.py) — reference semantics
(visualisation_utils.py): GIF frame dump + assembly, exact shape
classifier thresholds, COLMAP-text camera-path reader."""

import os

import numpy as np

from reduced3dgs_tpu.utils import vis


def test_gif_frames_and_assembly(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (16, 24, 3))
    for it in (10, 2, 30):  # unordered on purpose (sorted by iteration)
        loss = rng.uniform(0, 1, (16, 24))
        vis.save_gif_images(str(tmp_path), loss, img, index=0,
                            iteration=it, loss_name="l1", normalise=True)
    out = vis.generate_gif(str(tmp_path), 0)
    assert os.path.exists(out)
    from PIL import Image

    g = Image.open(out)
    assert g.n_frames == 3
    # frames are [loss | image] side by side
    assert g.size == (48, 16)


def test_compute_shape_reference_thresholds():
    """Hand cases against visualisation_utils.py:67-77: elongation
    max/min > 5 splits needle (rest/min < elong/3) from disc
    (rest/min > elong/2); anything else is a blob."""
    scales = np.array([
        [1.0, 1.1, 0.9],     # blob: elongation ~1.2
        [10.0, 1.0, 1.5],    # needle: elong 10, rest 1.5 < 10/3
        [10.0, 1.0, 9.0],    # disc: elong 10, rest 9 > 10/2
        [10.0, 1.0, 4.0],    # neither branch (between /3 and /2): blob
    ])
    np.testing.assert_array_equal(
        vis.compute_shape(scales), [0, 2, 1, 0])
    # classify_ellipsoids takes RAW log scales
    np.testing.assert_array_equal(
        vis.classify_ellipsoids(np.log(scales)), [0, 2, 1, 0])


def test_read_camera_path(tmp_path):
    (tmp_path / "cameras.txt").write_text(
        "# cameras\n"
        "1 PINHOLE 640 480 500.0 500.0 320.0 240.0\n")
    # identity pose + one translated pose
    (tmp_path / "images.txt").write_text(
        "# images\n"
        "1 1 0 0 0 0 0 0 1 a.jpg\n"
        "\n"
        "2 1 0 0 0 1 2 3 1 b.jpg\n"
        "\n")
    cams = vis.read_camera_path(str(tmp_path))
    assert len(cams) == 2
    c0, c1 = cams
    # identity: camera center at origin, forward +z in the viewer
    # convention (y/z flip), vertical fov = 2 atan(h / (2 fy))
    np.testing.assert_allclose(c0.position, 0, atol=1e-12)
    np.testing.assert_allclose(c0.direction, [0, 0, 1], atol=1e-12)
    np.testing.assert_allclose(c0.up, [0, -1, 0], atol=1e-12)
    np.testing.assert_allclose(c0.fov, 2 * np.arctan(480 / (2 * 500.0)))
    assert abs(c0.aspect - 640 / 480) < 1e-12
    # independent invariant: position == COLMAP camera center -R^T t
    np.testing.assert_allclose(c1.position, -np.array([1.0, 2.0, 3.0]),
                               atol=1e-12)
