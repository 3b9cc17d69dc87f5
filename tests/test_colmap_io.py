"""COLMAP binary parsers: native C++ path vs pure-python fallback."""

import os
import struct

import numpy as np

from reduced3dgs_tpu.data import colmap


def write_points3d_bin(path, xyz, rgb, err, track_lens):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(xyz)))
        for i in range(len(xyz)):
            f.write(struct.pack("<Q", i + 1))
            f.write(struct.pack("<3d", *xyz[i]))
            f.write(struct.pack("<3B", *rgb[i]))
            f.write(struct.pack("<d", err[i]))
            f.write(struct.pack("<Q", track_lens[i]))
            f.write(b"\x00" * (8 * track_lens[i]))


def write_images_bin(path, images):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for iid, qvec, tvec, cam_id, name, npts in images:
            f.write(struct.pack("<i", iid))
            f.write(struct.pack("<4d", *qvec))
            f.write(struct.pack("<3d", *tvec))
            f.write(struct.pack("<i", cam_id))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", npts))
            f.write(b"\x00" * (24 * npts))


def test_points3d_native_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    n = 500
    xyz = rng.normal(0, 10, (n, 3))
    rgb = rng.integers(0, 256, (n, 3)).astype(np.uint8)
    err = rng.uniform(0, 2, n)
    tracks = rng.integers(0, 9, n)
    path = str(tmp_path / "points3D.bin")
    write_points3d_bin(path, xyz, rgb, err, tracks)

    x1, r1, e1 = colmap.read_points3d_binary(path)
    assert colmap._native_lib() is not None, "native build failed"
    np.testing.assert_allclose(x1, xyz, atol=1e-5)
    np.testing.assert_array_equal(r1, rgb)
    np.testing.assert_allclose(e1, err)

    # python fallback parity
    saved = colmap._NATIVE
    colmap._NATIVE = None
    try:
        x2, r2, e2 = colmap.read_points3d_binary(path)
    finally:
        colmap._NATIVE = saved
    np.testing.assert_allclose(x1, x2, atol=1e-5)
    np.testing.assert_array_equal(r1, r2)


def test_images_native_matches_python(tmp_path):
    rng = np.random.default_rng(1)
    images = [
        (i + 1, rng.normal(0, 1, 4), rng.normal(0, 1, 3), 1,
         f"frame_{i:04d}.jpg", int(rng.integers(0, 50)))
        for i in range(20)
    ]
    path = str(tmp_path / "images.bin")
    write_images_bin(path, images)

    got = colmap.read_images_binary(path)
    assert len(got) == 20
    saved = colmap._NATIVE
    colmap._NATIVE = None
    try:
        ref = colmap.read_images_binary(path)
    finally:
        colmap._NATIVE = saved
    for iid in ref:
        np.testing.assert_allclose(got[iid].qvec, ref[iid].qvec)
        np.testing.assert_allclose(got[iid].tvec, ref[iid].tvec)
        assert got[iid].name == ref[iid].name
        assert got[iid].camera_id == ref[iid].camera_id
