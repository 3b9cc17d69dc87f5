"""End-to-end CLI pipeline on a tiny on-disk Blender-style dataset:

  train.py -> render.py -> metrics.py -> compress.py

mirroring the reference workflows (README.md usage).  Runs each CLI in a
subprocess with R3DGS_PLATFORM=cpu.
"""

import json
import math
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_blender_dataset(root, n_train=4, n_test=2, size=64):
    """Render a known Gaussian scene into a transforms_train/test dataset."""
    import jax.numpy as jnp
    from PIL import Image

    from reduced3dgs_tpu.cameras import Camera
    from reduced3dgs_tpu.renderer import render

    rng = np.random.default_rng(0)
    n = 32
    xyz = rng.uniform(-0.7, 0.7, (n, 3)).astype(np.float32)
    feats = np.zeros((n, 16, 3), np.float32)
    feats[:, 0] = rng.uniform(-1.0, 1.5, (n, 3))
    scales = np.log(rng.uniform(0.08, 0.2, (n, 3))).astype(np.float32)
    rots = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    opac = rng.uniform(1.0, 3.0, n).astype(np.float32)
    deg = np.zeros(n, np.int32)
    fov_x = math.radians(60)

    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    os.makedirs(os.path.join(root, "test"), exist_ok=True)

    def dump(split, count, offset):
        frames = []
        for i in range(count):
            a = offset + i * 2 * math.pi / max(count, 1)
            eye = np.array([math.cos(a) * 3, 0.4, math.sin(a) * 3])
            cam = Camera.look_at(eye=eye, target=(0, 0, 0), fov_x=fov_x,
                                 width=size, height=size, uid=i)
            out = render(
                jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(scales),
                jnp.asarray(rots), jnp.asarray(opac), jnp.asarray(deg),
                cam.params(), jnp.zeros(3), width=size, height=size,
                instance_budget=4096)
            img = np.clip(np.asarray(out.color), 0, 1)
            fname = f"{split}/r_{i}"
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(root, fname + ".png"))
            # camera-to-world in blender convention (reverse of reader)
            w2c = np.eye(4)
            w2c[:3, :3] = cam.R.T
            w2c[:3, 3] = cam.T
            c2w = np.linalg.inv(w2c)
            c2w[:3, 1:3] *= -1
            frames.append({"file_path": fname,
                           "transform_matrix": c2w.tolist()})
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": fov_x, "frames": frames}, f)

    dump("train", n_train, 0.0)
    dump("test", n_test, 0.3)

    # small init cloud (otherwise the Blender reader generates 100k
    # random points, dataset_readers.py:221-235 — too slow for CI)
    from reduced3dgs_tpu.data.dataset_readers import store_point_cloud_ply

    pts = rng.uniform(-0.9, 0.9, (400, 3))
    cols = (rng.uniform(0, 1, (400, 3)) * 255).astype(np.uint8)
    store_point_cloud_ply(os.path.join(root, "points3d.ply"), pts, cols)


def _rotmat2qvec(R):
    """Rotation matrix -> (w,x,y,z) quaternion (inverse of
    colmap.qvec2rotmat; standard Shepperd construction)."""
    t = np.trace(R)
    if t > 0:
        s = math.sqrt(t + 1.0) * 2
        return np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                         (R[0, 2] - R[2, 0]) / s,
                         (R[1, 0] - R[0, 1]) / s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = math.sqrt(1.0 + R[i, i] - R[j, j] - R[k, k]) * 2
    q = np.empty(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q


def make_colmap_dataset(root, n_images=8, size=64):
    """Write a deterministic miniature binary COLMAP scene to disk:
    sparse/0/{cameras,images,points3D}.bin + images/*.png renders of a
    known Gaussian world (binary formats per colmap.github.io/format;
    the reference consumes them via scene/colmap_loader.py)."""
    import struct

    import jax.numpy as jnp
    from PIL import Image

    from reduced3dgs_tpu.cameras import Camera
    from reduced3dgs_tpu.renderer import render

    rng = np.random.default_rng(1)
    n = 32
    xyz = rng.uniform(-0.7, 0.7, (n, 3)).astype(np.float32)
    feats = np.zeros((n, 16, 3), np.float32)
    feats[:, 0] = rng.uniform(-1.0, 1.5, (n, 3))
    scales = np.log(rng.uniform(0.08, 0.2, (n, 3))).astype(np.float32)
    rots = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    opac = rng.uniform(1.0, 3.0, n).astype(np.float32)
    deg = np.zeros(n, np.int32)
    fov_x = math.radians(60)
    focal = size / (2.0 * math.tan(fov_x / 2.0))

    sparse = os.path.join(root, "sparse", "0")
    os.makedirs(sparse, exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)

    # cameras.bin: one SIMPLE_PINHOLE (model_id 0, params f, cx, cy)
    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 0, size, size))
        f.write(struct.pack("<3d", focal, size / 2.0, size / 2.0))

    # images.bin + rendered pngs
    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_images))
        for i in range(n_images):
            a = i * 2 * math.pi / n_images
            eye = np.array([math.cos(a) * 3, 0.4, math.sin(a) * 3])
            cam = Camera.look_at(eye=eye, target=(0, 0, 0), fov_x=fov_x,
                                 width=size, height=size, uid=i)
            out = render(
                jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(scales),
                jnp.asarray(rots), jnp.asarray(opac), jnp.asarray(deg),
                cam.params(), jnp.zeros(3), width=size, height=size,
                instance_budget=4096)
            img = np.clip(np.asarray(out.color), 0, 1)
            name = f"img_{i:03d}.png"
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(root, "images", name))
            # COLMAP stores world->camera: our reader does
            # R = qvec2rotmat(qvec).T, T = tvec (data/colmap.py), and
            # Camera stores R = c2w rotation, T = w2c translation
            qvec = _rotmat2qvec(cam.R.T)
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", *qvec))
            f.write(struct.pack("<3d", *cam.T))
            f.write(struct.pack("<i", 1))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 0))  # no 2D points

    # points3D.bin
    pts = rng.uniform(-0.9, 0.9, (400, 3))
    cols = (rng.uniform(0, 1, (400, 3)) * 255).astype(np.uint8)
    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(pts)))
        for i, (p, c) in enumerate(zip(pts, cols)):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<3d", *p))
            f.write(struct.pack("<3B", *c))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 0))  # empty track


def run_cli(script, *args, cwd=REPO, timeout=1500):
    env = dict(os.environ, R3DGS_PLATFORM="cpu", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get(
                   "PYTHONPATH", ""))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, (
        f"{script} failed:\nSTDOUT:{r.stdout[-3000:]}\n"
        f"STDERR:{r.stderr[-3000:]}")
    return r


@pytest.mark.slow
def test_cli_pipeline(tmp_path):
    data = str(tmp_path / "scene")
    model = str(tmp_path / "model")
    make_blender_dataset(data)

    run_cli("train.py", "-s", data, "-m", model, "--eval",
            "--iterations", "120", "--densify_from_iter", "40",
            "--densification_interval", "60",
            "--opacity_reset_interval", "10000",
            "--test_iterations", "120", "--save_iterations", "120",
            "--checkpoint_iterations", "120")
    assert os.path.exists(os.path.join(
        model, "point_cloud", "iteration_120", "point_cloud.ply"))
    assert os.path.exists(os.path.join(
        model, "point_cloud", "iteration_120",
        "point_cloud_quantised_half.ply"))
    assert os.path.exists(os.path.join(model, "cfg_args"))
    assert os.path.exists(os.path.join(model, "chkpnt120.npz"))

    run_cli("render.py", "-m", model, "--models", "baseline",
            "quantised_half", "--skip_train")
    renders = os.path.join(model, "test", "baseline", "ours_120", "renders")
    assert len(os.listdir(renders)) == 2
    assert os.path.exists(os.path.join(model, "fps_results.json"))

    run_cli("metrics.py", "-m", model)
    with open(os.path.join(model, "results.json")) as f:
        results = json.load(f)
    key = "test_baseline/ours_120"
    assert results[key]["PSNR"] > 14, results

    # quantised_half renders should be close to baseline quality
    qkey = "test_quantised_half/ours_120"
    assert results[qkey]["PSNR"] > results[key]["PSNR"] - 6, results

    # offline compressor with the framework extensions: pack-xyz codec
    # + opacity pruning + a short fine-tune (compress.py docstring)
    run_cli("compress.py", "-m", model, "--pack_xyz",
            "--prune_frac", "0.1", "--finetune_iters", "8")
    q = os.path.join(model, "point_cloud", "iteration_120",
                     "point_cloud_quantised_half.ply")
    base = os.path.join(model, "point_cloud", "iteration_120",
                        "point_cloud.ply")
    assert os.path.getsize(q) < os.path.getsize(base)
    pack = os.path.join(model, "point_cloud", "iteration_120",
                        "point_cloud_quantised_pack.ply")
    assert os.path.getsize(pack) < os.path.getsize(base)

    # results aggregation (generate_results.py): memory model + metrics
    # merge into the summary table (reference generate_results.py:43-138)
    run_cli("generate_results.py", "-m", model, "--iteration", "120")
    import csv
    with open(os.path.join(os.path.dirname(model), "summary.csv")) as f:
        rows = list(csv.DictReader(f))
    variants = {r["variant"] for r in rows}
    assert {"baseline", "quantised_half"} <= variants
    for r in rows:
        assert float(r["disk_MB"]) > 0
        if r["variant"] == "quantised_half":
            assert float(r["compression_x"]) > 4.0, r


@pytest.mark.slow
def test_cli_pipeline_colmap(tmp_path):
    """Same chain over an on-disk binary COLMAP scene — exercises the
    sparse/ detection, binary parsers, every-8th eval split
    (reference scene/dataset_readers.py:132-177) end to end."""
    data = str(tmp_path / "scene")
    model = str(tmp_path / "model")
    make_colmap_dataset(data)

    run_cli("train.py", "-s", data, "-m", model, "--eval",
            "--iterations", "120", "--densify_from_iter", "40",
            "--densification_interval", "60",
            "--opacity_reset_interval", "10000",
            "--test_iterations", "120", "--save_iterations", "120")
    assert os.path.exists(os.path.join(
        model, "point_cloud", "iteration_120", "point_cloud.ply"))

    run_cli("render.py", "-m", model, "--models", "baseline",
            "--skip_train")
    renders = os.path.join(model, "test", "baseline", "ours_120",
                           "renders")
    # every-8th split: 8 images -> 1 test camera
    assert len(os.listdir(renders)) == 1

    run_cli("metrics.py", "-m", model)
    with open(os.path.join(model, "results.json")) as f:
        results = json.load(f)
    assert results["test_baseline/ours_120"]["PSNR"] > 14, results
