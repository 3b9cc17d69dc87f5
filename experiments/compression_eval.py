#!/usr/bin/env python
"""End-to-end compression evidence (VERDICT round 1, item 6).

Builds a procedural multi-view Blender-format scene rich enough to
exercise the full reduction pipeline (densify -> mercy pruning ->
SH-band culling -> codebooks -> quantised/half PLYs), trains it with a
scaled-down `full_final` configuration (full_eval.py:33-44 flags), and
reports test-set PSNR + on-disk model sizes for the baseline vs the
quantised and quantised+half models into RESULTS.md.

Run:  python experiments/compression_eval.py [--root /tmp/r3dgs_eval]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


SH_C0 = 0.28209479177387814


def _dc(rgb):
    """Colour -> SH DC coefficient (render adds 0.5 after SH_C0*dc)."""
    return (np.asarray(rgb, np.float32) - 0.5) / SH_C0


def _fibonacci_sphere(n):
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5 ** 0.5) * i
    return np.stack([np.sin(phi) * np.cos(theta), np.cos(phi),
                     np.sin(phi) * np.sin(theta)], 1).astype(np.float32)


def make_scene(root, n_train=28, n_test=4, size=384, seed=0):
    """Procedural ground-truth Gaussian world rendered to a dataset.

    Spatially-STRUCTURED colour (uncorrelated per-splat colour blends to
    uniform grey under overlap — the round-1 failure mode) with a mix of
    structures so each reduction mechanism has something to find: a
    checkerboard ground plane (diffuse, SH bands cullable), striped
    opaque spheres (geometry/silhouettes), one 'shiny' sphere with real
    view-dependent SH content worth keeping, and a colour-coherent dense
    clutter block (mercy-prunable redundancy).
    """
    import jax.numpy as jnp
    from PIL import Image

    from reduced3dgs_tpu.cameras import Camera
    from reduced3dgs_tpu.renderer import render

    rng = np.random.default_rng(seed)
    parts = []

    def add(xyz, rgb, scale, rest=None, opacity=4.0, scale_jitter=0.15):
        n = xyz.shape[0]
        feats = np.zeros((n, 16, 3), np.float32)
        feats[:, 0] = _dc(rgb)
        if rest is not None:
            feats[:, 1:] = rest
        s = np.full((n, 3), scale, np.float32) * np.exp(
            rng.normal(0, scale_jitter, (n, 3))).astype(np.float32)
        scales = np.log(s).astype(np.float32)
        rots = np.zeros((n, 4), np.float32)
        rots[:, 0] = 1.0
        opac = np.full(n, opacity, np.float32)
        parts.append((xyz.astype(np.float32), feats, scales, rots, opac))

    # -- checkerboard ground plane (y=-0.6), 4 tiles per checker cell --
    h = 0.036
    gx, gz = np.meshgrid(np.arange(-1.6, 1.6, h), np.arange(-1.6, 1.6, h))
    gx, gz = gx.ravel(), gz.ravel()
    ground = np.stack([gx, np.full_like(gx, -0.6), gz], 1)
    cell = (np.floor(gx / (4 * h)) + np.floor(gz / (4 * h))).astype(int) % 2
    tone = rng.uniform(-0.06, 0.06, gx.shape[0])[:, None]
    rgb = np.where(cell[:, None] == 0,
                   np.array([[0.85, 0.78, 0.55]]),
                   np.array([[0.25, 0.30, 0.40]])) + tone
    add(ground, rgb, scale=h * 0.65)

    # -- three striped opaque spheres --
    for center, rad, c0, c1, ax in [
            ((-0.65, -0.10, 0.30), 0.50, (0.85, 0.20, 0.15),
             (0.95, 0.85, 0.75), 1),
            ((0.70, 0.05, -0.45), 0.42, (0.10, 0.55, 0.20),
             (0.90, 0.90, 0.30), 0),
            ((0.15, 0.35, 0.75), 0.33, (0.15, 0.25, 0.75),
             (0.80, 0.85, 0.95), 2)]:
        n = int(3200 * (rad / 0.5) ** 2)
        p = _fibonacci_sphere(n) * rad
        stripe = (np.sin(p[:, ax] / rad * 9.0) > 0).astype(np.float32)
        rgb = (stripe[:, None] * np.array([c1])
               + (1 - stripe[:, None]) * np.array([c0]))
        add(p + np.asarray(center), rgb, scale=rad * 0.035)

    # -- shiny sphere: strong degree-1 SH (view-dependent tint) --
    n = 2600
    p = _fibonacci_sphere(n) * 0.40 + np.array([-0.15, 0.55, -0.70])
    rest = np.zeros((n, 15, 3), np.float32)
    rest[:, 0:3] = rng.normal(0, 0.45, (n, 3, 3))    # degree-1 bands
    rest[:, 3:8] = rng.normal(0, 0.10, (n, 5, 3))    # degree-2 bands
    add(p, np.tile(np.array([[0.75, 0.70, 0.65]]), (n, 1)),
        scale=0.016, rest=rest)

    # -- colour-coherent redundant clutter block (mercy fodder) --
    n = 2500
    p = rng.uniform(-0.18, 0.18, (n, 3)) + np.array([0.95, -0.35, 0.95])
    add(p, np.tile(np.array([[0.95, 0.55, 0.10]]), (n, 1)),
        scale=0.055, opacity=1.2, scale_jitter=0.3)

    xyz = np.concatenate([p[0] for p in parts])
    feats = np.concatenate([p[1] for p in parts])
    scales = np.concatenate([p[2] for p in parts])
    rots = np.concatenate([p[3] for p in parts])
    opac = np.concatenate([p[4] for p in parts])
    deg = np.full(xyz.shape[0], 3, np.int32)
    fov_x = math.radians(60)

    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    os.makedirs(os.path.join(root, "test"), exist_ok=True)

    def dump(split, count, offset):
        frames = []
        for i in range(count):
            a = offset + i * 2 * math.pi / max(count, 1)
            r = 3.0 + 0.3 * math.sin(3 * a)
            eye = np.array([math.cos(a) * r,
                            0.5 + 0.5 * math.sin(2 * a + offset),
                            math.sin(a) * r])
            cam = Camera.look_at(eye=eye, target=(0, 0, 0), fov_x=fov_x,
                                 width=size, height=size, uid=i)
            out = render(
                jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(scales),
                jnp.asarray(rots), jnp.asarray(opac), jnp.asarray(deg),
                cam.params(), jnp.zeros(3), width=size, height=size,
                instance_budget=1 << 19, backend="pallas")
            img = np.clip(np.asarray(out.color), 0, 1)
            fname = f"{split}/r_{i}"
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(root, fname + ".png"))
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
    dump("test", n_test, 0.26)

    from reduced3dgs_tpu.data.dataset_readers import store_point_cloud_ply

    pts = rng.uniform(-1.4, 1.4, (8000, 3))
    cols = (rng.uniform(0, 1, (8000, 3)) * 255).astype(np.uint8)
    store_point_cloud_ply(os.path.join(root, "points3d.ply"), pts, cols)


ITER = 10_000

_COMMON = [
    "--eval",
    "--iterations", str(ITER),
    "--densify_from_iter", "500",
    "--densify_until_iter", "5000",
    "--densification_interval", "100",
    "--opacity_reset_interval", "3000",
    "--position_lr_max_steps", str(ITER),
    "--test_iterations", "3000", str(ITER),
    "--save_iterations", str(ITER),
    # fuse boundary-free iterations into one launch: this runtime
    # pays ~30 ms dispatch per executable launch (PROFILE.md)
    "--fused_steps", "16",
]

# Scaled full_final config (reference full_eval.py:33-44 at 30k
# iterations, here 10k with the schedule scaled to match); 'vanilla' is
# the plain 3DGS baseline the reference README compares sizes against.
CONFIGS = {
    "vanilla": [],
    "full": [
        "--store_grads",
        "--lambda_sh_sparsity", "0.1",
        "--cull_SH", "6000",
        "--mercy_points",
        "--prune_dead_points",
        "--lambda_alpha_regul", "0.001",
        "--std_threshold", "0.04",
        "--cdist_threshold", "6",
        "--mercy_type", "redundancy_opacity_opacity",
    ],
}


def train(data, model, extra):
    args = [sys.executable, os.path.join(REPO, "train.py"),
            "-s", data, "-m", model] + _COMMON + extra
    r = subprocess.run(args, cwd=REPO, text=True,
                       capture_output=True, timeout=10800)
    sys.stdout.write(r.stdout[-4000:])
    sys.stderr.write(r.stderr[-4000:])
    r.check_returncode()


def evaluate(data, model):
    import jax.numpy as jnp

    from reduced3dgs_tpu.config import ModelParams
    from reduced3dgs_tpu.ops.losses import psnr, ssim
    from reduced3dgs_tpu.renderer import render
    from reduced3dgs_tpu.scene import Scene

    ds = ModelParams(source_path=data, model_path=model, eval=True)
    scene = Scene(ds, load_iteration=ITER, shuffle=False)
    results = {}
    for tag, q, h in [("baseline", False, False),
                      ("quantised", True, False),
                      ("quantised_half", True, True),
                      ("quantised_pack", False, False)]:
        scene.load_model(quantised=q, half_float=h,
                         pack_xyz=(tag == "quantised_pack"))
        pool = scene.pool
        ps, ss = [], []
        for cam in scene.get_test_cameras():
            out = render(
                pool.params.xyz, pool.features(), pool.params.scaling,
                pool.params.rotation, pool.params.opacity[:, 0],
                pool.degrees, cam.params(), jnp.zeros(3),
                width=cam.width, height=cam.height,
                instance_budget=1 << 21, alive_mask=pool.alive,
                backend="pallas")
            assert int(out.num_rendered) <= (1 << 21), "budget overflow"
            img = jnp.clip(out.color, 0, 1)
            gt = jnp.asarray(cam.image)
            ps.append(float(psnr(img, gt)))
            ss.append(float(ssim(img, gt)))
        if tag == "quantised_pack":
            name = "point_cloud_quantised_pack.ply"
        else:
            name = ("point_cloud" + ("_quantised" if q else "")
                    + ("_half" if h else "") + ".ply")
        path = os.path.join(model, "point_cloud", f"iteration_{ITER}", name)
        results[tag] = {
            "psnr": float(np.mean(ps)),
            "ssim": float(np.mean(ss)),
            "bytes": os.path.getsize(path),
            "n_primitives": int(np.asarray(pool.alive).sum()),
        }
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/r3dgs_compression_eval")
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--skip_scene", action="store_true")
    args = ap.parse_args()
    data = os.path.join(args.root, "scene")
    if not args.skip_train:
        if not args.skip_scene:
            print("== building procedural scene", flush=True)
            make_scene(data)
        for cfg, extra in CONFIGS.items():
            model = os.path.join(args.root, f"model_{cfg}")
            done = os.path.join(model, "point_cloud", f"iteration_{ITER}",
                                "point_cloud_quantised_half.ply")
            if os.path.exists(done):  # resumable across partial runs
                print(f"== training ({cfg}): already trained, skipping",
                      flush=True)
                continue
            print(f"== training ({cfg})", flush=True)
            train(data, model, extra)
    res = {}
    for cfg in CONFIGS:
        print(f"== evaluating ({cfg})", flush=True)
        res[cfg] = evaluate(data, os.path.join(args.root, f"model_{cfg}"))
    van = res["vanilla"]["baseline"]
    lines = ["# RESULTS — synthetic compression evaluation", "",
             f"Procedural Blender-format scene (structured: checkerboard "
             f"ground, striped spheres, one view-dependent sphere, "
             f"redundant clutter block), 28 train / 4 test views at "
             f"384x384, vanilla 3DGS config vs `full_final` scaled to "
             f"{ITER} iterations (experiments/compression_eval.py).", "",
             "| config / model | PSNR (dB) | SSIM | primitives | "
             "size (MB) | x vs vanilla PLY |",
             "|---|---|---|---|---|---|"]
    for cfg, models in res.items():
        for tag, r in models.items():
            lines.append(
                f"| {cfg} / {tag} | {r['psnr']:.2f} | {r['ssim']:.4f} | "
                f"{r['n_primitives']:,} | {r['bytes'] / 1e6:.2f} | "
                f"{van['bytes'] / r['bytes']:.1f}x |")
    fqh = res["full"]["quantised_half"]
    lines += ["",
              f"**Headline**: full_final + quantised_half is "
              f"**{van['bytes'] / fqh['bytes']:.1f}x smaller** than the "
              f"vanilla 3DGS PLY at a PSNR delta of "
              f"{fqh['psnr'] - van['psnr']:+.2f} dB "
              f"({van['n_primitives']:,} -> {fqh['n_primitives']:,} "
              f"primitives). The reference's README.md:23-24 claims x27 "
              f"size reduction vs the original 3DGS layout on real "
              f"MipNeRF-360 scenes with the same mechanism set "
              f"(densify pruning + mercy + SH culling + codebooks + "
              f"half floats)."]
    out = "\n".join(lines) + "\n"
    with open(os.path.join(REPO, "RESULTS.md"), "w") as f:
        f.write(out)
    print(out)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
