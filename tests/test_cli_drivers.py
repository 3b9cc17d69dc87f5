"""Driver-level coverage for the thin CLI mirrors: full_eval.py command
composition (--dry_run), update_old_ply_format.py migration, and
convert.py's COLMAP orchestration against a stub colmap executable.

Reference behaviors mirrored: /root/reference/full_eval.py:32-112,
/root/reference/update_old_ply_format.py, /root/reference/convert.py.
"""

import os
import stat
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, env_extra=None, cwd=REPO):
    env = dict(os.environ, R3DGS_PLATFORM="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get(
                   "PYTHONPATH", ""))
    env.update(env_extra or {})
    return subprocess.run([sys.executable] + args, env=env, cwd=cwd,
                          capture_output=True, text=True, timeout=300)


# -- full_eval.py ------------------------------------------------------


def test_full_eval_dry_run_full_final():
    r = run_cli(["full_eval.py", "--dry_run", "-e", "full_final",
                 "-s", "garden", "room", "truck",
                 "--output_path", "/tmp/e"])
    assert r.returncode == 0, r.stderr
    lines = r.stdout.strip().splitlines()
    trains = [ln for ln in lines if ln.startswith("python train.py")]
    renders = [ln for ln in lines if ln.startswith("python render.py")]
    metrics = [ln for ln in lines if ln.startswith("python metrics.py")]
    assert len(trains) == len(renders) == len(metrics) == 3
    # outdoor scene at images_4, indoor at images_2, T&T at full res
    garden = next(ln for ln in trains if "garden" in ln)
    room = next(ln for ln in trains if "room" in ln)
    truck = next(ln for ln in trains if "truck" in ln)
    assert "-i images_4" in garden
    assert "-i images_2" in room
    assert "-i images" not in truck
    # the paper configuration flag set (reference full_eval.py:33-44)
    for flag in ("--store_grads", "--lambda_sh_sparsity 0.1",
                 "--cull_SH 15000", "--mercy_points",
                 "--prune_dead_points", "--lambda_alpha_regul 0.001",
                 "--std_threshold 0.04", "--cdist_threshold 6",
                 "--mercy_type redundancy_opacity_opacity"):
        assert flag in garden, flag
    # model paths chain scene/config and feed render + metrics
    assert "-m /tmp/e/garden/full_final" in garden
    assert any("-m /tmp/e/garden/full_final" in ln for ln in renders)


def test_full_eval_dry_run_baseline_has_no_reduction_flags():
    r = run_cli(["full_eval.py", "--dry_run", "-e", "baseline",
                 "-s", "garden", "--skip_rendering", "--skip_metrics"])
    assert r.returncode == 0, r.stderr
    (train,) = [ln for ln in r.stdout.splitlines()
                if ln.startswith("python train.py")]
    for flag in ("--mercy_points", "--cull_SH", "--store_grads"):
        assert flag not in train


def test_full_eval_custom_scene_composition():
    """--custom_scene/--iterations (framework extension): one arbitrary
    scene dir drives the same train/render/metrics chain."""
    r = run_cli(["full_eval.py", "--dry_run", "-e", "full_final",
                 "--custom_scene", "/data/myscene",
                 "--iterations", "400", "--output_path", "/tmp/e"])
    assert r.returncode == 0, r.stderr
    lines = r.stdout.strip().splitlines()
    trains = [ln for ln in lines if ln.startswith("python train.py")]
    assert len(trains) == 1
    assert "-s /data/myscene" in trains[0]
    assert "--iterations 400" in trains[0]
    assert "-m /tmp/e/myscene/full_final" in trains[0]
    assert any("render.py -m /tmp/e/myscene/full_final" in ln
               for ln in lines)
    assert any("metrics.py -m /tmp/e/myscene/full_final" in ln
               for ln in lines)


# -- update_old_ply_format.py ------------------------------------------


def _write_old_format_ply(path, n=7, seed=0):
    """Vanilla-3DGS single-element layout: 62 props incl. nx/ny/nz."""
    from reduced3dgs_tpu.data.ply import write_ply

    rng = np.random.default_rng(seed)
    names = (["x", "y", "z", "nx", "ny", "nz"]
             + [f"f_dc_{i}" for i in range(3)]
             + [f"f_rest_{i}" for i in range(45)]
             + ["opacity"] + [f"scale_{i}" for i in range(3)]
             + [f"rot_{i}" for i in range(4)])
    rec = np.zeros(n, dtype=np.dtype([(nm, "f4") for nm in names]))
    for nm in names:
        rec[nm] = rng.normal(0, 1, n).astype(np.float32)
    rec["nx"] = rec["ny"] = rec["nz"] = 0
    write_ply(path, [("vertex", rec)])
    return rec


def test_update_old_ply_format_roundtrip(tmp_path):
    from reduced3dgs_tpu.models.ply_io import load_gaussian_ply

    src = os.path.join(tmp_path, "old.ply")
    dst = os.path.join(tmp_path, "new.ply")
    rec = _write_old_format_ply(src)
    r = run_cli(["update_old_ply_format.py", "-m", src, "-o", dst])
    assert r.returncode == 0, r.stderr
    arrs = load_gaussian_ply(dst)
    n = len(rec)
    assert arrs["xyz"].shape == (n, 3)
    # every primitive lands in the top SH band
    assert (arrs["degrees"] == 3).all()
    np.testing.assert_allclose(arrs["xyz"][:, 0], rec["x"], rtol=1e-6)
    np.testing.assert_allclose(arrs["opacity"][:, 0], rec["opacity"],
                               rtol=1e-6)
    # f_rest is stored planar (coeff-major) in the reference layout
    np.testing.assert_allclose(arrs["features_rest"][:, 0, 0],
                               rec["f_rest_0"], rtol=1e-6)


def test_update_old_ply_format_rejects_new_format(tmp_path):
    from reduced3dgs_tpu.data.ply import write_ply

    src = os.path.join(tmp_path, "new_style.ply")
    write_ply(src, [("vertex_0", np.zeros(0, dtype=[("x", "f4")]))])
    r = run_cli(["update_old_ply_format.py", "-m", src])
    assert r.returncode != 0


# -- convert.py --------------------------------------------------------

_STUB = """#!/bin/sh
echo "$@" >> "$COLMAP_STUB_LOG"
case "$1" in
  image_undistorter)
    # emulate COLMAP: produce images/ + sparse/{cameras,images,points3D}.bin
    root=""
    prev=""
    for a in "$@"; do
      [ "$prev" = "--output_path" ] && root="$a"
      prev="$a"
    done
    mkdir -p "$root/images" "$root/sparse"
    : > "$root/sparse/cameras.bin"
    : > "$root/sparse/images.bin"
    : > "$root/sparse/points3D.bin"
    ;;
esac
exit 0
"""


def test_convert_drives_colmap_stages(tmp_path):
    src = os.path.join(tmp_path, "scene")
    os.makedirs(os.path.join(src, "input"))
    stub = os.path.join(tmp_path, "colmap")
    log = os.path.join(tmp_path, "colmap.log")
    with open(stub, "w") as f:
        f.write(_STUB)
    os.chmod(stub, os.stat(stub).st_mode | stat.S_IEXEC)
    r = run_cli(["convert.py", "-s", src, "--colmap_executable", stub,
                 "--no_gpu"], env_extra={"COLMAP_STUB_LOG": log})
    assert r.returncode == 0, r.stderr + r.stdout
    stages = [ln.split()[0] for ln in open(log).read().splitlines()]
    assert stages == ["feature_extractor", "exhaustive_matcher", "mapper",
                      "image_undistorter"]
    calls = open(log).read()
    assert "--SiftExtraction.use_gpu 0" in calls
    # undistorted sparse model relocated into sparse/0 (convert.py:66-73)
    for f in ("cameras.bin", "images.bin", "points3D.bin"):
        assert os.path.exists(os.path.join(src, "sparse", "0", f))
