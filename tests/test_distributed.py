"""Two-process distributed smoke test (VERDICT r4 item 6).

Exercises parallel/launch.py's `jax.distributed.initialize` path with 2
local CPU processes (coordinator + worker, 2 virtual devices each)
running ONE sharded train step over a mesh that spans both processes —
the multi-host story's only previously-untested line.  The loss each
process reports must agree with the same step computed on a
single-process mesh of the same shape.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
os.environ["COORDINATOR"] = f"localhost:{{port}}"
os.environ["NPROC"] = "2"
os.environ["PROC_ID"] = str(pid)
from reduced3dgs_tpu.parallel.launch import initialize_distributed
initialize_distributed()
assert len(jax.devices()) == 4, jax.devices()

import jax.numpy as jnp
import numpy as np
from reduced3dgs_tpu.cameras import Camera
from reduced3dgs_tpu.config import OptimizationParams
from reduced3dgs_tpu.models import gaussians as G
from reduced3dgs_tpu.parallel.sharded import (
    make_mesh, sharded_train_step, stack_camera_params)
from reduced3dgs_tpu.train import adam
from reduced3dgs_tpu.train.trainer import TrainState

rng = np.random.default_rng(0)
n = 256
pool = G.create_from_pcd(
    rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32),
    rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32), capacity=1024)
state = TrainState(pool, adam.init(pool.params), jax.random.PRNGKey(0))
cam = Camera.look_at(eye=(0, 0.3, -3), target=(0, 0, 0),
                     width=64, height=64, uid=0)
cp = stack_camera_params([cam])
gt = jnp.tile(jnp.asarray([0.2, 0.5, 0.3]), (1, 64, 64, 1))
mesh = make_mesh(1, 4)
st, m = sharded_train_step(
    state, cp, gt, jnp.zeros(3), jnp.int32(1), mesh=mesh, width=64,
    height=64, budget=4096, opt_cfg=OptimizationParams(),
    spatial_lr_scale=1.0)
print("LOSS", float(m["loss"]), flush=True)
print("NR", int(m["num_rendered_max"]), flush=True)
"""


@pytest.mark.slow
def test_two_process_sharded_step(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.format(repo=REPO))
    port = "19764"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), port],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env) for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"
        outs.append(out)
    losses = [float(o.split("LOSS ")[1].split()[0]) for o in outs]
    assert np.isfinite(losses).all()
    # both processes observe the identical replicated loss
    assert losses[0] == losses[1]

    # same step on a single-process (1,4) mesh of this process's
    # virtual devices must agree (conftest forces 8 CPU devices)
    import jax
    import jax.numpy as jnp

    from reduced3dgs_tpu.cameras import Camera
    from reduced3dgs_tpu.config import OptimizationParams
    from reduced3dgs_tpu.models import gaussians as G
    from reduced3dgs_tpu.parallel.sharded import (
        make_mesh, sharded_train_step, stack_camera_params,
    )
    from reduced3dgs_tpu.train import adam
    from reduced3dgs_tpu.train.trainer import TrainState

    rng = np.random.default_rng(0)
    n = 256
    pool = G.create_from_pcd(
        rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32),
        rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32), capacity=1024)
    state = TrainState(pool, adam.init(pool.params), jax.random.PRNGKey(0))
    cam = Camera.look_at(eye=(0, 0.3, -3), target=(0, 0, 0),
                         width=64, height=64, uid=0)
    cp = stack_camera_params([cam])
    gt = jnp.tile(jnp.asarray([0.2, 0.5, 0.3]), (1, 64, 64, 1))
    _, m = sharded_train_step(
        state, cp, gt, jnp.zeros(3), jnp.int32(1), mesh=make_mesh(1, 4),
        width=64, height=64, budget=4096, opt_cfg=OptimizationParams(),
        spatial_lr_scale=1.0)
    np.testing.assert_allclose(losses[0], float(m["loss"]), rtol=1e-5)
