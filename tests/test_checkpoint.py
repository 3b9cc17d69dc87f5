"""Checkpoint capture/restore round trip (reference capture()/restore(),
gaussian_model.py:92-126)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from reduced3dgs_tpu.models import gaussians as G
from reduced3dgs_tpu.train import adam
from reduced3dgs_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from reduced3dgs_tpu.train.trainer import TrainState


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pool = G.create_from_pcd(
        rng.normal(0, 1, (30, 3)).astype(np.float32),
        rng.uniform(0, 1, (30, 3)).astype(np.float32), capacity=64)
    opt = adam.init(pool.params)
    opt = opt._replace(step=jax.tree.map(lambda _: jnp.int32(17), opt.step),
                       mu=jax.tree.map(lambda x: x + 0.5, opt.mu))
    state = TrainState(pool, opt, jax.random.PRNGKey(3))
    path = os.path.join(str(tmp_path), "ck.npz")
    save_checkpoint(path, state, 1234, 2.5)

    restored, it, slr = load_checkpoint(path)
    assert it == 1234 and slr == 2.5
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(jax.tree.leaves(restored.opt.step)[0]) == 17
    assert restored.pool.capacity == 64


def test_checkpoint_legacy_scalar_step_migrates(tmp_path):
    """Checkpoints written before AdamState.step became per-leaf stored
    one scalar step; load must broadcast it across the per-leaf slots."""
    rng = np.random.default_rng(1)
    pool = G.create_from_pcd(
        rng.normal(0, 1, (10, 3)).astype(np.float32),
        rng.uniform(0, 1, (10, 3)).astype(np.float32), capacity=16)
    opt = adam.init(pool.params)
    legacy = TrainState(pool, opt._replace(step=jnp.int32(42)),
                        jax.random.PRNGKey(0))
    path = os.path.join(str(tmp_path), "legacy.npz")
    save_checkpoint(path, legacy, 500, 1.0)

    restored, it, slr = load_checkpoint(path)
    assert it == 500
    steps = jax.tree.leaves(restored.opt.step)
    assert len(steps) == len(jax.tree.leaves(restored.opt.mu))
    assert all(int(s) == 42 for s in steps)
