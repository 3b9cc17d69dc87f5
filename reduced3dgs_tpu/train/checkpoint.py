"""Checkpoint capture/restore — the reference's torch.save((capture(), it)).

GaussianModel.capture() (gaussian_model.py:92-107) stores parameters,
accumulators, optimizer state, spatial_lr_scale and degrees; restore()
re-runs training_setup and loads the Adam state (:109-126).  Here the
whole TrainState is one pytree, so a checkpoint is a flat npz of its
leaves + the iteration + spatial_lr_scale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from reduced3dgs_tpu.models.gaussians import GaussianPool, GaussianParams
from reduced3dgs_tpu.train.adam import AdamState
from reduced3dgs_tpu.train.trainer import TrainState


def save_checkpoint(path, state: TrainState, iteration: int,
                    spatial_lr_scale: float):
    leaves, _ = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["iteration"] = np.int64(iteration)
    arrays["spatial_lr_scale"] = np.float64(spatial_lr_scale)
    np.savez(path, **arrays)


def load_checkpoint(path):
    """Returns (state, iteration, spatial_lr_scale)."""
    data = np.load(path)
    n = sum(1 for k in data.files if k.startswith("leaf_"))
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    # rebuild the treedef from a skeleton with the right structure
    cap = leaves[0].shape[0]
    params = GaussianParams(*([0] * 6))

    def skeleton(step):
        return TrainState(
            pool=GaussianPool(params, 0, 0, 0, 0, 0, 0),
            opt=AdamState(mu=params, nu=params, step=step),
            key=0,
        )

    legacy = skeleton(0)  # pre-per-leaf-step format: one scalar step
    if n == len(jax.tree.leaves(legacy)):
        state = jax.tree.unflatten(jax.tree.structure(legacy), leaves)
        state = state._replace(opt=state.opt._replace(
            step=jax.tree.map(lambda _: state.opt.step, state.opt.mu)))
    else:
        state = jax.tree.unflatten(
            jax.tree.structure(skeleton(params)), leaves)
    return state, int(data["iteration"]), float(data["spatial_lr_scale"])
