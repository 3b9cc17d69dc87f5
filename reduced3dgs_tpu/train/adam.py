"""Adam with torch semantics + per-leaf learning rates (JAX pytrees).

The reference uses torch.optim.Adam(eps=1e-15) with six parameter groups
and per-group LRs (gaussian_model.py:203-221), then performs *state
surgery* on densify/prune (slicing/concatenating exp_avg/exp_avg_sq,
gaussian_model.py:487-598).  A hand-rolled Adam keeps that surgery
trivial on the fixed-capacity pool: it is just masked writes into the
(mu, nu) pytrees (see train/densify.py).

Update rule matches torch exactly:
  m = b1 m + (1-b1) g;  v = b2 v + (1-b2) g^2
  p -= lr * (m / (1-b1^t)) / (sqrt(v / (1-b2^t)) + eps)
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    mu: object  # pytree like params
    nu: object  # pytree like params
    step: object  # pytree of () int32, one per leaf (torch: per-param step)


def init(params) -> AdamState:
    return AdamState(mu=jax.tree.map(jnp.zeros_like, params),
                     nu=jax.tree.map(jnp.zeros_like, params),
                     step=jax.tree.map(lambda _: jnp.int32(0), params))


def update(params, grads, state: AdamState, lr_tree, b1=0.9, b2=0.999,
           eps=1e-15, skip_tree=None):
    """One Adam step.  lr_tree is a pytree of scalars matching params
    (broadcasting per leaf).

    skip_tree: optional pytree of () bools — True leaves are left fully
    untouched (params, moments AND step count), the torch behavior for a
    param whose .grad is None (e.g. the opacity tensor right after a
    reset_opacity's replace_tensor_to_optimizer, gaussian_model.py:487-500).
    """
    if skip_tree is None:
        skip_tree = jax.tree.map(lambda _: False, params)

    def leaf(p, g, m, v, t, lr, skip):
        t2 = t + jnp.int32(jnp.logical_not(skip))
        tf = t2.astype(jnp.float32)
        c1 = 1.0 - b1 ** tf
        c2 = 1.0 - b2 ** tf
        m2 = b1 * m + (1 - b1) * g
        v2 = b2 * v + (1 - b2) * g * g
        p2 = p - lr * (m2 / c1) / (jnp.sqrt(v2 / c2) + eps)
        keep = jnp.asarray(skip)
        return (jnp.where(keep, p, p2), jnp.where(keep, m, m2),
                jnp.where(keep, v, v2), t2)

    flat_p, treedef = jax.tree.flatten(params)
    out = [leaf(p, g, m, v, t, lr, s) for p, g, m, v, t, lr, s in zip(
        flat_p, jax.tree.leaves(grads), jax.tree.leaves(state.mu),
        jax.tree.leaves(state.nu), jax.tree.leaves(state.step),
        jax.tree.leaves(lr_tree), jax.tree.leaves(skip_tree))]
    unflat = lambda i: jax.tree.unflatten(treedef, [o[i] for o in out])
    return unflat(0), AdamState(mu=unflat(1), nu=unflat(2), step=unflat(3))


def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
             max_steps=1_000_000):
    """Plenoxels-style log-lerp LR schedule (utils/general_utils.py:29-62),
    jnp-expressible so it lives inside the jitted train step."""
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.float32(0.0)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * math.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(
        math.log(lr_init) * (1 - t) + math.log(lr_final) * t
    )
    return jnp.where(step < 0, 0.0, delay_rate * log_lerp)
