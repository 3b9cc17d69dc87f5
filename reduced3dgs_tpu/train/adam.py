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
    step: jnp.ndarray  # () int32


def init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     step=jnp.int32(0))


def update(params, grads, state: AdamState, lr_tree, b1=0.9, b2=0.999,
           eps=1e-15):
    """One Adam step.  lr_tree is a pytree of scalars matching params
    (broadcasting per leaf)."""
    step = state.step + 1
    c1 = 1.0 - b1 ** step.astype(jnp.float32)
    c2 = 1.0 - b2 ** step.astype(jnp.float32)
    mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
    new_params = jax.tree.map(
        lambda p, m, v, lr: p - lr * (m / c1) / (jnp.sqrt(v / c2) + eps),
        params, mu, nu, lr_tree,
    )
    return new_params, AdamState(mu=mu, nu=nu, step=step)


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
