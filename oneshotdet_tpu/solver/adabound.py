"""AdaBound optimizer (reference: maskrcnn_benchmark/solver/adabound.py).

Adam with dynamically bounded step sizes that converge to SGD
(Luo et al., ICLR 2019): the per-parameter step lr/(sqrt(v)+eps) is clipped
into [lower_bound(t), upper_bound(t)] where the bounds tighten toward
final_lr over time. Implemented as an optax GradientTransformation; the
reference keeps it as a commented-out alternative (solver/build.py:24).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class AdaBoundState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def adabound(
    learning_rate: float = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    final_lr: float = 0.1,
    gamma: float = 1e-3,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    amsbound: bool = False,
) -> optax.GradientTransformation:
    def init_fn(params):
        mu = jax.tree_util.tree_map(jnp.zeros_like, params)
        nu = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdaBoundState(count=jnp.zeros((), jnp.int32), mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        if weight_decay > 0 and params is not None:
            updates = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, updates, params
            )
        count = state.count + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates
        )
        c = count.astype(jnp.float32)
        bc1 = 1 - b1 ** c
        bc2 = 1 - b2 ** c
        # dynamic bounds around final_lr (adabound.py step computation)
        lower = final_lr * (1 - 1 / (gamma * c + 1))
        upper = final_lr * (1 + 1 / (gamma * c))
        step_size = learning_rate * jnp.sqrt(bc2) / bc1

        def u(m, v):
            denom = jnp.sqrt(v) + eps
            step = jnp.clip(step_size / denom, lower, upper)
            return -step * m

        new_updates = jax.tree_util.tree_map(u, mu, nu)
        return new_updates, AdaBoundState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)
