"""Optimizer and LR schedule (reference: maskrcnn_benchmark/solver/).

make_optimizer reproduces the reference's per-parameter SGD groups
(solver/build.py:8-26): params whose name contains "bias" get
BIAS_LR_FACTOR x lr and WEIGHT_DECAY_BIAS, modules matching
FEW_SHOT.UNTRAINED_KEYWORD are excluded from the optimizer, and
FREEZE_CONV_BODY_AT freezing (resnet.py:127-136) is applied as a zero-update
transform — the functional analog of requires_grad=False.

The WarmupMultiStepLR schedule (solver/lr_scheduler.py:10-52) becomes an
optax schedule function.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax

from ..models.resnet import frozen_param_paths


def warmup_multistep_schedule(
    base_lr: float,
    steps: Sequence[int],
    gamma: float = 0.1,
    warmup_factor: float = 1.0 / 3,
    warmup_iters: int = 500,
    warmup_method: str = "linear",
):
    """WarmupMultiStepLR (lr_scheduler.py:38-52) as an optax schedule."""
    steps = tuple(steps)

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        if warmup_method == "constant":
            wf = jnp.where(count < warmup_iters, warmup_factor, 1.0)
        elif warmup_method == "linear":
            alpha = count / max(warmup_iters, 1)
            wf = jnp.where(count < warmup_iters, warmup_factor * (1 - alpha) + alpha, 1.0)
        else:
            raise ValueError(warmup_method)
        decay = jnp.ones(())
        for s in steps:
            decay = decay * jnp.where(count >= s, gamma, 1.0)
        return base_lr * wf * decay

    return schedule


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def make_param_labels(params, untrained_keywords=(), freeze_conv_body_at: int = 2):
    """Label every param leaf as 'weight' | 'bias' | 'frozen'."""
    frozen_stage_prefixes = frozen_param_paths(freeze_conv_body_at)

    def label(path, _):
        p = _path_str(path)
        for kw in untrained_keywords:
            if kw and kw in p:
                return "frozen"
        # backbone body freezing applies to both Siamese backbones
        for prefix in frozen_stage_prefixes:
            if f"/body/{prefix}" in p or p.startswith(f"body/{prefix}"):
                return "frozen"
        leaf_name = p.rsplit("/", 1)[-1]
        return "bias" if "bias" in leaf_name else "weight"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(cfg, params):
    """Build the reference SGD with per-group lr/wd as an optax transform.

    Returns (optimizer, schedule) — schedule exposed for logging.
    """
    schedule = warmup_multistep_schedule(
        cfg.SOLVER.BASE_LR,
        cfg.SOLVER.STEPS,
        cfg.SOLVER.GAMMA,
        cfg.SOLVER.WARMUP_FACTOR,
        cfg.SOLVER.WARMUP_ITERS,
        cfg.SOLVER.WARMUP_METHOD,
    )
    bias_schedule = warmup_multistep_schedule(
        cfg.SOLVER.BASE_LR * cfg.SOLVER.BIAS_LR_FACTOR,
        cfg.SOLVER.STEPS,
        cfg.SOLVER.GAMMA,
        cfg.SOLVER.WARMUP_FACTOR,
        cfg.SOLVER.WARMUP_ITERS,
        cfg.SOLVER.WARMUP_METHOD,
    )

    def sgd(lr_schedule, weight_decay):
        chain = []
        if weight_decay > 0:
            chain.append(optax.add_decayed_weights(weight_decay))
        if cfg.SOLVER.MOMENTUM > 0:
            chain.append(optax.trace(decay=cfg.SOLVER.MOMENTUM))
        chain.append(optax.scale_by_learning_rate(lr_schedule))
        return optax.chain(*chain)

    labels = make_param_labels(
        params,
        cfg.FEW_SHOT.UNTRAINED_KEYWORD,
        cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT,
    )
    tx = optax.multi_transform(
        {
            "weight": sgd(schedule, cfg.SOLVER.WEIGHT_DECAY),
            "bias": sgd(bias_schedule, cfg.SOLVER.WEIGHT_DECAY_BIAS),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    return tx, schedule
