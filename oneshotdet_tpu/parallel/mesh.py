"""Device mesh and sharding helpers.

The reference's only parallelism strategy is multi-process DDP over NCCL
(tools/train_net.py:83-88, SURVEY §2.6). The TPU-native equivalent is a 1-D
``jax.sharding.Mesh`` over all chips: the batch axis is sharded, parameters
are replicated, and XLA inserts the gradient psum over ICI inside the single
jitted train step — no NCCL, no DDP wrapper, no per-rank processes on a
single host.

The same code runs unchanged on a virtual CPU mesh
(``--xla_force_host_platform_device_count=N``) for testing, and extends to
multi-host with jax.distributed (DCN between hosts handled by XLA).

Beyond parity, ``parallel.sharding`` adds the 2-D ``(data, model)`` mesh:
tensor parallelism on the head matmuls and spatial partitioning of the
query pixels — see that module for the layout rules and the PP/EP
absence rationale.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Sequence[str] = ("data",), devices=None,
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Mesh over the available devices.

    1-D (the parity default — reference DDP is pure data parallelism) or
    n-D: pass ``shape`` (one -1 allowed) to fold the device list, e.g.
    ``make_mesh(("data", "model"), shape=(2, -1))`` for the dp x (tp+sp)
    layout used by ``parallel.sharding``. On real hardware order the axes
    so ``model`` rides the fastest ICI dimension (innermost axis here).
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if len(axes) == 1:
        devices = devices.reshape(-1)
    else:
        if shape is None:
            raise ValueError(f"{len(axes)}-D mesh needs an explicit shape")
        devices = devices.reshape(tuple(shape))
    return Mesh(devices, axes)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Put a pytree of host arrays onto the mesh, sharded along dim 0."""

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))))

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, tree)
