"""Distributed communication helpers (reference: utils/comm.py).

The reference wraps torch.distributed/NCCL (get_rank, pickle-based
all_gather, reduce_dict, barrier). On TPU the analogs are jax process
indices and multihost utilities; in-step collectives (gradient psum, loss
pmean) live INSIDE jit and need no helpers. These functions cover the
host-side coordination the engine uses: eval prediction merge and barriers.
All degrade to no-ops in single-process runs (comm.py:13-26 behaves the
same when dist is uninitialized).
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, List

import jax
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def synchronize():
    """Barrier across hosts (comm.py:33-45)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("oneshotdet_barrier")


def all_gather(data: Any) -> List[Any]:
    """Gather arbitrary picklable data from all hosts (comm.py:48-88).

    The reference pickles to padded byte tensors over NCCL; here the bytes
    ride a fixed-shape uint8 array through process_allgather.
    """
    world = jax.process_count()
    if world == 1:
        return [data]
    from jax.experimental import multihost_utils

    buf = np.frombuffer(pickle.dumps(data), np.uint8)
    size = np.array([buf.size], np.int64)
    all_sizes = np.asarray(multihost_utils.process_allgather(size)).reshape(-1)
    max_size = int(all_sizes.max())
    padded = np.zeros(max_size, np.uint8)
    padded[: buf.size] = buf
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return [
        pickle.loads(gathered[i, : int(all_sizes[i])].tobytes())
        for i in range(world)
    ]


def reduce_dict(input_dict: Dict[str, Any], average: bool = True) -> Dict[str, Any]:
    """Cross-host mean/sum of scalar metrics (comm.py:91-117).

    Used for logging only, like the reference (engine/trainer.py:86-89).
    """
    world = jax.process_count()
    if world == 1:
        return {k: float(v) for k, v in input_dict.items()}
    from jax.experimental import multihost_utils

    keys = sorted(input_dict.keys())
    vec = np.array([float(input_dict[k]) for k in keys], np.float32)
    total = np.asarray(multihost_utils.process_allgather(vec)).sum(axis=0)
    if average:
        total = total / world
    return dict(zip(keys, total.tolist()))
