"""Tracing / profiling hooks (SURVEY §5 — the reference has only wall-clock
prints; this framework gets real profiler integration).

- ``trace(dir)``: jax.profiler trace context (view in TensorBoard/Perfetto).
- ``StepTimer``: load/compute split per iteration, the analog of the
  reference trainer's ``load:``/``comp:`` log line (engine/trainer.py:107-128)
  plus device-memory stats where the backend exposes them.
- ``error_dump``: structured dump of bad batches (the analog of the
  reference's errors/<timestamp>/err.txt, rpn/fcos/loss.py:63-75).
"""

from __future__ import annotations

import contextlib
import json
import os
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile everything inside the context into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    """Live/peak bytes per device where the backend exposes memory_stats."""
    out = {}
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            }
    return out


class StepTimer:
    """Accumulates data-loading vs compute time between marks."""

    def __init__(self):
        self.t_data = 0.0
        self.t_step = 0.0
        self._last = time.perf_counter()

    def mark_data(self):
        now = time.perf_counter()
        self.t_data += now - self._last
        self._last = now

    def mark_step(self):
        now = time.perf_counter()
        self.t_step += now - self._last
        self._last = now

    def pop(self, steps: int):
        d, s = self.t_data / max(steps, 1), self.t_step / max(steps, 1)
        self.t_data = self.t_step = 0.0
        return d, s


def error_dump(tag: str, payload: dict, root: str = "errors") -> str:
    """Persist a structured record of a degenerate batch for post-mortem."""
    ts = time.strftime("%Y%m%d%H%M%S")
    d = os.path.join(root, ts)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"{tag}.json")

    def to_jsonable(x):
        if isinstance(x, (np.ndarray, jax.Array)):
            arr = np.asarray(x)
            return arr.tolist() if arr.size <= 512 else {
                "shape": list(arr.shape),
                "dtype": str(arr.dtype),
                "min": float(arr.min()),
                "max": float(arr.max()),
                "nan": int(np.isnan(arr).sum()) if np.issubdtype(arr.dtype, np.floating) else 0,
            }
        return x

    with open(path, "w") as f:
        json.dump({k: to_jsonable(v) for k, v in payload.items()}, f, indent=2)
    return path


def collect_env_info() -> str:
    """Environment dump (utils/collect_env.py analog)."""
    import flax
    import optax

    lines = [
        f"jax: {jax.__version__}",
        f"flax: {flax.__version__}",
        f"optax: {optax.__version__}",
        f"backend: {jax.default_backend()}",
        f"devices: {jax.devices()}",
        f"process_index: {jax.process_index()}/{jax.process_count()}",
    ]
    return "\n".join(lines)


def setup_compile_cache(path: str = "") -> str:
    """Point JAX at the persistent XLA compile cache (idempotent).

    Full-model compiles over a device tunnel run 20-600 s cold; the
    persistent cache turns repeats into seconds. Resolution order:
    explicit ``path`` > ``ONESHOT_COMPILE_CACHE`` env > ``~/.cache/jax_comp_cache``.
    The reference has no analog (eager torch never compiles).
    """
    import os

    import jax

    path = (path or os.environ.get("ONESHOT_COMPILE_CACHE")
            or os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return path
