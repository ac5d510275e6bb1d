"""Serving export: serialize the eval program to a portable StableHLO
artifact via ``jax.export``.

The reference has no serving-export story — its demo/predictor re-runs the
python model per frame (reference ``demo/predictor.py``, SURVEY §3.4), and
the torch ecosystem would reach for torchscript/ONNX. The TPU-native
equivalent is an ahead-of-time serialized StableHLO module: traced once at
fixed shapes, weights embedded as constants, reloadable in any process (or
another host) without the model-building python in the loop, and callable
under ``jax.jit`` with zero retracing.

Two artifact kinds (mirroring the two production protocols):

- **full**: ``f(pixels, sizes, supp_pixels, supp_sizes, target_ids) ->
  (xyxy, scores, valid)`` — recomputes support features per call, matching
  the reference eval loop (``engine/inference.py``).
- **cached_support**: the deployment pair
  ``support(supp_pixels, supp_sizes) -> (pooled..., supp_7x7)`` and
  ``detect(pixels, sizes, pooled..., supp_7x7, target_ids) ->
  (xyxy, scores, valid)`` — support branch runs once per class
  (``GeneralizedRCNN.compute_support_features`` /
  ``detect_with_support``).

Input contract: pixels are float32, normalized, zero-padded to the
artifact's static shape; when ``cfg.TPU.HOST_S2D`` is on (the production
default) pixels arrive 2x2 space-to-depth blocked ``(B, H/2, W/2, 12)``
exactly as ``data.transforms.space_to_depth`` emits.

Pallas note: the ROIAlign kernel routes per ``pallas_enabled()`` at trace
time — exporting from a CPU process yields an artifact with the XLA
fallback (runs anywhere); exporting on a TPU host embeds the Mosaic kernel
(runs on TPU). ``platforms`` is stamped into the artifact by jax.export
and checked at load time; cross-platform export from a CPU-only host is
verified to work with ``platforms=("tpu", "cpu")`` (XLA-fallback ROIAlign
in that case — export on a TPU host when the Pallas kernel matters).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .structures import ImageBatch


def _pixel_shape(c, batch: int, hw: Tuple[int, int]) -> Tuple[int, ...]:
    h, w = hw
    if c.TPU.HOST_S2D:
        return (batch, h // 2, w // 2, 12)
    return (batch, h, w, 3)


def _spec(shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(shape, dtype)


def export_eval(
    c,
    variables,
    *,
    batch: int = 8,
    query_hw: Optional[Tuple[int, int]] = None,
    supp_hw: Optional[Tuple[int, int]] = None,
    kind: str = "full",
    platforms: Optional[Sequence[str]] = None,
):
    """Trace + serialize the eval program. Returns ``jax.export.Exported``
    (kind="full") or a (support, detect) pair of them (kind="cached_support").

    ``variables`` (the model param pytree) is closed over — the artifact
    embeds the weights as constants.
    """
    from .models import build_detection_model

    if query_hw is None:
        query_hw = tuple(c.TPU.QUERY_BUCKETS[0])
    if supp_hw is None:
        supp_hw = tuple(c.TPU.SUPP_BUCKET)
    model = build_detection_model(c)

    q_spec = _spec(_pixel_shape(c, batch, query_hw))
    qs_spec = _spec((batch, 2))
    s_spec = _spec(_pixel_shape(c, batch, supp_hw))
    ss_spec = _spec((batch, 2))
    tid_spec = _spec((batch,), jnp.int32)

    if kind == "full":

        def forward(pixels, sizes, supp_pixels, supp_sizes, target_ids):
            dets = model.apply(
                variables,
                ImageBatch(pixels=pixels, sizes=sizes),
                ImageBatch(pixels=supp_pixels, sizes=supp_sizes),
                target_ids=target_ids, train=False)
            return dets.xyxy, dets.get_field("scores"), dets.valid

        return jax.export.export(jax.jit(forward), platforms=platforms)(
            q_spec, qs_spec, s_spec, ss_spec, tid_spec)

    if kind == "cached_support":

        def support(supp_pixels, supp_sizes):
            return model.apply(
                variables,
                ImageBatch(pixels=supp_pixels, sizes=supp_sizes), batch,
                method=lambda m, s, n: m.compute_support_features(s, n))

        exp_support = jax.export.export(jax.jit(support),
                                        platforms=platforms)(s_spec, ss_spec)
        # trace the detect side against the support side's output shapes
        pooled_specs, s7_spec = jax.eval_shape(
            exp_support.call, s_spec, ss_spec)

        def detect(pixels, sizes, pooled, supp_7x7, target_ids):
            dets = model.apply(
                variables, ImageBatch(pixels=pixels, sizes=sizes),
                pooled, supp_7x7, target_ids,
                method=lambda m, im, p, s7, t:
                    m.detect_with_support(im, p, s7, t))
            return dets.xyxy, dets.get_field("scores"), dets.valid

        exp_detect = jax.export.export(jax.jit(detect), platforms=platforms)(
            q_spec, qs_spec, pooled_specs, s7_spec, tid_spec)
        return exp_support, exp_detect

    raise ValueError(f"unknown export kind: {kind!r}")


def export_serving(
    c,
    variables,
    path: str,
    *,
    query_hw: Optional[Tuple[int, int]] = None,
    supp_hw: Optional[Tuple[int, int]] = None,
    platforms: Optional[Sequence[str]] = None,
    compile_executable: bool = True,
) -> bool:
    """Export the complete batch-1 serving BUNDLE to ``path``:

    - ``<path>.support`` / ``<path>.detect`` — portable StableHLO pair;
    - ``<path>.support.exec`` / ``<path>.detect.exec`` — this platform's
      compiled executables (the cold-start fast path; skipped when the
      backend doesn't support serialization — returns False then);
    - ``<path>.meta.json`` — the input contract (buckets, normalization,
      space-to-depth) so ``predictor.ArtifactPredictor`` can serve frames
      without the model-building python or the config system.

    The reference serves by rebuilding the python model per process
    (demo/predictor.py); this bundle needs neither model python nor a
    compiler at load time.
    """
    import json

    if query_hw is None:
        query_hw = tuple(c.TPU.QUERY_BUCKETS[0])
    if supp_hw is None:
        supp_hw = tuple(c.TPU.SUPP_BUCKET)
    pair = export_eval(c, variables, batch=1, query_hw=query_hw,
                       supp_hw=supp_hw, kind="cached_support",
                       platforms=platforms)
    save(pair, path)
    meta = {
        "query_bucket": list(query_hw),
        "supp_bucket": list(supp_hw),
        "host_s2d": bool(c.TPU.HOST_S2D),
        "pixel_mean": [float(v) for v in c.INPUT.PIXEL_MEAN],
        "pixel_std": [float(v) for v in c.INPUT.PIXEL_STD],
        "to_bgr255": bool(c.INPUT.TO_BGR255),
        "min_size_test": int(c.INPUT.MIN_SIZE_TEST),
        "max_size_test": int(c.INPUT.MAX_SIZE_TEST),
        "supp_min_size_test": int(c.INPUT.SUPP_MIN_SIZE_TEST),
        "supp_max_size_test": int(c.INPUT.SUPP_MAX_SIZE_TEST),
    }
    tmp = path + ".meta.json.tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(tmp, path + ".meta.json")
    return save_compiled(pair, path) if compile_executable else False


def save_compiled(exported, path: str, *, backend=None) -> bool:
    """Compile one Exported (or a pair) for THIS platform and serialize the
    PjRt executable(s) next to the StableHLO artifact (``<path>.exec`` /
    ``<path>.support.exec`` + ``.detect.exec``).

    The StableHLO artifact is portable but pays lower+XLA-compile at first
    call after load (measured 100 s cold start on v5e, VERDICT r4 weak #2);
    the serialized EXECUTABLE loads in ~0.1 s and runs immediately — the
    deployment fast path for a fleet of identical chips. Returns False when
    the backend's compilations don't support serialization (caller keeps
    the StableHLO fallback). The reference's serving path (demo/predictor.py)
    rebuilds the python model per process; this artifact needs neither the
    model python nor a compiler at load time.
    """
    import pickle

    from jax.experimental import serialize_executable as se

    if isinstance(exported, tuple):
        return (save_compiled(exported[0], path + ".support", backend=backend)
                and save_compiled(exported[1], path + ".detect",
                                  backend=backend))
    flat = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in exported.in_avals]
    args, kwargs = jax.tree_util.tree_unflatten(exported.in_tree, flat)
    compiled = jax.jit(exported.call).lower(*args, **kwargs).compile()
    try:
        payload, in_tree, out_tree = se.serialize(compiled)
    except (ValueError, NotImplementedError):
        return False
    dev = (jax.devices()[0] if backend is None else backend.devices()[0])
    # record how many devices the executable was compiled for:
    # deserialize_and_load defaults execution_devices to ALL backend devices
    # and then expects that many arg shards (serving artifacts are 1-device)
    try:
        n_dev = len(compiled._executable.xla_executable.local_devices())
    except AttributeError:
        n_dev = 1
    blob = pickle.dumps({
        "payload": payload, "in_tree": in_tree, "out_tree": out_tree,
        "platform": dev.platform, "n_devices": n_dev,
    })
    tmp = path + ".exec.tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path + ".exec")
    return True


def load_compiled(path: str, *, backend=None):
    """Load a serialized executable saved by ``save_compiled``; returns a
    ready-to-call ``jax.stages.Compiled`` (no tracing, no XLA compile) or
    None when the artifact is absent or targets a different platform."""
    import pickle

    from jax.experimental import serialize_executable as se

    if not os.path.exists(path + ".exec"):
        return None
    with open(path + ".exec", "rb") as f:
        d = pickle.loads(f.read())
    devices = jax.devices() if backend is None else backend.devices()
    if d["platform"] != devices[0].platform:
        return None
    n_dev = d.get("n_devices", 1)
    if len(devices) < n_dev:
        return None
    return se.deserialize_and_load(d["payload"], d["in_tree"], d["out_tree"],
                                   backend=devices[0].client,
                                   execution_devices=devices[:n_dev])


def save(exported, path: str) -> None:
    """Serialize one Exported to ``path`` (a pair saves as two files:
    ``<path>.support`` / ``<path>.detect``)."""
    if isinstance(exported, tuple):
        save(exported[0], path + ".support")
        save(exported[1], path + ".detect")
        return
    data = exported.serialize()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load(path: str):
    """Deserialize an artifact; returns ``jax.export.Exported`` — invoke as
    ``jax.jit(exported.call)(*args)`` (or plain ``exported.call``)."""
    with open(path, "rb") as f:
        return jax.export.deserialize(bytearray(f.read()))
