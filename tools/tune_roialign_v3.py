#!/usr/bin/env python
"""v3 (cross-ROI vectorized) ROIAlign: parity vs the XLA oracle + v2, and
block-size sweep with the pipelined fresh-content protocol."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from oneshotdet_tpu.ops.pallas_roi_align import pallas_multilevel_roi_align
    from oneshotdet_tpu.ops.pallas_roi_align_v4 import (
        pallas_multilevel_roi_align_v4,
    )
    from oneshotdet_tpu.ops.roi_align import multilevel_roi_align

    b, c = 8, 256
    shapes = [(104, 152), (52, 76), (26, 38), (13, 19), (7, 10)]
    scales = (0.125, 0.0625, 0.03125, 0.015625, 0.0078125)
    r_per = 2000
    r = b * r_per
    iters, warmup = 8, 2
    n = iters + warmup + 1

    def make_inputs(seed, small=False, dtype=jnp.bfloat16, skew=None):
        rr = np.random.RandomState(seed)
        shp = [(13, 19), (7, 10)] if small else shapes
        feats = [jnp.asarray(rr.randn(b, h, w, c).astype(np.float32)).astype(dtype)
                 for h, w in shp]
        nroi = 64 if small else r
        if skew == "p3":  # FCOS-like: small boxes -> level 3 dominated
            wh = rr.uniform(8, 110, (nroi, 2)).astype(np.float32)
        else:
            wh = rr.uniform(8, 640, (nroi, 2)).astype(np.float32)
        xy = rr.uniform(0, 1, (nroi, 2)).astype(np.float32) * (
            np.array([1200, 800]) - wh)
        rois = np.concatenate([
            np.repeat(np.arange(b, dtype=np.float32), nroi // b)[:, None],
            xy, xy + wh], axis=1)
        area = wh[:, 0] * wh[:, 1]
        kmax = 1 if small else 4
        lvl = np.clip(np.floor(4 + np.log2(np.sqrt(area) / 224 + 1e-8)) - 3, 0, kmax)
        if small:
            sc = scales[3:]
        else:
            sc = scales
        return feats, jnp.asarray(rois), jnp.asarray(lvl.astype(np.int32)), sc

    # ---- parity: f32, small shapes, vs XLA oracle --------------------------
    feats, rois, lvl, sc = make_inputs(7, small=True, dtype=jnp.float32)
    ref = multilevel_roi_align(feats, rois, lvl, (7, 7), sc, 2)
    got = pallas_multilevel_roi_align_v4(feats, rois, lvl, (7, 7), sc, 2,
                                         rois_per_step=16)
    d = float(jnp.abs(got - ref).max())
    print(f"v4-vs-oracle (f32 small) max|diff| = {d}", flush=True)
    assert d < 2e-5, d

    # bf16 production shapes vs v2 (both bf16 -> compare loosely)
    feats, rois, lvl, sc = make_inputs(11)
    ref2 = pallas_multilevel_roi_align(feats, rois, lvl, (7, 7), sc, 2,
                                       rois_per_step=64)
    got2 = pallas_multilevel_roi_align_v4(feats, rois, lvl, (7, 7), sc, 2,
                                          rois_per_step=16)
    d2 = float(jnp.abs(got2.astype(jnp.float32) - ref2.astype(jnp.float32)).max())
    print(f"v4-vs-v2 (bf16 prod) max|diff| = {d2}", flush=True)

    # ---- timing ------------------------------------------------------------
    for skew in (None, "p3"):
        inputs = [make_inputs(100 + i + (1000 if skew else 0), skew=skew)[:3]
                  for i in range(n)]
        name = "p3-skew" if skew else "uniform"

        def bench(fn):
            f = jax.jit(lambda feats, rois, lvl: fn(feats, rois, lvl)
                        .astype(jnp.float32).sum())
            out = f(*inputs[0]); jax.block_until_ready(out)
            for i in range(warmup):
                out = f(*inputs[1 + i])
            jax.block_until_ready(out)
            base = warmup + 1
            t0 = time.perf_counter()
            for i in range(iters):
                out = f(*inputs[base + i])
            jax.block_until_ready(out)
            return (time.perf_counter() - t0) / iters * 1000

        ms = bench(lambda f_, r_, l_: pallas_multilevel_roi_align(
            f_, r_, l_, (7, 7), scales, 2, rois_per_step=64))
        print(f"[{name}] v2 t=64     {ms:7.2f} ms/batch ({ms/r*1000:.2f} us/ROI)",
              flush=True)
        for t in (16, 32):
            ms = bench(lambda f_, r_, l_, t=t: pallas_multilevel_roi_align_v4(
                f_, r_, l_, (7, 7), scales, 2, rois_per_step=t))
            print(f"[{name}] v4 t={t:<4d}   {ms:7.2f} ms/batch "
                  f"({ms/r*1000:.2f} us/ROI)", flush=True)


if __name__ == "__main__":
    main()
