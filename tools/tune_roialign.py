#!/usr/bin/env python
"""ROIAlign kernel tuning: unroll factor / block size sweep on the chip.

Parity-checks each configuration against the default kernel on the same
inputs, then times with the pipelined fresh-content protocol.
"""

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

    b, c = 8, 256
    shapes = [(104, 152), (52, 76), (26, 38), (13, 19), (7, 10)]
    scales = (0.125, 0.0625, 0.03125, 0.015625, 0.0078125)
    r_per = 2000
    r = b * r_per
    iters, warmup = 8, 2
    n = iters + warmup + 1

    rng = np.random.RandomState(3)

    def make_inputs(seed):
        rr = np.random.RandomState(seed)
        feats = [jnp.asarray(rr.randn(b, h, w, c).astype(np.float32)).astype(jnp.bfloat16)
                 for h, w in shapes]
        # realistic ROI mix: areas spanning the level mapper's range
        wh = rr.uniform(8, 640, (r, 2)).astype(np.float32)
        xy = rr.uniform(0, 1, (r, 2)).astype(np.float32) * (np.array([1200, 800]) - wh)
        rois = np.concatenate([
            np.repeat(np.arange(b, dtype=np.float32), r_per)[:, None],
            xy, xy + wh], axis=1)
        area = wh[:, 0] * wh[:, 1]
        lvl = np.clip(np.floor(4 + np.log2(np.sqrt(area) / 224 + 1e-8)), 3, 7) - 3
        return feats, jnp.asarray(rois), jnp.asarray(lvl.astype(np.int32))

    inputs = [make_inputs(100 + i) for i in range(n)]

    def bench(mode, t, unroll=1):
        f = jax.jit(lambda feats, rois, lvl: pallas_multilevel_roi_align(
            feats, rois, lvl, (7, 7), scales, 2, rois_per_step=t,
            unroll=unroll, interp_mode=mode).astype(jnp.float32).sum())
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

    # parity: XLA-built interp matrices vs the original in-kernel interp
    ref = pallas_multilevel_roi_align(*inputs[0], (7, 7), scales, 2,
                                      rois_per_step=64, interp_mode="kernel")
    for mode in ("postscatter", "precomputed"):
        got = pallas_multilevel_roi_align(*inputs[0], (7, 7), scales, 2,
                                          rois_per_step=64, interp_mode=mode)
        diff = float(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)).max())
        print(f"{mode}-vs-kernel parity max|diff| = {diff}", flush=True)
        assert diff == 0.0, f"interp_mode {mode} changed results"

    for mode in ("kernel", "postscatter"):
        for t in (64, 128):
            ms = bench(mode, t)
            print(f"{mode:12s} t={t:4d}  {ms:7.2f} ms/batch "
                  f"({ms / r * 1000:.2f} us/ROI)", flush=True)


if __name__ == "__main__":
    main()
