#!/usr/bin/env python
"""v4 kernel timing ablations (WRONG RESULTS for skip modes; timing only)."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax, jax.numpy as jnp

def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    from oneshotdet_tpu.ops.pallas_roi_align_v4 import pallas_multilevel_roi_align_v4
    b, ch = 8, 256
    shapes = [(104, 152), (52, 76), (26, 38), (13, 19), (7, 10)]
    scales = (0.125, 0.0625, 0.03125, 0.015625, 0.0078125)
    r = b * 2000
    iters, warmup = 6, 2
    n = iters + warmup + 1
    def make_inputs(seed):
        rr = np.random.RandomState(seed)
        feats = [jnp.asarray(rr.randn(b, h, w, ch).astype(np.float32)).astype(jnp.bfloat16)
                 for h, w in shapes]
        wh = rr.uniform(8, 110, (r, 2)).astype(np.float32)
        xy = rr.uniform(0, 1, (r, 2)).astype(np.float32) * (np.array([1200, 800]) - wh)
        rois = np.concatenate([np.repeat(np.arange(b, dtype=np.float32), r // b)[:, None],
                               xy, xy + wh], axis=1)
        area = wh[:, 0] * wh[:, 1]
        lvl = np.clip(np.floor(4 + np.log2(np.sqrt(area) / 224 + 1e-8)) - 3, 0, 4)
        return feats, jnp.asarray(rois), jnp.asarray(lvl.astype(np.int32))
    inputs = [make_inputs(7000 + i) for i in range(n)]
    from oneshotdet_tpu.ops.pallas_roi_align import pallas_multilevel_roi_align

    def bench(name, fn):
        f = jax.jit(lambda fe, ro, lv: fn(fe, ro, lv).astype(jnp.float32).sum())
        out = f(*inputs[0]); _ = float(out)
        for i in range(warmup):
            out = f(*inputs[1 + i])
        _ = float(out)  # value-force: block_until_ready returns early here
        t0 = time.perf_counter()
        for i in range(iters):
            out = f(*inputs[warmup + 1 + i])
        _ = float(out)
        ms = (time.perf_counter() - t0) / iters * 1000
        print(f"{name:13s} {ms:7.2f} ms/batch ({ms/r*1000:.2f} us/ROI)", flush=True)

    bench("v2 t=64", lambda fe, ro, lv: pallas_multilevel_roi_align(
        fe, ro, lv, (7, 7), scales, 2, rois_per_step=64))
    for mode in ("", "noswap", "nobd", "nostageb"):
        bench(f"v4[{mode or 'full'}]",
              lambda fe, ro, lv, mode=mode: pallas_multilevel_roi_align_v4(
                  fe, ro, lv, (7, 7), scales, 2, rois_per_step=16,
                  debug_skip=mode))

if __name__ == "__main__":
    main()
