#!/usr/bin/env python
"""Achievable-TFLOPs calibration with the trusted bench protocol.

Chains of known-FLOPs ops as ONE jitted program per config, pipelined
dispatch with fresh-content inputs — the only timing protocol that holds up
over the device tunnel (see .claude/skills/verify). Gives the realistic MXU
ceiling for conv shapes the detector actually uses.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import jax.lax as lax


def pipelined(fn, variants, iters, warmup=2):
    out = fn(variants[0]); _ = float(out)
    for i in range(warmup):
        out = fn(variants[1 + i])
    _ = float(out)  # value-forced sync (block_until_ready can lie — verify skill)
    base = warmup + 1
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(variants[base + i])
    _ = float(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    iters, warmup = 8, 2
    n = iters + warmup + 1
    rng = np.random.RandomState(7)

    # the detector's actual conv shapes at the production sizing (batch 8,
    # 832x1216 query): R-50 stage bottleneck 3x3s at each stride, the
    # FPN/tower 3x3 at each pyramid level, the ROI-head-like GEMM shapes,
    # and a pure-matmul MXU reference point. This is the per-shape ceiling
    # table behind the "backbone is at XLA's NHWC per-shape ceilings" claim
    # (VERDICT r4 #8) — committed to BASELINE.md §Per-shape conv ceilings.
    cases = [
        # (name, shape NHWC, channels out, kernel, depth)
        ("c2 3x3 64->64    @8x208x304", (8, 208, 304, 64), 64, 3, 20),
        ("c3 3x3 128->128  @8x104x152", (8, 104, 152, 128), 128, 3, 20),
        ("c4 3x3 256->256  @8x52x76", (8, 52, 76, 256), 256, 3, 20),
        ("c5 3x3 512->512  @8x26x38", (8, 26, 38, 512), 512, 3, 20),
        ("c4 1x1 256->1024 @8x52x76", (8, 52, 76, 256), 1024, 1, 20),
        ("c4 1x1 1024->256 @8x52x76", (8, 52, 76, 1024), 256, 1, 20),
        ("stem 4x4 12->64  @8x416x608", (8, 416, 608, 12), 64, 4, 8),
        ("P3/tower 3x3 256 @8x104x152", (8, 104, 152, 256), 256, 3, 20),
        ("P4 3x3 256->256  @8x52x76", (8, 52, 76, 256), 256, 3, 20),
        ("P6 3x3 256->256  @8x13x19", (8, 13, 19, 256), 256, 3, 20),
        ("roi 1x1 512->512 @16000x7x7", (16000, 7, 7, 512), 512, 1, 20),
        ("roi 3x3 256->256 @16000x7x7", (16000, 7, 7, 256), 256, 3, 8),
        ("matmul 8192^3", None, None, None, 4),
    ]
    for name, shape, cout, k, depth in cases:
        if shape is None:
            a = [jnp.asarray(rng.randn(8192, 8192).astype(np.float32)).astype(jnp.bfloat16)
                 for _ in range(n)]
            w = [jnp.asarray(rng.randn(8192, 8192).astype(np.float32)).astype(jnp.bfloat16)
                 * 0.01 for _ in range(depth)]

            @jax.jit
            def fn(x, w=tuple(w)):
                for wi in w:
                    x = x @ wi
                return x.astype(jnp.float32).sum()

            flops = depth * 2 * 8192**3
            ms = pipelined(fn, a, iters, warmup)
        else:
            cin = shape[-1]
            xs = [jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(jnp.bfloat16)
                  for _ in range(n)]
            ws = [jnp.asarray(rng.randn(k, k, cin, cout).astype(np.float32) * 0.02
                              ).astype(jnp.bfloat16) for _ in range(depth)]

            @jax.jit
            def fn(x, ws=tuple(ws)):
                for wi in ws:
                    x = lax.conv_general_dilated(
                        x, wi, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    x = jnp.maximum(x, 0)  # keep it un-foldable
                return x.astype(jnp.float32).sum()

            spatial = shape[0] * shape[1] * shape[2]
            flops = depth * 2 * spatial * cin * cout * k * k
            ms = pipelined(fn, xs, iters, warmup)
        print(f"{name:38s} {ms:8.2f} ms  -> {flops / ms / 1e9:7.1f} TFLOP/s",
              flush=True)


if __name__ == "__main__":
    main()
