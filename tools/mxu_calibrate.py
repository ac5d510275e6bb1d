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
    out = fn(variants[0]); jax.block_until_ready(out)
    for i in range(warmup):
        out = fn(variants[1 + i])
    jax.block_until_ready(out)
    base = warmup + 1
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(variants[base + i])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    iters, warmup = 8, 2
    n = iters + warmup + 1
    rng = np.random.RandomState(7)

    cases = [
        # (name, shape NHWC, channels out, kernel, depth)
        ("conv3x3 256->256 @8x104x152 x20", (8, 104, 152, 256), 256, 3, 20),
        ("conv3x3 64->64 @8x208x304 x20", (8, 208, 304, 64), 64, 3, 20),
        ("conv1x1 512->512 @16000x7x7 x20", (16000, 7, 7, 512), 512, 1, 20),
        ("conv3x3 256->256 @16000x7x7 x8", (16000, 7, 7, 256), 256, 3, 8),
        ("matmul 8192x8192x8192 x4", None, None, None, 4),
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
