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


sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import jax.lax as lax


def devgen(shape, n, scale=1.0):
    """n fresh-content device buffers WITHOUT host uploads (tunnel upload
    speed swings 0.3-33 MB/s — the 8192^2 matmul inputs alone would be GBs;
    see CLAUDE.md round-5 tunnel notes)."""
    @jax.jit
    def g(seed):
        return (jax.random.normal(jax.random.PRNGKey(seed), shape,
                                  jnp.float32) * scale).astype(jnp.bfloat16)
    out = [g(jnp.int32(1000 + i)) for i in range(n)]
    jax.block_until_ready(out)
    return out


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
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--only", default=None,
                   help="substring filter on case names")
    opts = p.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    iters, warmup = 8, 2
    n = iters + warmup + 1

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
        # channel-changing convs chain as alternating up/down pairs
        # (256->1024->256...), exactly the bottleneck's expand+reduce 1x1s;
        # per-conv FLOPs are direction-independent so the formula holds
        ("c4 1x1 256<->1024 @8x52x76", (8, 52, 76, 256), 1024, 1, 20),
        ("stem 4x4 12<->64 @8x416x608", (8, 416, 608, 12), 64, 4, 8),
        ("P3/tower 3x3 256 @8x104x152", (8, 104, 152, 256), 256, 3, 20),
        ("P4 3x3 256->256  @8x52x76", (8, 52, 76, 256), 256, 3, 20),
        ("P6 3x3 256->256  @8x13x19", (8, 13, 19, 256), 256, 3, 20),
        ("roi 1x1 512->512 @16000x7x7", (16000, 7, 7, 512), 512, 1, 20),
        ("roi 3x3 256->256 @16000x7x7", (16000, 7, 7, 256), 256, 3, 8),
        ("matmul 8192^3", None, None, None, 4),
    ]
    for name, shape, cout, k, depth in cases:
        if opts.only and opts.only not in name:
            continue
        if shape is None:
            a = devgen((8192, 8192), n)
            w = tuple(devgen((8192, 8192), depth, scale=0.01))

            # weights as REAL jit arguments: binding them as python
            # defaults embeds 512 MB of constants in the program and the
            # tunnel's remote_compile rejects the body (HTTP 413)
            @jax.jit
            def fn(x, w):
                for wi in w:
                    x = x @ wi
                return x.astype(jnp.float32).sum()

            flops = depth * 2 * 8192**3
            ms = pipelined(lambda x: fn(x, w), a, iters, warmup)
        else:
            cin = shape[-1]
            xs = devgen(shape, n)
            if cin == cout:
                ws = devgen((k, k, cin, cout), depth, scale=0.02)
            else:
                assert depth % 2 == 0
                ups = devgen((k, k, cin, cout), depth // 2, scale=0.02)
                downs = devgen((k, k, cout, cin), depth // 2, scale=0.02)
                ws = [w for pair in zip(ups, downs) for w in pair]

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
