"""Probe: does int8 conv/matmul hit the v5e int8 MXU path (2x bf16)?

Measures the per-op slope of chained ops inside one jit (two chain lengths,
slope = marginal cost) — the only honest protocol on this tunnel
(.claude/skills/verify: never time extracted single ops). Shapes mirror the
model's hot convs (FCOS tower 3x3 @ 256ch; backbone 3x3 @ 64ch stage-2 size).

Usage: python tools/probe_int8.py
Prints one line per (op, dtype): ms/op and implied TF/s.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")


def chain_conv(dtype_mode, x0, w, n):
    """n chained 3x3 convs (output feeds input)."""
    if dtype_mode == "bf16":
        wq = w.astype(jnp.bfloat16)

        def body(x, _):
            y = jax.lax.conv_general_dilated(
                x, wq, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            # relu + renorm to keep magnitudes stable
            y = jnp.maximum(y, 0.0)
            return (y / (jnp.mean(y) + 1e-3)).astype(jnp.bfloat16), 0.0

        def chain(x):
            return jax.lax.scan(body, x.astype(jnp.bfloat16),
                                None, length=n)[0].astype(jnp.float32).sum()
    else:  # int8 with dynamic per-tensor activation quant + static weight q
        wscale = jnp.max(jnp.abs(w)) / 127.0
        wq = jnp.clip(jnp.round(w / wscale), -127, 127).astype(jnp.int8)

        def body(x, _):
            ascale = jnp.max(jnp.abs(x)) / 127.0 + 1e-8
            xq = jnp.clip(jnp.round(x / ascale), -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, wq, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (ascale * wscale)
            y = jnp.maximum(y, 0.0)
            return y / (jnp.mean(y) + 1e-3), 0.0

        def chain(x):
            return jax.lax.scan(body, x.astype(jnp.float32),
                                None, length=n)[0].sum()

    return jax.jit(chain, static_argnums=()), x0


def measure(tag, mode, shape, cout, flops_per_op):
    rng = np.random.RandomState(int(time.time() * 1000) % (2**31))
    w = jnp.asarray(rng.randn(3, 3, shape[-1], cout).astype(np.float32) * 0.05)
    results = {}
    for n in (8, 40):
        x0 = jnp.asarray(rng.randn(*shape).astype(np.float32))
        fn, x = chain_conv(mode, x0, w, n)
        r = fn(x)
        r.block_until_ready()  # compile + run
        # fresh input, timed
        x1 = jnp.asarray(rng.randn(*shape).astype(np.float32))
        _ = float(x1.sum())  # force upload
        t0 = time.perf_counter()
        v = float(fn(x1))
        dt = time.perf_counter() - t0
        results[n] = dt
        del v
    slope = (results[40] - results[8]) / 32.0
    tf = flops_per_op / slope / 1e12
    print(f"{tag:28s} {mode:5s}: {slope * 1000:8.3f} ms/op  {tf:7.1f} TF/s",
          flush=True)
    return slope


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    b = 8
    # FCOS tower conv: P3 104x152, 256->256 3x3
    sh = (b, 104, 152, 256)
    fl = 2 * b * 104 * 152 * 9 * 256 * 256
    s_bf = measure("tower 3x3 256ch 104x152", "bf16", sh, 256, fl)
    s_i8 = measure("tower 3x3 256ch 104x152", "int8", sh, 256, fl)
    print(f"int8 speedup vs bf16: {s_bf / s_i8:.2f}x", flush=True)
    # backbone stage-2 conv: 208x304, 64->64 3x3
    sh = (b, 208, 304, 64)
    fl = 2 * b * 208 * 304 * 9 * 64 * 64
    s_bf = measure("backbone 3x3 64ch 208x304", "bf16", sh, 64, fl)
    s_i8 = measure("backbone 3x3 64ch 208x304", "int8", sh, 64, fl)
    print(f"int8 speedup vs bf16: {s_bf / s_i8:.2f}x", flush=True)


if __name__ == "__main__":
    main()
